"""Batch min-of-N timing for a list of queries in ONE Spark session
(r06 continuation: measure the not-yet-optimized family before touching
it). bench.py stays frozen; this is a measurement harness only.

Usage: python bench_batch.py <runs> <query> [query ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = int(sys.argv[1])
    names = sys.argv[2:]
    from remotior_sensus_spark.session import get_spark
    from remotior_sensus_spark.synth.generate import ensure_geo
    from remotior_sensus_spark.sources.catalog import sf_of_dir
    import __spark_entry__ as e

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]")
    qs = e.queries()
    ensure_geo(sf_of_dir(SF_DIR))
    warm = "/root/testdata/sf0.01"
    if os.path.isdir(warm) and warm != SF_DIR:
        ensure_geo(0.01)
    out = {}
    for name in names:
        if warm != SF_DIR:
            try:
                qs[name](spark, warm).count()
            except Exception as ex:
                print(f"warmup {name}: {type(ex).__name__} {ex}",
                      flush=True)
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_batch:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {"min": min(samples), "runs": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTALS " + json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
