"""Benchmark runner (driver contract + BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], then evidences the
north_rule scaling criterion by running the flagship spatial-join job
at two parallelism levels (local[8] vs local[32] — the sandbox proxy
for N vs 4N executors) and reporting throughput + scaling efficiency.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec}, "sf": ...,
   "flagship": {"docs": n, "docs_per_sec_8": ..., "docs_per_sec_32": ...,
                "scaling_efficiency": ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "ndvi",
    "band_percentile",
    "raster_report",
    "zonal_stats",
    "spatial_doc_tiles",
    "knn_tiles",
    "band_combination",
    "error_matrix",
    "mosaic_first_wins",
    "min_distance",
    "spectral_distance",
    "dedup_exact",
    "minhash_lsh",
    "ann_cosine_topk",
    "tpch_q1",
    "sessionize_events",
]


def flagship(spark, sf_dir: str):
    """The north-rule job: interleaved docs -> media-span salted join to
    tiles (+ per-tile pixel aggregation, the 'tile assignment' payload)
    + geom-span cover join with PIP-refined zonal stats -> per-doc
    summary. Mirrors BASELINE.md protocol step 2 (spatial join on cell
    keys + PIP refinement + tile assignment + zonal aggregation)."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark.operators import spatial_join as sj
    from remotior_sensus_spark.sources import catalog as cat

    docs = cat.load_geo(spark, sf_dir, "documents")
    tiles = cat.load_geo(spark, sf_dir, "tiles")
    geoms = cat.load_geo(spark, sf_dir, "geometries")
    rects = cat.load_geo(spark, sf_dir, "geometry_rects")

    nd = F.lit(-32768.0)
    joined = sj.media_span_tiles(docs, tiles)
    # pixel payload aggregation FLAT (explode -> codegen'd hash agg);
    # interpreted F.aggregate over arrays would serialize the hot path
    px = joined.select("doc_id", "cell_key", F.explode("pixels").alias("v"))
    media = (
        px.groupBy("doc_id")
        .agg(
            (F.count("*") / 256).cast("long").alias("n_tiles"),
            F.countDistinct("cell_key").alias("n_cells"),
            F.sum(F.when(F.col("v") != nd, F.col("v").cast("long")).otherwise(0)
                  ).alias("px_sum"),
            F.sum(F.when(F.col("v") != nd, 1).otherwise(0)).alias("px_valid"),
            F.min(F.when(F.col("v") != nd, F.col("v"))).alias("px_min"),
            F.max(F.when(F.col("v") != nd, F.col("v"))).alias("px_max"),
        )
    )
    # per-roi zonal stats (PIP-refined) computed once, joined to the
    # geom spans — rois are shared across docs, so the heavy pixel work
    # scales with geometry count, not document count
    roi_px = sj.cover_pixels(tiles, geoms, rects)
    roi_zonal = roi_px.groupBy("roi_id").agg(
        F.count("*").alias("roi_pixels"),
        F.sum(F.when(F.col("value") != nd, F.col("value").cast("long")).otherwise(0)
              ).alias("roi_sum"),
    )
    geom = (
        sj.geom_span_rois(docs, geoms.select("roi_id", "class"))
        .join(roi_zonal, "roi_id", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_geom_spans"),
            F.sum("roi_pixels").alias("geom_pixels"),
            F.sum("roi_sum").alias("geom_sum"),
        )
    )
    out = media.join(geom, "doc_id", "outer")
    return out


def _new_spark(master: str):
    from remotior_sensus_spark.session import get_spark

    return get_spark(master)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from remotior_sensus_spark.sources.catalog import sf_of_dir
    from remotior_sensus_spark.synth.generate import ensure_geo

    sf = sf_of_dir(sf_dir)
    ensure_geo(sf)  # materialize geo tables before timing

    import __spark_entry__ as e

    spark = _new_spark(f"local[{cpus}]")
    qtimes: dict[str, float] = {}
    qs = e.queries()
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        qtimes[name] = round(time.time() - t0, 3)

    n_docs = spark.read.parquet(f"{ensure_geo(sf)}/documents.parquet").count()
    spark.stop()

    # scaling protocol (BASELINE.md): same input + plan + config at N
    # cores (8) vs 4N (32). Each measurement runs in its OWN subprocess
    # (restarting SparkSessions inside one JVM gives wildly unstable
    # timings); page cache pre-warmed; min of 3 timed runs after an
    # untimed warmup.
    import subprocess

    geo = ensure_geo(sf)
    for f in os.listdir(geo):
        with open(f"{geo}/{f}", "rb") as fh:
            while fh.read(1 << 24):
                pass

    def measure(master: str) -> tuple[float, int]:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--flagship-only", master, sf_dir],
            capture_output=True, text=True, timeout=1200,
        )
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        return d["sec"], d["rows"]

    t_lo, n_out = measure("local[8]")
    t_hi, _ = measure(f"local[{cpus}]")
    qtimes["flagship_spatial_join"] = round(t_hi, 3)

    thr_hi = n_docs / t_hi
    thr_lo = n_docs / t_lo
    eff = (thr_hi / thr_lo) / (cpus / 8)

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(qtimes.values()), 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "flagship": {
            "docs": n_docs,
            "output_rows": n_out,
            "sec_local8": round(t_lo, 3),
            f"sec_local{cpus}": round(t_hi, 3),
            "docs_per_sec_local8": round(thr_lo, 1),
            f"docs_per_sec_local{cpus}": round(thr_hi, 1),
            "scaling_efficiency_8_to_32": round(eff, 3),
        },
    }
    print(json.dumps(out))


def _flagship_only(master: str, sf_dir: str) -> None:
    from remotior_sensus_spark.session import get_spark

    s = get_spark(master, shuffle_partitions=64)
    n = flagship(s, sf_dir).count()  # warmup (JIT, code cache)
    times = []
    for _ in range(3):
        t0 = time.time()
        flagship(s, sf_dir).count()
        times.append(time.time() - t0)
    print(json.dumps({"sec": round(min(times), 3), "rows": n}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--flagship-only":
        _flagship_only(sys.argv[2], sys.argv[3])
    else:
        main()
