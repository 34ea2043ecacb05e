"""Extra benchmarks for the r06 optimization round (bench.py is frozen).

Per-query noop-sink isolation (guide §1.4), phase-level timing for the
hydrology family, and .explain("formatted") capture for plans/r06.
Usage:
  python bench_extra.py time <query> [runs]     # min-of-N .count() timing
  python bench_extra.py noop <query> [runs]     # noop-sink timing
  python bench_extra.py plan <query> <out.txt>  # explain(formatted) dump
  python bench_extra.py hydro_phases            # phase timings at sf0.1
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _spark():
    from remotior_sensus_spark.session import get_spark
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(f"local[{cpus}]")


def _qs():
    import __spark_entry__ as e
    return e.queries()


def cmd_time(name: str, runs: int = 3, sink: str = "count") -> None:
    spark = _spark()
    qs = _qs()
    from remotior_sensus_spark.synth.generate import ensure_geo
    from remotior_sensus_spark.sources.catalog import sf_of_dir
    ensure_geo(sf_of_dir(SF_DIR))
    # untimed warmup at sf0.01 — the bench.py protocol (JIT/codegen)
    warm = "/root/testdata/sf0.01"
    if os.path.isdir(warm) and warm != SF_DIR:
        ensure_geo(0.01)
        try:
            qs[name](spark, warm).count()
        except Exception:
            pass
    best = []
    for _ in range(runs):
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()
        best.append(round(time.time() - t0, 3))
    print({"query": name, "sink": sink, "runs": best, "min": min(best)})


def cmd_plan(name: str, out: str) -> None:
    spark = _spark()
    qs = _qs()
    from remotior_sensus_spark.synth.generate import ensure_geo
    from remotior_sensus_spark.sources.catalog import sf_of_dir
    ensure_geo(sf_of_dir(SF_DIR))
    df = qs[name](spark, SF_DIR)
    with open(out, "w") as fh:
        fh.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    print(f"wrote {out}")


def cmd_hydro_phases() -> None:
    spark = _spark()
    from pyspark.sql import functions as F
    from remotior_sensus_spark.synth.generate import ensure_geo
    from remotior_sensus_spark.sources.catalog import sf_of_dir
    ensure_geo(sf_of_dir(SF_DIR))
    sys.path.insert(0, REPO)
    from remotior_sensus_spark import queries as qmod
    from remotior_sensus_spark.operators import hydrology as hy

    t0 = time.time()
    t64, T = qmod._retile4(qmod._b01(spark, SF_DIR, "B04"), SF_DIR)
    bt = t64.localCheckpoint()
    n = bt.count()
    t1 = time.time()
    print(f"retile+checkpoint: {t1-t0:.2f}s  ({n} tiles)")

    ph1 = hy._phase1(bt, T, want_pits=False).localCheckpoint()
    t2 = time.time()
    print(f"phase1 halo: {t2-t1:.2f}s ({ph1.count()} condensate rows)")

    routing = ph1.filter(F.col("kind") == 0).select(
        hy._pack_col(F.col("gx"), F.col("gy")).alias("k"),
        F.when(F.col("nx") >= 0,
               hy._pack_col(F.col("nx"), F.col("ny"))).alias("nk"))
    carries = ph1.filter(F.col("kind") == 1).groupBy(
        hy._pack_col(F.col("gx"), F.col("gy")).alias("k")
    ).agg(F.sum("cnt").alias("c")).localCheckpoint()
    nb = routing.count()
    t3 = time.time()
    print(f"routing count: {t3-t2:.2f}s ({nb} border cells)")
    r_pdf = routing.select(
        "k", F.coalesce("nk", F.lit(-1)).alias("nk")).toPandas()
    inflow_pdf = hy._phase2_driver_inflow(r_pdf, carries.toPandas())
    t4 = time.time()
    print(f"phase2 driver: {t4-t3:.2f}s ({len(inflow_pdf)} inflow rows)")
    inflow = spark.createDataFrame(inflow_pdf, schema="k long, c long").select(
        F.shiftright("k", 31).alias("gx"),
        F.col("k").bitwiseAND(F.lit(int(hy._PACK) - 1)).alias("gy"), "c"
    ).select(F.expr(f"gx div {T}").cast("int").alias("tx"),
             F.expr(f"gy div {T}").cast("int").alias("ty"), "gx", "gy", "c")

    import numpy as np

    def census(pad, acc, _tx, _ty):
        vals = acc[acc > 0]
        if not len(vals):
            return []
        _, expo = np.frexp(vals.astype(np.float64))
        band = (expo - 1).astype(np.int64)
        return [(int(b), int((band == b).sum()),
                 int(vals[band == b].sum()), int(vals[band == b].max()))
                for b in np.unique(band)]

    per_tile = hy._phase3_cogroup(
        bt, T, inflow, census,
        "acc_band long, n_pixels long, sum_acc long, max_acc long",
        ["acc_band", "n_pixels", "sum_acc", "max_acc"])
    out = (per_tile.groupBy(F.col("acc_band").cast("int").alias("acc_band"))
           .agg(F.sum("n_pixels").alias("n_pixels")))
    out.count()
    t5 = time.time()
    print(f"phase3 halo+census: {t5-t4:.2f}s  TOTAL {t5-t0:.2f}s")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "noop":
        cmd_time(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3,
                 sink="noop")
    elif cmd == "plan":
        cmd_plan(sys.argv[2], sys.argv[3])
    elif cmd == "hydro_phases":
        cmd_hydro_phases()
