"""Round-5 verification-depth layer: independently-written references
for the new round-5 queries, standing next to the mirrored DuckDB
oracles (same pattern as test_round4_numpy_parity.py — a formulation
error copied into both engines would pass the oracle; these rebuild
the result from raw data with plain Python/numpy)."""

import math
from collections import Counter

import duckdb

from remotior_sensus_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def test_thermal_brightness_matches_scalar_python(spark, geo001_dir):
    """Rebuild the brightness-temperature histogram from the raw DN
    plane with per-distinct-DN math.log (no relational ops at all):
    DN -> L = ML*DN + AL -> BT = K2/ln(K1/L + 1), whole-Kelvin bins,
    0.1 mK fixed-point sum/min/max."""
    con = duckdb.connect()
    dns = con.sql(
        f"""select value, count(*) as n from '{geo001_dir}/tile_pixels.parquet'
        where bandset='S2_2020-01-02' and band='B08' and value <> -32768
        group by 1"""
    ).fetchall()
    ML, AL, K1, K2 = Q._L8_ML, Q._L8_AL, Q._L8_K1, Q._L8_K2
    agg = {}
    for dn, n in dns:
        bt = K2 / math.log(K1 / (dn * ML + AL) + 1.0)
        fp = math.floor(bt * 10000.0 + 0.5)
        b = math.floor(bt)
        c = agg.setdefault(b, [0, 0, fp, fp])
        c[0] += n
        c[1] += fp * n
        c[2] = min(c[2], fp)
        c[3] = max(c[3], fp)
    got = {
        r["kelvin_bin"]: [r["n_px"], r["sum_bt_fp"], r["min_bt_fp"],
                          r["max_bt_fp"]]
        for r in Q.REGISTRY["thermal_brightness"][0](spark, SF_DIR).collect()
    }
    assert got == agg


def test_thermal_brightness_plan_is_pure_codegen(spark):
    """The per-pixel BT math must stay JVM-side: no Python evaluation
    nodes, exactly one aggregation exchange."""
    df = Q.REGISTRY["thermal_brightness"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial agg + final agg shuffle
