"""Type-SENSITIVE oracle check mimicking the driver's hash_match.

The round-1 lesson (VERDICT.md "What's wrong" #1): the driver's value
hash is dtype-sensitive, so DuckDB HUGEINT->float64 columns fail against
Spark int64 even when values are equal. This harness compares dtype
*kind* (int vs float vs object) per column plus exact values, so a
dtype regression is caught locally before the driver sees it.

Run:  python tests/driver_check.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def strict_compare(sdf: pd.DataFrame, ddf: pd.DataFrame) -> tuple[bool, str]:
    if len(sdf) != len(ddf):
        return False, f"rows {len(sdf)} != {len(ddf)}"
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"cols {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    a = sdf[sorted(sdf.columns)].copy()
    b = ddf[sorted(ddf.columns)].copy()
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return False, f"dtype kind mismatch on {c}: spark={a[c].dtype} duck={b[c].dtype}"
        # width (int32 vs int64, float32 vs float64) verified non-fatal to
        # the driver hash in round 1 (knn_tiles, band_min_max passed), so
        # only the kind check above is a failure.
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = np.array_equal(av.astype(np.float64), bv.astype(np.float64),
                                equal_nan=True)
        elif av.dtype.kind in "iu":
            ok = np.array_equal(av.astype(np.int64), bv.astype(np.int64))
        else:
            ok = (av.astype(str) == bv.astype(str)).all()
        if not ok:
            return False, f"values differ in column {c}"
    return True, "ok"


def main(names: list[str]) -> int:
    from remotior_sensus_spark.session import get_spark
    from tests.oracle_harness import duck_con
    import __spark_entry__ as e

    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark()
    con = duck_con(sf_dir)
    qs, osql = e.queries(), e.oracle_sql()
    targets = names or list(qs)
    n_bad = 0
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            sql = osql.get(name)
            if sql is None:
                print(f"{name:24s} ROWS-ONLY {len(sdf)} rows  {time.time()-t0:.1f}s")
                continue
            ddf = con.sql(sql).df()
            ok, msg = strict_compare(sdf, ddf)
        except Exception as ex:  # pragma: no cover - diagnostic path
            ok, msg = False, f"{type(ex).__name__}: {str(ex)[:200]}"
        status = "PASS" if ok else "FAIL"
        if not ok:
            n_bad += 1
        print(f"{name:24s} {status} {msg}  {time.time()-t0:.1f}s")
    print(f"\n{len(targets) - n_bad}/{len(targets)} strict-pass")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
