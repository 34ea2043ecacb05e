"""Table-manager family: join with nodata fill, pivot matrix, table
calculate, sort/rename/stack.

Reference: core/table_manager.py:338-377 (join_tables, pd.merge fast
path + nodata fill), :381-700 (pivot_matrix), :753-906 (calculate —
numpy expression eval over recarray columns), :1099-1156 (rename/
append/redefine/sort/stack); parallel key-range join
core/multiprocess_manager.py:1707-1876 + core/processor.py:859-1001.

Spark mapping is direct: join/coalesce, groupBy().pivot(), withColumn
with the SAME expression compiler as band_calc (plans/expression.py),
orderBy, unionByName. The reference's per-key-range process fan-out is
exactly a shuffle hash join — Catalyst handles partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.plans.expression import compile_expression


def table_join(t1: DataFrame, t2: DataFrame, on: str | list[str], how: str = "left",
               nodata: float = NODATA, fill_cols: list[str] | None = None) -> DataFrame:
    """Join with the reference's nodata-fill semantics: unmatched rows'
    appended fields get the nodata sentinel instead of NULL
    (core/processor.py:960-993)."""
    out = t1.join(t2, on, how)
    cols = fill_cols if fill_cols is not None else [
        c for c in t2.columns if c not in (on if isinstance(on, list) else [on])
    ]
    for c in cols:
        dt = dict(out.dtypes).get(c)
        if dt in ("double", "float", "int", "bigint", "smallint"):
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(nodata).cast(dt)))
    return out


def pivot_matrix(df: DataFrame, row_field: str, col_field: str,
                 value_field: str, agg: str = "sum",
                 col_values: list | None = None) -> DataFrame:
    """Cross matrix: group rows by row_field, one output column per
    col_field value (table_manager.py:381-700)."""
    g = df.groupBy(row_field).pivot(col_field, col_values)
    fn = {"sum": F.sum, "count": F.count, "mean": F.avg,
          "min": F.min, "max": F.max}[agg]
    return g.agg(fn(value_field)).na.fill(0)


def table_calculate(df: DataFrame, output_field: str, expression: str,
                    var_map: dict[str, str] | None = None) -> DataFrame:
    """New field from a numpy-style expression over existing columns —
    reuses the band_calc compiler with columns as variables
    (table_manager.py:753-906 `calculate`)."""
    comp = compile_expression(expression)
    env = {}
    for v in comp.variables:
        col_name = (var_map or {}).get(v, v)
        env[v] = F.col(col_name).cast("double")
    return df.withColumn(output_field, comp.fn(env))


def stack_tables(tables: list[DataFrame]) -> DataFrame:
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t, allowMissingColumns=True)
    return out


def stratified_sample(df: DataFrame, stratum, k: int, key: str) -> DataFrame:
    """Deterministic stratified sampling: keep the first ``k`` rows per
    stratum in md5(key) order (a stable pseudo-random order computable
    identically in any engine — no RNG state, so the sample is
    reproducible and resumable).

    The 100 TB shape: one hash-partitioned window per stratum; no
    collect, no per-stratum driver loop. Skewed strata cost one sort
    within their partition — for pathological single-stratum skew,
    pre-aggregate a per-stratum count and switch to sampleBy, but for
    training-data quota sampling (strata = language/quality/domain
    buckets) the window is the right default."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
