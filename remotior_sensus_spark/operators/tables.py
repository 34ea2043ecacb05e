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


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str], tolerance_us: int | None = None) -> DataFrame:
    """As-of join: attach to every `left` row the latest `right` row with
    right.ts <= left.ts for the same `on` key (ties broken by the last
    right row in (ts, __tie) order, where __tie is the first of
    `right_cols` — pass a unique id there for determinism).

    The 100 TB shape (the merge-sorted union trick, not a range join):
    tag both sides, union, ONE hash shuffle on the key, and a running
    last_value(ignorenulls) over (ts, side) within each key — every
    left row reads the latest preceding right struct in O(n log n)
    sort, no per-row probe, no interval explosion, no broadcast
    requirement on either side. A Catalyst range join would be
    O(left x right) within key; this is linear after the sort.

    Returns left columns plus `right_cols` (null when no prior right
    row) and `asof_gap_us` (microseconds since the matched right row).
    `tolerance_us` drops matches older than the tolerance (null fill),
    mirroring pandas.merge_asof(tolerance=...).
    """
    from pyspark.sql import Window

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        on, ts, *[c for c in right_cols if c not in (on, ts)]
    ).withColumn("__side", F.lit(0))
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort BEFORE left rows at equal ts (__side 0 < 1), so a
    # right row exactly at left.ts is visible to that left row
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("__side").asc(),
                 F.col(right_cols[0]).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rstruct = F.when(
        F.col("__side") == 0,
        F.struct(F.col(ts).alias("__rts"),
                 *[F.col(c).alias(c) for c in right_cols]),
    )
    matched = u.withColumn("__m", F.last(rstruct, ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    # sources may carry TIMESTAMP_NTZ; the session tz is pinned UTC, so
    # the cast is a pure type adapter (identical epoch both engines)
    gap = (F.unix_micros(F.col(ts).cast("timestamp"))
           - F.unix_micros(F.col("__m.__rts").cast("timestamp")))
    if tolerance_us is not None:
        keep = gap <= F.lit(tolerance_us)
        sel = [F.when(keep, F.col(f"__m.{c}")).alias(f"asof_{c}")
               for c in right_cols] + [F.when(keep, gap).alias("asof_gap_us")]
    else:
        sel = [F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_cols] + [
            gap.alias("asof_gap_us")]
    return out.select(*left.columns, *sel)


def interval_join(points: DataFrame, intervals: DataFrame, key: str,
                  point_ts: str, istart: str, iend: str,
                  bucket_s: int = 600) -> DataFrame:
    """Point-in-interval join (the range join OSS Spark has no physical
    operator for) via time bucketing: intervals explode to the fixed
    `bucket_s`-second buckets they cover, points carry their single
    bucket, and the pair meets on an ordinary (key, bucket) hash join
    followed by the exact containment filter.

    Each (point, interval) pair meets EXACTLY once — the point has one
    bucket and the interval covers it once — so no post-join distinct
    is needed. Cost: |intervals| x (len/bucket_s) exploded rows; pick
    bucket_s near the median interval length so the blow-up stays O(1)
    per interval while buckets stay selective. A naive theta-join is
    O(points x intervals) per key (BroadcastNestedLoop at cluster
    scale); this is one shuffle each side on compact keys.

    Timestamps are compared as integer epoch microseconds (NTZ-safe
    under the pinned-UTC session), bounds inclusive."""
    bs_us = F.lit(int(bucket_s) * 1_000_000)

    def us(c):
        return F.unix_micros(F.col(c).cast("timestamp"))

    pb = points.withColumn("__b", F.floor(us(point_ts) / bs_us))
    ib = intervals.withColumn(
        "__b",
        F.explode(F.sequence(F.floor(us(istart) / bs_us),
                             F.floor(us(iend) / bs_us))),
    )
    return (
        pb.join(ib, [key, "__b"])
        .filter((us(point_ts) >= us(istart)) & (us(point_ts) <= us(iend)))
        .drop("__b")
    )
