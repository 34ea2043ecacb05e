"""band_combination + cross_classification.

Reference: tools/band_combination.py:54-452 (distinct -> collision-free
linear encode -> rank -> reclass -> counts), kernel
core/processor_functions.py:1468-1513 (cross_rasters);
tools/cross_classification.py:57-684 (cross matrix, error matrix,
regression).

Spark-first: the distinct pass is ``groupBy(bands).count()`` (Catalyst
partial+final agg), the encode+rank is a window over the (small)
combination table, and the per-pixel reclass is a broadcast join — no
randomness needed. Output ids match the reference's deterministic
first-attempt (t=1) encoding: k_0=1, k_{y+1}=k_y*(max_v[y+1]+1),
encoded = sum((f_y + add_y)*k_y), add_y = 1-min_y if min_y<0 else 0,
id = ascending rank of encoded (band_combination.py:228-250,316-334).
The reference retries with random coefficients only when that encoding
collides; we assert injectivity instead (SURVEY.md §7.3 risk 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark.grid import PIXEL_SIZE

PIXEL_AREA = PIXEL_SIZE * PIXEL_SIZE


def combination_table(px_wide: DataFrame, band_cols: list[str]) -> DataFrame:
    """Distinct combinations + deterministic t=1 ids.

    `px_wide`: one row per pixel with integer band columns (already
    nodata-filtered). Returns (raster_value, <band_cols>, pixel_sum,
    area_m2) with raster_value = the reference's rank id.
    """
    combos = px_wide.groupBy(*band_cols).agg(F.count("*").alias("pixel_sum"))
    stats = combos.agg(
        *[F.max(c).alias(f"max_{c}") for c in band_cols],
        *[F.min(c).alias(f"min_{c}") for c in band_cols],
    )
    # localCheckpoint, not cache(): reused by the injectivity check +
    # rank job below, and its blocks are reclaimed with the RDD instead
    # of pinning executor storage for the session across repeated calls
    combos = combos.crossJoin(F.broadcast(stats)).localCheckpoint()

    def encode(reference_radix: bool):
        """reference_radix=True mirrors the reference's t=1 first try
        (band_combination.py:232-238: k_{y+1} = k_y * (max_{y+1} + 1) —
        the NEXT band's max), which is NOT always injective (e.g. bands
        with different domains: A in 0..2, B in 0..1 gives A + 2B where
        (2,0) == (0,1)). reference_radix=False is the provably injective
        mixed radix: k grows by the CURRENT band's shifted domain size
        (max + add + 1), so each digit is strictly below its radix."""
        encoded = None
        k = F.lit(1).cast("long")
        for y, c in enumerate(band_cols):
            add = F.when(F.col(f"min_{c}") < 0,
                         -F.col(f"min_{c}") + 1).otherwise(F.lit(0))
            term = (F.col(c).cast("long") + add.cast("long")) * k
            encoded = term if encoded is None else encoded + term
            if y + 1 < len(band_cols):
                r = band_cols[y + 1] if reference_radix else c
                add_r = F.when(F.col(f"min_{r}") < 0,
                               -F.col(f"min_{r}") + 1).otherwise(F.lit(0))
                k = k * (F.col(f"max_{r}").cast("long")
                         + add_r.cast("long") + 1)
        return encoded

    # reference parity first: the t=1 encoding reproduces the reference's
    # deterministic ids whenever it is injective (always true for the
    # equal-domain classified fixtures). On collision the reference
    # re-rolls RANDOM coefficients until injective — nondeterministic ids
    # we refuse to replicate; instead we pin the deterministic safe radix
    # (ADVICE r01 low #3: verified injectivity, no silent merging).
    with_ref = combos.withColumn("encoded", encode(True))
    n_combos = with_ref.count()
    n_enc = with_ref.select("encoded").distinct().count()
    if n_enc != n_combos:
        with_ref = combos.withColumn("encoded", encode(False))
    out = (
        _global_rank(with_ref, "encoded", rank_col="raster_value")
        .select(
            "raster_value", *band_cols, "pixel_sum",
            (F.col("pixel_sum") * F.lit(PIXEL_AREA)).alias("area_m2"),
        )
    )
    return out


def _global_rank(df: DataFrame, order_col: str, rank_col: str = "rank",
                 partitions: int = 32) -> DataFrame:
    """Deterministic ascending rank 1..n over UNIQUE order_col values
    WITHOUT a single-partition window (the round-1 plan audit flagged
    `Window.partitionBy().orderBy(...)` as a one-task straggler at high
    combination cardinality): range-partition by the key, rank inside
    each partition in parallel, add driver-collected per-partition
    offsets (the per-partition counts are a tiny aggregate)."""
    # ONE materialized evaluation: repartitionByRange samples its range
    # boundaries per execution, so the sizes job and the rank job must
    # see the SAME partitioning — localCheckpoint pins the partitions
    # (and stops the distinct-combos aggregation re-running twice)
    ranged = df.repartitionByRange(partitions, F.col(order_col)).localCheckpoint()
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    sizes = {
        r["__pid"]: r["n"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = Window.partitionBy("__pid").orderBy(order_col)
    return (
        with_pid.withColumn(
            rank_col,
            (F.row_number().over(w).cast("long")
             + F.coalesce(off[F.col("__pid")], F.lit(0)).cast("long")),
        )
        .drop("__pid")
    )


def apply_combination(px_wide: DataFrame, combo: DataFrame, band_cols: list[str]) -> DataFrame:
    """Per-pixel combination raster: broadcast-join pixels to the id map."""
    ids = combo.select("raster_value", *band_cols)
    return px_wide.join(F.broadcast(ids), band_cols, "left")


def cross_matrix(px_wide: DataFrame, ref_col: str, cls_col: str) -> DataFrame:
    """Pivot zone x class of pixel counts (cross_classification.py:300-430)."""
    counts = px_wide.groupBy(ref_col, cls_col).agg(F.count("*").alias("cnt"))
    return counts.groupBy(ref_col).pivot(cls_col).sum("cnt").na.fill(0)


def error_matrix_metrics(px_wide: DataFrame, ref_col: str, cls_col: str) -> DataFrame:
    """Overall accuracy, kappa, per-class PA/UA from the confusion counts
    (cross_classification.py:431-560). All ratios are single double
    divisions over exact BIGINT counts -> oracle-exact.

    The confusion table is materialized once (r06): it feeds seven
    derived aggregates (tot/diag/row/col/chance/per-class), and without
    the checkpoint the corpus-wide pixel aggregation re-ran for each —
    the plan showed 14 parquet scans and no exchange reuse."""
    counts = px_wide.groupBy(ref_col, cls_col).agg(
        F.count("*").alias("cnt")).localCheckpoint()
    tot = counts.agg(F.sum("cnt").alias("n")).select("n")
    diag = counts.filter(F.col(ref_col) == F.col(cls_col)).agg(
        F.sum("cnt").alias("diag")
    )
    row_tot = counts.groupBy(ref_col).agg(F.sum("cnt").alias("row_cnt"))
    col_tot = counts.groupBy(cls_col).agg(F.sum("cnt").alias("col_cnt"))
    chance = (
        row_tot.join(col_tot, row_tot[ref_col] == col_tot[cls_col])
        .agg(F.sum(F.col("row_cnt") * F.col("col_cnt")).alias("chance_sum"))
    )
    per_class = (
        counts.filter(F.col(ref_col) == F.col(cls_col))
        .select(F.col(ref_col).alias("klass"), F.col("cnt").alias("diag_cnt"))
        .join(row_tot.select(F.col(ref_col).alias("klass"), "row_cnt"), "klass", "outer")
        .join(col_tot.select(F.col(cls_col).alias("klass"), "col_cnt"), "klass", "outer")
        .na.fill(0)
    )
    per_class = per_class.crossJoin(F.broadcast(tot)).crossJoin(
        F.broadcast(diag)
    ).crossJoin(F.broadcast(chance))
    return per_class.select(
        "klass",
        "diag_cnt",
        "row_cnt",
        "col_cnt",
        (F.col("diag_cnt") / F.col("row_cnt")).alias("producer_accuracy"),
        (F.col("diag_cnt") / F.col("col_cnt")).alias("user_accuracy"),
        (F.col("diag") / F.col("n")).alias("overall_accuracy"),
        (
            (F.col("n") * F.col("diag") - F.col("chance_sum"))
            / (F.col("n") * F.col("n") - F.col("chance_sum"))
        ).alias("kappa"),
    )


def regression_between(px_pairs: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Least-squares y = b0 + b1*x + R^2 over aligned pixel pairs
    (cross_classification.py regression path). Integer-exact sums."""
    xi = F.col(x_col).cast("long")
    yi = F.col(y_col).cast("long")
    s = px_pairs.agg(
        F.count("*").alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum(yi * yi).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    b0 = (sy - b1 * sx) / n
    r2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return s.select(
        F.col("n").alias("n_pixels"),
        b1.alias("slope"),
        b0.alias("intercept"),
        r2.alias("r_squared"),
    )


def olofsson_area_estimates(px: DataFrame, sample_mod: int = 7) -> DataFrame:
    """Good-practice accuracy assessment (Olofsson et al. 2014, the
    method remotior_sensus' accuracy tooling follows): a systematic
    pixel sample ((gx+gy) % sample_mod == 0) builds the error matrix,
    the FULL map provides the stratum weights W_i = N_i/N, and each
    reference class j gets the bias-adjusted area proportion
      p_j = sum_i W_i * n_ij / n_i.
    and its variance
      V_j = sum_i W_i^2 * q_ij (1-q_ij) / (n_i. - 1),   q_ij = n_ij/n_i.
    Every per-stratum term is one fixed double sequence rounded to
    fixed-point BEFORE the order-independent per-class sum (1e6 for the
    area proportion, 1e12 for the variance, whose terms are O(1e-6)).
    Input: (gx, gy, map_cls, ref_cls).  Output per reference class:
    (ref_cls, sample_count, area_prop_fp, variance_fp12)."""
    full = px.groupBy("map_cls").agg(F.count("*").alias("ni_full"))
    n_total = px.agg(F.count("*").alias("n_full"))
    sample = px.filter((F.col("gx") + F.col("gy")) % sample_mod == 0)
    cm = sample.groupBy("map_cls", "ref_cls").agg(F.count("*").alias("nij"))
    rows = sample.groupBy("map_cls").agg(F.count("*").alias("ni"))
    j = (
        cm.join(rows, "map_cls")
        .join(F.broadcast(full), "map_cls")
        .crossJoin(F.broadcast(n_total))
    )
    w = F.col("ni_full").cast("double") / F.col("n_full").cast("double")
    qij = F.col("nij").cast("double") / F.col("ni").cast("double")
    area_term = F.floor(w * qij * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    var_term = F.floor(
        w * w * qij * (F.lit(1.0) - qij)
        / (F.col("ni").cast("double") - F.lit(1.0))
        * F.lit(1e12) + F.lit(0.5)).cast("long")
    return (
        j.select("ref_cls", "nij", area_term.alias("at"),
                 var_term.alias("vt"))
        .groupBy("ref_cls")
        .agg(F.sum("nij").alias("sample_count"),
             F.sum("at").alias("area_prop_fp"),
             F.sum("vt").alias("variance_fp12"))
    )
