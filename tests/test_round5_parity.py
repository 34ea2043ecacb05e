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


def test_lbp_and_aniso_halo_match_relational(spark, geo001_dir):
    """The halo Arrow kernels (lbp_census_tiles,
    semivariogram_aniso_tiles — the registered hot paths) must equal
    the relational shifted-copy forms row-for-row; the relational
    forms stay covered as the cross-checked reference shapes, the
    same contract d8_flow/d8_flow_tiles carry."""
    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats
    from remotior_sensus_spark.sources import catalog as cat
    from pyspark.sql import functions as F

    tiles = cat.load_geo(spark, SF_DIR, "tiles").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    px = agg.explode_pixels(tiles)

    a = {r["code"]: (r["n_pixels"], r["sum_v"])
         for r in geostats.lbp_census(px).collect()}
    b = {r["code"]: (r["n_pixels"], r["sum_v"])
         for r in geostats.lbp_census_tiles(tiles).collect()}
    assert a == b and a

    c = {(r["direction"], r["lag"]): (r["n_pairs"], r["sum_sq_diff"],
                                      r["gamma"])
         for r in geostats.semivariogram_aniso(px).collect()}
    d = {(r["direction"], r["lag"]): (r["n_pairs"], r["sum_sq_diff"],
                                      r["gamma"])
         for r in geostats.semivariogram_aniso_tiles(tiles).collect()}
    assert c == d and len(c) == 12


def test_focal_census_halo_kernels_match_relational(spark, geo001_dir):
    """Row-for-row equivalence of every round-5 halo migration against
    its relational reference shape (tpi, multi-scale tpi, both ZT
    curvatures, focal range, morphological gradient)."""
    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats
    from remotior_sensus_spark.sources import catalog as cat
    from pyspark.sql import functions as F

    tiles = cat.load_geo(spark, SF_DIR, "tiles").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    px = agg.explode_pixels(tiles)

    pairs = [
        (geostats.tpi_landform(px, threshold=300),
         geostats.tpi_landform_tiles(tiles, threshold=300)),
        (geostats.multi_scale_tpi(px, threshold=300.0),
         geostats.multi_scale_tpi_tiles(tiles, threshold=300.0)),
        (geostats.profile_curvature(px, cellsize=10.0),
         geostats.profile_curvature_tiles(tiles, cellsize=10.0)),
        (geostats.plan_curvature(px, cellsize=10.0),
         geostats.plan_curvature_tiles(tiles, cellsize=10.0)),
        (geostats.focal_range_bands(px), geostats.focal_range_tiles(tiles)),
        (geostats.morph_gradient(px, threshold=3500.0),
         geostats.morph_gradient_tiles(tiles, threshold=3500.0)),
    ]
    for rel, halo in pairs:
        a = sorted(tuple(r) for r in rel.collect())
        b = sorted(tuple(r) for r in halo.collect())
        assert a == b and a, rel


def test_change_detection_tile_pivot_matches_exploded(spark, geo001_dir):
    """cva_change_tiles / ndvi_change_tiles (the registered tile-array
    pivots) must equal the exploded-pixel reference shapes
    row-for-row."""
    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import temporal
    from remotior_sensus_spark.sources import catalog as cat
    from pyspark.sql import functions as F

    a, b = "S2_2020-01-01", "S2_2020-01-02"
    tiles = cat.load_geo(spark, SF_DIR, "tiles").filter(
        F.col("bandset").isin(a, b) & F.col("band").isin("B04", "B08"))
    px = agg.explode_pixels(tiles)
    for rel, halo in (
            (temporal.cva_change(px, a, b), temporal.cva_change_tiles(tiles, a, b)),
            (temporal.ndvi_change_classes(px, a, b),
             temporal.ndvi_change_tiles(tiles, a, b))):
        x = sorted(tuple(r) for r in rel.collect())
        y = sorted(tuple(r) for r in halo.collect())
        assert x == y and x


def test_simhash_clusters_collapses_identical_hashes(spark):
    """Scale-shape pin for the r04 VERDICT fix: the band self-join must
    run over DISTINCT simhashes (one node per hash), so the plan
    carries a simhash-keyed aggregate and an identical-text corpus of
    1000 docs produces ZERO band-join candidates (a single hash cannot
    self-pair under the strict < predicate) yet still one cluster of
    1000 via the group rollup."""
    from pyspark.sql import Row
    from remotior_sensus_spark.operators import textops as tx

    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the cat sat on the mat today again",
             lang="en", source="s0") for i in range(1000)])
    out = tx.simhash_clusters(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # r06: the collapsed distinct-hash table is localCheckpointed (the
    # corpus-wide aggregation must not re-run in the labeling job), so
    # the simhash-keyed aggregate no longer appears in THIS plan — the
    # final join/rollup must instead consume the materialized RDD, and
    # the corpus-scale doc table must NOT re-enter it
    assert "ExistingRDD" in plan, "collapsed-hash checkpoint missing"
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["cluster_root"], r["n_docs"], r["doc_id_sum"]) == (
        0, 1000, 999 * 1000 // 2)


def test_simhash_clusters_merges_across_hash_groups(spark):
    """Two Hamming-close hash groups (each with internal exact dups)
    plus one far singleton: the hash-level CC must merge the two
    groups into one cluster carrying every member doc, and the
    singleton must not appear."""
    from pyspark.sql import Row
    from remotior_sensus_spark.operators import textops as tx

    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota kappb"
    far = "one two three four five six seven eight nine ten eleven"
    rows = ([Row(doc_id=i, text=near_a, lang="en", source="s")
             for i in range(3)]
            + [Row(doc_id=10 + i, text=near_b, lang="en", source="s")
               for i in range(2)]
            + [Row(doc_id=99, text=far, lang="en", source="s")])
    docs = spark.createDataFrame(rows)
    sh = {r["doc_id"]: r["simhash"]
          for r in tx.simhash64(docs).collect()}
    ham_ab = bin(sh[0] ^ sh[10]).count("1")
    ham_af = bin(sh[0] ^ sh[99]).count("1")
    got = {r["cluster_root"]: (r["n_docs"], r["doc_id_sum"])
           for r in tx.simhash_clusters(docs).collect()}
    if ham_ab <= 3:  # the two groups merge
        assert got == {0: (5, 0 + 1 + 2 + 10 + 11)}
    else:  # defensive: corpus drifted — still two separate clusters
        assert got == {0: (3, 3), 10: (2, 21)}
    assert ham_af > 3 and 99 not in got


def test_thermal_brightness_plan_is_pure_codegen(spark):
    """The per-pixel BT math must stay JVM-side: no Python evaluation
    nodes, exactly one aggregation exchange."""
    df = Q.REGISTRY["thermal_brightness"][0](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 2  # partial agg + final agg shuffle


def test_morans_correlogram_halo_matches_relational(spark, geo001_dir):
    """The pair-sum halo kernel (morans_correlogram_tiles, the
    registered hot path) must equal the relational per-pixel-join
    form row-for-row INCLUDING the final doubles — same integer sums
    through the same expression tree."""
    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.operators import geostats
    from remotior_sensus_spark.sources import catalog as cat
    from pyspark.sql import functions as F

    tiles = cat.load_geo(spark, SF_DIR, "tiles").filter(
        (F.col("bandset") == "S2_2020-01-01") & (F.col("band") == "B04"))
    px = agg.explode_pixels(tiles)

    a = {r["lag"]: (r["n_pixels"], r["w_sum"], r["morans_i"])
         for r in geostats.morans_correlogram(px).collect()}
    b = {r["lag"]: (r["n_pixels"], r["w_sum"], r["morans_i"])
         for r in geostats.morans_correlogram_tiles(tiles).collect()}
    assert a == b and len(a) == 4


def test_ml_census_parity(spark, geo001_dir):
    """The r06 Arrow ML census is bit-equal to the flat-row codegen
    path for both the plain and the thresholded+confidence variants."""
    from pyspark.sql import functions as F

    from remotior_sensus_spark import queries as qmod
    from remotior_sensus_spark.operators import classification as cls_ops
    from remotior_sensus_spark.functions.cols import fixed1e6

    bands, stats, stacked = qmod._ml_inputs(spark, geo001_dir)

    ref = {r["class"]: r["pixel_count"] for r in
           cls_ops.classify_pixels_flat_scored(
               stacked, bands,
               lambda env: cls_ops.ml_scores(env, stats),
               select_max=True)
           .groupBy("class").agg(F.count("*").alias("pixel_count"))
           .collect()}
    got = {r["class"]: r["pixel_count"] for r in
           cls_ops.ml_census_tiles(stacked, bands, stats).collect()}
    assert got == ref

    sc = cls_ops.classify_pixels_flat_scored(
        stacked, bands,
        lambda env: cls_ops.ml_scores(env, stats, threshold=5.0),
        select_max=True, unclassified_at=float("-inf"),
        include_best=True)
    ref2 = {r["class"]: (r["pixel_count"], r["conf_fp"]) for r in
            sc.groupBy("class").agg(
                F.count("*").alias("pixel_count"),
                F.sum(F.when(F.col("class") != 0, fixed1e6(F.col("best")))
                      .otherwise(0)).alias("conf_fp")).collect()}
    got2 = {r["class"]: (r["pixel_count"], r["conf_fp"]) for r in
            cls_ops.ml_census_tiles(stacked, bands, stats, threshold=5.0,
                                    include_best=True).collect()}
    assert got2 == ref2
