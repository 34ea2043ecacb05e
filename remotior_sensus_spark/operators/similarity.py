"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Brute-force cosine top-k as the exactness baseline; LSH-bucketed
(random-hyperplane signs) variant as the scale path — candidates only
form within matching sign-buckets, then exact re-rank.

All vector math is JVM higher-order functions (zip_with/aggregate);
the hyperplanes are deterministic literals (splitmix-derived), so the
bucketing reproduces run-to-run.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from remotior_sensus_spark.synth.generate import splitmix64


FP_SCALE = float(1 << 20)


def _dot_fp(a, b):
    """Order-independent fixed-point dot product: every elementwise
    product (exact float32->double, one double multiply) is quantized to
    2^-20 and summed as BIGINT. Any summation order / engine yields the
    same integer, so cosine ranks are reproducible bit-for-bit against
    the DuckDB oracle (same trick as functions.cols.fixed1e6)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(FP_SCALE) + F.lit(0.5)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _cos_fp(e, q):
    """Cosine from fixed-point dots (the 2^20 scales cancel).

    try_divide: a zero (or fully sub-quantization) vector has norm 0 —
    under Spark 4's default ANSI mode a plain `/` would THROW and abort
    the whole top-k job for one degenerate row. Null cosine sorts last
    under the descending rank, so degenerate vectors simply never make
    the top-k (fixtures contain none; identical IEEE doubles otherwise,
    so oracle parity is unaffected)."""
    return F.try_divide(
        _dot_fp(e, q).cast("double"),
        F.sqrt(_dot_fp(e, e).cast("double")) * F.sqrt(_dot_fp(q, q).cast("double")),
    )


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int], k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for the given query vec_ids.
    Query side is tiny -> broadcast; one pass over the corpus."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    j = embeddings.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    cos = _cos_fp(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        j.select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from splitmix64 -> N(0,1)-ish
    via sum of uniforms (CLT); pure function of (dim, n_planes)."""
    idx = np.arange(dim * n_planes * 4, dtype=np.uint64)
    u = (splitmix64(idx + np.uint64(0xABCD)) % np.uint64(10**9)).astype(np.float64) / 1e9
    g = u.reshape(n_planes, dim, 4).sum(axis=2) - 2.0
    return [[float(x) for x in row] for row in g]


def lsh_sign_buckets(embeddings: DataFrame, n_planes: int = 12, dim: int = 64) -> DataFrame:
    planes = _hyperplanes(dim, n_planes)
    sig = None
    for i, p in enumerate(planes):
        # fixed-point sign so the bucket id is engine-independent
        d = _dot_fp(F.col("embedding"), F.array(*[F.lit(v) for v in p]))
        bit = F.when(d > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return embeddings.withColumn("bucket", sig)


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.4,
                            n_planes: int = 12) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale: candidate pairs
    only form inside sign-LSH buckets (each vector probes its bucket
    plus every 1-bit flip, so pairs within Hamming distance 2 of each
    other's signatures still meet), then the exact fixed-point cosine
    verifies against `threshold`. Never the O(n^2) cross join — the
    100 TB shape is shuffle-on-bucket + pair-dedup + two hash joins for
    the exact re-check (the embedding analogue of MinHash LSH dedup)."""
    b = lsh_sign_buckets(embeddings, n_planes).localCheckpoint()
    probes = b.select(
        "vec_id",
        F.explode(
            F.array_union(
                F.array(F.col("bucket")),
                F.array(*[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ]),
            )
        ).alias("bucket"),
    )
    a, c = probes.alias("a"), probes.alias("c")
    # dedupe candidate ids FIRST (2-long rows through the shuffle)
    pairs = (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("c.vec_id").alias("vec_b"))
        .distinct()
    )
    withemb = (
        pairs.join(b.select(F.col("vec_id").alias("vec_a"),
                            F.col("embedding").alias("e_a")), "vec_a")
        .join(b.select(F.col("vec_id").alias("vec_b"),
                       F.col("embedding").alias("e_b")), "vec_b")
    )
    cos = _cos_fp(F.col("e_a"), F.col("e_b"))
    return withemb.select(
        "vec_a", "vec_b", cos.alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)


def cosine_topk_lsh(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                    n_planes: int = 12) -> DataFrame:
    """ANN: candidates share the sign-bucket (or differ in <=1 probe bit
    via multi-probe), exact cosine re-rank inside buckets."""
    b = lsh_sign_buckets(embeddings, n_planes)
    q = b.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(
            F.array_union(
                F.array(F.col("bucket")),
                F.array(*[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                    for i in range(n_planes)
                ]),
            )
        ).alias("bucket"),
    )
    j = b.join(F.broadcast(q), "bucket").filter(F.col("vec_id") != F.col("query_id"))
    cos = _cos_fp(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        j.select("query_id", "vec_id", cos.alias("cos_sim"))
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_coarse_codebook(embeddings: DataFrame, n_lists: int = 16) -> DataFrame:
    """Coarse quantizer codebook for IVF: the `n_lists` corpus vectors
    that sort first in md5(vec_id) order — a deterministic random
    sample, the classic IVF-flat baseline codebook (reproducible
    run-to-run and engine-to-engine, same trick as
    tables.stratified_sample). A trained codebook from
    classification.kmeans_bands plugs in wherever this DataFrame is
    passed; search below only assumes (centroid_id, c_emb)."""
    return (
        embeddings.orderBy(F.md5(F.col("vec_id").cast("string")),
                           F.col("vec_id"))
        .limit(n_lists)
        .select(F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("c_emb"))
    )


def ivf_inverted_lists(embeddings: DataFrame, codebook: DataFrame) -> DataFrame:
    """Assign every corpus vector to its nearest coarse centroid
    (max exact fixed-point cosine, ties to the smaller centroid_id).
    The codebook is tiny -> broadcast; the argmax is a map-side-combine
    aggregate on vec_id (no sort, one shuffle of compact
    (vec_id, best-struct, embedding) rows). Returns the inverted index
    (list_id, vec_id, embedding) that candidates are fetched from."""
    j = embeddings.crossJoin(F.broadcast(codebook))
    cos = _cos_fp(F.col("embedding"), F.col("c_emb"))
    scored = j.select(
        "vec_id", "embedding",
        F.struct(cos.alias("c_cos"),
                 (-F.col("centroid_id")).alias("neg_cid")).alias("sc"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max("sc").alias("m"), F.first("embedding").alias("embedding")
    )
    return best.select(
        (-F.col("m.neg_cid")).alias("list_id"), "vec_id", "embedding"
    )


def cosine_topk_ivf(embeddings: DataFrame, query_ids: list[int], k: int = 10,
                    n_lists: int = 16, n_probe: int = 4) -> DataFrame:
    """IVF-flat ANN: corpus partitioned into `n_lists` inverted lists by
    nearest coarse centroid; each query probes its `n_probe` nearest
    lists and exact-re-ranks only the vectors in them. The 100 TB
    shape: the codebook and the probed (query, list) pairs broadcast,
    the corpus shuffles ONCE on vec_id for the assignment argmax, and
    the candidate fetch is a broadcast-hash join on list_id — never an
    all-pairs cross join. Complements cosine_topk_lsh: IVF's Voronoi
    lists adapt to the data distribution where sign-LSH's hyperplanes
    are data-oblivious. Ref analogue: remotior_sensus's spectral
    signature search over catalogs (tools/band_classification.py) —
    re-expressed as a two-level coarse-quantize + refine join."""
    codebook = ivf_coarse_codebook(embeddings, n_lists)
    inv = ivf_inverted_lists(embeddings, codebook)
    q0 = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qc = q0.crossJoin(F.broadcast(codebook))
    qcos = _cos_fp(F.col("q_emb"), F.col("c_emb"))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("c_cos"), F.asc("centroid_id"))
    probes = (
        qc.select("query_id", "q_emb", "centroid_id", qcos.alias("c_cos"))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "q_emb", F.col("centroid_id").alias("list_id"))
    )
    cand = inv.join(F.broadcast(probes), "list_id").filter(
        F.col("vec_id") != F.col("query_id"))
    cos = _cos_fp(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


Q_SCALE = 1024.0  # centroid-assignment quantization (2^10)


def _quant(col) -> F.Column:
    """floor(v * 2^10 + 0.5) — coarse exact-integer embedding lattice.
    2^10 keeps every downstream squared distance far inside int64
    (|vq| <= ~1024, dim 64 => dist <= 64 * 2048^2 ~ 2.7e8) while the
    half-up rounding on an exact float32->double product is the same
    IEEE op in both engines."""
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(Q_SCALE) + F.lit(0.5))
        .cast("long"))


def centroid_assign(embeddings: DataFrame) -> DataFrame:
    """Nearest-label-centroid assignment confusion matrix — the
    "classify by class mean" evaluation step (the embedding analogue of
    the reference's minimum-distance classification,
    ref remotior_sensus/core/spectral_signatures.py signature means):
    per-label centroids from the quantized lattice, every vector
    assigned to the argmin squared-distance centroid (ties to the
    smaller label), aggregated to (true label, assigned label).

    All arithmetic is exact: lattice sums are BIGINT, the centroid is
    floor(sum/count) per dimension (a float division of magnitudes
    << 2^53, so floor() is the same integer in every engine), and
    distances are BIGINT sums of squares. Plan: one dim-exploded
    partial agg for the centroids (label-bounded), broadcast back, one
    confusion rollup — the corpus never shuffles."""
    q = embeddings.select(
        "vec_id", "label", _quant(F.col("embedding")).alias("vq"))
    dims = q.select(
        "label", F.posexplode("vq").alias("i", "x"))
    cent = (
        dims.groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .select("label", "i",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("cq"))
        .groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cq"))),
            lambda e: e["cq"]).alias("cvec"))
        .select(F.col("label").alias("c_label"), "cvec")
    )
    j = q.crossJoin(F.broadcast(cent))
    dist = F.aggregate(
        F.zip_with(F.col("vq"), F.col("cvec"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, d: acc + d)
    best = (
        j.select("vec_id", "label", "c_label", dist.alias("d"))
        .groupBy("vec_id", "label")
        .agg(F.min(F.struct(F.col("d"), F.col("c_label"))).alias("b"))
    )
    return (
        best.select(
            "label",
            F.col("b.c_label").alias("assigned_label"),
            F.col("b.d").alias("d"))
        .groupBy("label", "assigned_label")
        .agg(F.count("*").alias("n_vecs"), F.sum("d").alias("sum_dist"))
    )


def ann_recall_audit(embeddings: DataFrame, query_ids: list[int],
                     k: int = 10, n_planes: int = 12) -> DataFrame:
    """ANN estimator honesty (the embedding twin of
    minhash_estimator_accuracy): per query, how many of the LSH
    multi-probe top-k are in the EXACT brute-force top-k. Both sides
    use the shared fixed-point cosine, so the per-query hit count is a
    deterministic integer. Returns one row per query:
    (query_id, n_hits, k, brute_id_sum, lsh_id_sum)."""
    brute = cosine_topk_bruteforce(embeddings, query_ids, k=k).select(
        "query_id", F.col("vec_id").alias("b_id"))
    lsh = cosine_topk_lsh(embeddings, query_ids, k=k, n_planes=n_planes
                          ).select("query_id", F.col("vec_id").alias("l_id"))
    hits = (
        lsh.join(brute, (lsh["query_id"] == brute["query_id"])
                 & (F.col("l_id") == F.col("b_id")))
        .groupBy(lsh["query_id"].alias("query_id"))
        .agg(F.count("*").alias("n_hits"))
    )
    per_q = (
        brute.groupBy("query_id")
        .agg(F.sum("b_id").alias("brute_id_sum"))
        .join(lsh.groupBy("query_id").agg(F.sum("l_id").alias("lsh_id_sum")),
              "query_id")
        .join(hits, "query_id", "left")
    )
    return per_q.select(
        "query_id",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.lit(k).cast("int").alias("k"),
        "brute_id_sum", "lsh_id_sum")


def dim_trunc_recall(embeddings: DataFrame, query_ids: list[int],
                     k: int = 10, dims: int = 16) -> DataFrame:
    """Matryoshka-style dimension-truncation audit: per query, how
    many of the exact top-k under only the FIRST `dims` coordinates
    survive in the exact full-dimension top-k — the retrieval-quality
    question behind MRL / truncated-embedding serving (store 16 of 64
    dims, how much ranking do you lose?).  Both rankings are exact
    brute force with the shared fixed-point cosine (the truncated side
    just slices the array before the same JVM zip_with/aggregate dot),
    so the per-query hit count is a deterministic integer.  Returns
    one row per query: (query_id, n_hits, k, full_id_sum,
    trunc_id_sum).

    Scale shape: two broadcast-query corpus passes + one tiny join —
    identical to ann_recall_audit; the truncation is a per-row slice,
    no extra shuffle."""
    trunc = embeddings.select(
        "vec_id", F.slice("embedding", 1, dims).alias("embedding"))
    full_top = cosine_topk_bruteforce(embeddings, query_ids, k=k).select(
        "query_id", F.col("vec_id").alias("f_id"))
    trunc_top = cosine_topk_bruteforce(trunc, query_ids, k=k).select(
        "query_id", F.col("vec_id").alias("t_id"))
    hits = (
        trunc_top.join(full_top,
                       (trunc_top["query_id"] == full_top["query_id"])
                       & (F.col("t_id") == F.col("f_id")))
        .groupBy(trunc_top["query_id"].alias("query_id"))
        .agg(F.count("*").alias("n_hits"))
    )
    per_q = (
        full_top.groupBy("query_id")
        .agg(F.sum("f_id").alias("full_id_sum"))
        .join(trunc_top.groupBy("query_id")
              .agg(F.sum("t_id").alias("trunc_id_sum")), "query_id")
        .join(hits, "query_id", "left")
    )
    return per_q.select(
        "query_id",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.lit(k).cast("int").alias("k"),
        "full_id_sum", "trunc_id_sum")


def bq_recall_audit(embeddings: DataFrame, query_ids: list[int],
                    k: int = 10) -> DataFrame:
    """Binary-quantization serving audit: rank the corpus per query by
    HAMMING distance between sign-bit vectors (1 bit per dim — the
    32x-compression BQ index pattern), take the top-k (ties broken by
    vec_id — sign vectors collide heavily, so the deterministic
    tie-break is part of the contract), and count how many exact
    full-precision cosine top-k neighbours the bit ranking preserves.
    Completes the recall-audit family: LSH buckets
    (ann_recall_audit), IVF lists (ivf_recall_audit), dimension
    truncation (dim_trunc_recall), and now 1-bit quantization.
    Returns one row per query: (query_id, n_hits, k, brute_id_sum,
    bq_id_sum).

    Scale shape: the sign/Hamming pass is JVM transform/zip_with over
    a broadcast query set — same one-corpus-pass shape as the brute
    ranking; integer distances, no floats on the BQ side at all."""
    signs = F.transform(
        "embedding",
        lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0))
        .cast("int"))
    sq = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), signs.alias("q_sig"))
    corpus = embeddings.select("vec_id", signs.alias("sig"))
    ham = F.aggregate(
        F.zip_with("sig", "q_sig",
                   lambda a, b: F.when(a != b, F.lit(1))
                   .otherwise(F.lit(0))),
        F.lit(0), lambda acc, v: acc + v)
    jw = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("vec_id"))
    bq_top = (corpus.crossJoin(F.broadcast(sq))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", "vec_id", ham.alias("hamming"))
              .withColumn("rank", F.row_number().over(jw))
              .filter(F.col("rank") <= k)
              .select("query_id", F.col("vec_id").alias("b_id")))
    brute = cosine_topk_bruteforce(embeddings, query_ids, k=k).select(
        "query_id", F.col("vec_id").alias("e_id"))
    hits = (
        bq_top.join(brute, (bq_top["query_id"] == brute["query_id"])
                    & (F.col("b_id") == F.col("e_id")))
        .groupBy(bq_top["query_id"].alias("query_id"))
        .agg(F.count("*").alias("n_hits"))
    )
    per_q = (
        brute.groupBy("query_id")
        .agg(F.sum("e_id").alias("brute_id_sum"))
        .join(bq_top.groupBy("query_id")
              .agg(F.sum("b_id").alias("bq_id_sum")), "query_id")
        .join(hits, "query_id", "left")
    )
    return per_q.select(
        "query_id",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.lit(k).cast("int").alias("k"),
        "brute_id_sum", "bq_id_sum")


def embedding_norm_bands(embeddings: DataFrame) -> DataFrame:
    """Embedding-norm sanity profile: the fixed-point squared norm
    (the shared _dot_fp lattice, exact BIGINT) bucketed by
    floor(log2(.)) from the binary expansion — the quick audit for
    degenerate / unnormalized vectors a pipeline runs before cosine
    retrieval. Pure projection + one bounded rollup.
    Returns (norm_band, n_vecs, sum_norm_fp)."""
    nfp = _dot_fp(F.col("embedding"), F.col("embedding"))
    band = F.when(nfp > 0, (F.length(F.bin(nfp)) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        embeddings.select(band.alias("norm_band"), nfp.alias("nfp"))
        .groupBy("norm_band")
        .agg(F.count("*").alias("n_vecs"), F.sum("nfp").alias("sum_norm_fp"))
    )

def quantize_error(embeddings: DataFrame) -> DataFrame:
    """Int8 quantization-error profile: every vector is quantized to the
    int8 lattice floor(x*2^6+0.5) clamped to [-128, 127] (the standard
    symmetric int8 embedding compression) and the per-vector squared
    reconstruction error is measured EXACTLY on the shared 2^10 lattice
    — err_dim = floor(x*1024+0.5) - 16*q8, so the error integers and
    their power-of-two band are bit-identical in every engine. The
    audit a pipeline runs before switching its ANN index to int8.

    Zero shuffles before the bounded band rollup: both lattices and the
    squared sum are per-row array transforms. Returns
    (err_band, n_vecs, sum_sse)."""
    vq = _quant(F.col("embedding"))
    q8 = F.transform(
        F.col("embedding"),
        lambda x: F.least(
            F.greatest(F.floor(x.cast("double") * F.lit(64.0) + F.lit(0.5))
                       .cast("long"), F.lit(-128).cast("long")),
            F.lit(127).cast("long")))
    sse = F.aggregate(
        F.zip_with(vq, q8, lambda a, b: (a - 16 * b) * (a - 16 * b)),
        F.lit(0).cast("long"), lambda acc, d: acc + d)
    d = embeddings.select(sse.alias("sse"))
    band = F.when(F.col("sse") > 0,
                  (F.length(F.bin(F.col("sse"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        d.select(band.alias("err_band"), "sse")
        .groupBy("err_band")
        .agg(F.count("*").alias("n_vecs"), F.sum("sse").alias("sum_sse"))
    )


def class_scatter(embeddings: DataFrame) -> DataFrame:
    """Within-class scatter: per label, the exact sum and mean of
    squared lattice distances from each vector to its OWN label
    centroid — the Fisher-style compactness number that tells a
    training pipeline whether class embeddings are separable before it
    trusts a nearest-centroid router (centroid math identical to
    centroid_assign). One label-bounded dim-exploded partial agg for
    the centroids, broadcast back, one bounded rollup; the corpus
    never shuffles. Returns (label, n_vecs, sum_dist, mean_dist_x1000)."""
    q = embeddings.select("vec_id", "label",
                          _quant(F.col("embedding")).alias("vq"))
    cent = (
        q.select("label", F.posexplode("vq").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .select("label", "i",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("cq"))
        .groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cq"))),
            lambda e: e["cq"]).alias("cvec"))
    )
    j = q.join(F.broadcast(cent), "label")
    dist = F.aggregate(
        F.zip_with(F.col("vq"), F.col("cvec"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, d: acc + d)
    return (
        j.select("label", dist.alias("dd"))
        .groupBy("label")
        .agg(F.count("*").alias("n_vecs"), F.sum("dd").alias("sum_dist"),
             F.expr("(sum(dd) * 1000) div count(*)")
             .alias("mean_dist_x1000"))
    )


def knn_label_vote(embeddings: DataFrame, query_ids: list[int],
                   k: int = 5) -> DataFrame:
    """k-NN label vote: each query vector's k exact-cosine nearest
    neighbours (excluding itself) vote on its label; ties break to the
    smaller label. The leave-one-out sanity check a pipeline runs on
    its embedding space before using neighbour labels for weak
    supervision. Query set broadcasts; the corpus is scanned once
    (brute-force exact — the LSH/IVF paths above are the scale
    variants). Returns (query_id, own_label, voted_label, n_votes)."""
    q0 = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("own_label"),
        F.col("embedding").alias("q_emb"))
    cand = embeddings.crossJoin(F.broadcast(q0)).filter(
        F.col("vec_id") != F.col("query_id"))
    cos = _cos_fp(F.col("embedding"), F.col("q_emb"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    top = (
        cand.select("query_id", "own_label", "vec_id", "label",
                    cos.alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    votes = top.groupBy("query_id", "own_label", "label").agg(
        F.count("*").alias("c"))
    best = votes.groupBy("query_id", "own_label").agg(
        F.max(F.struct(F.col("c"), (-F.col("label")).alias("nl"))).alias("b"))
    return best.select(
        "query_id", "own_label",
        (-F.col("b.nl")).alias("voted_label"),
        F.col("b.c").alias("n_votes"))


def ivf_list_balance(embeddings: DataFrame, n_lists: int = 16) -> DataFrame:
    """IVF inverted-list balance audit: the size of every coarse list
    under the same codebook/assignment as cosine_topk_ivf, plus each
    list's share of the corpus in exact fixed-point. Skewed lists are
    the failure mode of IVF at scale (one hot Voronoi cell turns the
    probe step back into brute force), so the balance histogram is the
    go/no-go check before shipping the index. One corpus shuffle (the
    assignment argmax), then a bounded rollup joined to one broadcast
    scalar. Returns (list_id, n_vecs, share_fp)."""
    codebook = ivf_coarse_codebook(embeddings, n_lists)
    inv = ivf_inverted_lists(embeddings, codebook)
    sizes = inv.groupBy("list_id").agg(F.count("*").alias("n_vecs"))
    tot = embeddings.agg(F.count("*").alias("n_total"))
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select("list_id", "n_vecs",
                F.expr("(n_vecs * 1000000) div n_total").alias("share_fp"))
    )

def lsh_bucket_balance(embeddings: DataFrame, n_planes: int = 12) -> DataFrame:
    """Sign-LSH bucket-occupancy histogram under the same hyperplanes
    as cosine_topk_lsh — the collision-quality audit for the LSH index
    (one over-full bucket means candidate verification degenerates to
    brute force there, empty regions mean recall loss; the ivf
    counterpart is ivf_list_balance). One map-side-combinable bucket
    count, then a bounded size-histogram rollup; the bucket-id sum per
    size class pins exact membership. Returns
    (bucket_size, n_buckets, bucket_id_sum)."""
    b = lsh_sign_buckets(embeddings, n_planes=n_planes)
    sizes = b.groupBy("bucket").agg(F.count("*").alias("bucket_size"))
    return (
        sizes.groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"),
             F.sum("bucket").alias("bucket_id_sum"))
    )


def centroid_margin_bands(embeddings: DataFrame) -> DataFrame:
    """Nearest-centroid routing-confidence audit: per vector, the exact
    lattice-distance MARGIN between its best and second-best label
    centroid (the same centroids as centroid_assign), histogrammed on
    power-of-two bands and split by whether the best centroid is the
    vector's own label. Zero margin = ambiguous routing; small margins
    predict the confusion centroid_assign reports. Label-bounded
    centroid build broadcast back; the per-vector two-smallest pick is
    a sorted array over the bounded label set (no shuffle). Returns
    (margin_band, correct, n_vecs, sum_margin)."""
    q = embeddings.select("vec_id", "label",
                          _quant(F.col("embedding")).alias("vq"))
    cent = (
        q.select("label", F.posexplode("vq").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .select("label", "i",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("cq"))
        .groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cq"))),
            lambda e: e["cq"]).alias("cvec"))
        .select(F.col("label").alias("c_label"), "cvec")
    )
    j = q.crossJoin(F.broadcast(cent))
    dist = F.aggregate(
        F.zip_with(F.col("vq"), F.col("cvec"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, d: acc + d)
    per = (
        j.select("vec_id", "label", "c_label", dist.alias("d"))
        .groupBy("vec_id", "label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "c_label")))
             .alias("ds"))
    )
    d1 = F.element_at("ds", 1)
    d2 = F.element_at("ds", 2)
    margin = (d2["d"] - d1["d"]).cast("long")
    correct = (d1["c_label"] == F.col("label")).cast("int")
    m = per.select(margin.alias("margin"), correct.alias("correct"))
    band = F.when(F.col("margin") > 0,
                  (F.length(F.bin(F.col("margin"))) - 1).cast("int")) \
        .otherwise(F.lit(-1))
    return (
        m.select(band.alias("margin_band"), "correct", "margin")
        .groupBy("margin_band", "correct")
        .agg(F.count("*").alias("n_vecs"), F.sum("margin").alias("sum_margin"))
    )


def centroid_separation(embeddings: DataFrame) -> DataFrame:
    """Between-class separation on the exact 2^10 lattice: the squared
    lattice distance between every pair of label centroids — read
    together with class_scatter it is the Fisher-style
    separability audit (small between-distance relative to within
    scatter predicts centroid_assign confusion between that pair).
    One label-bounded centroid build (same as centroid_assign), then
    an a<b pair join on the label-bounded centroid table only —
    vectors never pair. Returns (label_a, label_b, dist_sq)."""
    q = embeddings.select("label", _quant(F.col("embedding")).alias("vq"))
    cent = (
        q.select("label", F.posexplode("vq").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .select("label", "i",
                F.floor(F.col("s") / F.col("n")).cast("long").alias("cq"))
        .groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cq"))),
            lambda e: e["cq"]).alias("cvec"))
    )
    a = cent.select(F.col("label").alias("label_a"), F.col("cvec").alias("va"))
    b = cent.select(F.col("label").alias("label_b"), F.col("cvec").alias("vb"))
    j = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
    dist = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, d: acc + d)
    return j.select("label_a", "label_b", dist.alias("dist_sq"))


def ivf_recall_audit(embeddings: DataFrame, query_ids: list[int],
                     k: int = 10, n_lists: int = 16,
                     n_probe: int = 4) -> DataFrame:
    """IVF estimator honesty — the cosine_topk_ivf twin of
    ann_recall_audit: per query, how many of the IVF n_probe top-k are
    in the EXACT brute-force top-k. Read next to ann_recall_audit it
    answers which index family (data-adaptive Voronoi lists vs
    data-oblivious sign hyperplanes) loses less recall on this corpus.
    Returns (query_id, n_hits, k, brute_id_sum, ivf_id_sum)."""
    brute = cosine_topk_bruteforce(embeddings, query_ids, k=k).select(
        "query_id", F.col("vec_id").alias("b_id"))
    ivf = cosine_topk_ivf(embeddings, query_ids, k=k, n_lists=n_lists,
                          n_probe=n_probe
                          ).select("query_id", F.col("vec_id").alias("l_id"))
    hits = (
        ivf.join(brute, (ivf["query_id"] == brute["query_id"])
                 & (F.col("l_id") == F.col("b_id")))
        .groupBy(ivf["query_id"].alias("query_id"))
        .agg(F.count("*").alias("n_hits"))
    )
    per_q = (
        brute.groupBy("query_id")
        .agg(F.sum("b_id").alias("brute_id_sum"))
        .join(ivf.groupBy("query_id").agg(F.sum("l_id").alias("ivf_id_sum")),
              "query_id")
        .join(hits, "query_id", "left")
    )
    return per_q.select(
        "query_id",
        F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
        F.lit(k).cast("int").alias("k"),
        "brute_id_sum", "ivf_id_sum")


def dim_variance_profile(embeddings: DataFrame) -> DataFrame:
    """Per-dimension variance profile on the exact 2^10 lattice: for
    every embedding dimension, the exact BIGINT variance numerator
    n*sum(x^2) - sum(x)^2 (divide by n^2 off-engine when a float is
    wanted) — the PCA-lite audit that finds dead dimensions (zero
    variance: wasted index width) and dominant ones (candidates for
    PQ subspace splits). Zero shuffles before the dim-bounded rollup.
    int64 ceiling: |x| <= ~2^11 keeps n*sum(x^2) exact to n ~ 1e12
    vectors per partition-tree — far past any single table here.
    Returns (dim, n_vecs, sum_x, var_num)."""
    q = embeddings.select(_quant(F.col("embedding")).alias("vq"))
    d = q.select(F.posexplode("vq").alias("i", "x"))
    return (
        d.groupBy("i")
        .agg(F.count("*").alias("n_vecs"), F.sum("x").alias("sum_x"),
             F.sum(F.col("x") * F.col("x")).alias("sum_sq"))
        .select(F.col("i").cast("int").alias("dim"), "n_vecs", "sum_x",
                (F.col("n_vecs") * F.col("sum_sq")
                 - F.col("sum_x") * F.col("sum_x")).alias("var_num"))
    )


def pq_assign_audit(embeddings: DataFrame, n_codes: int = 16,
                    n_sub: int = 4, dim: int = 64) -> DataFrame:
    """Product-quantization assignment census: the 64-dim lattice
    vector splits into `n_sub` contiguous subspaces, each assigned to
    its nearest of `n_codes` codewords (the md5-order deterministic
    sample codebook ivf_coarse_codebook uses, sliced per subspace;
    ties to the smaller code id). The per-(subspace, code) population
    and exact distortion sum are the two numbers that decide whether a
    PQ index is balanced enough to build — one hot code in one
    subspace halves that subspace's effective bits. Codebook
    broadcast, all subspace distances from ONE corpus pass, one
    vec-keyed argmin groupBy, bounded rollup. Returns
    (subspace, code_id, n_vecs, sum_dist)."""
    sub_d = dim // n_sub
    q = embeddings.select("vec_id", _quant(F.col("embedding")).alias("vq"))
    cb = (
        embeddings.orderBy(F.md5(F.col("vec_id").cast("string")),
                           F.col("vec_id"))
        .limit(n_codes)
        .select(F.col("vec_id").alias("cid"),
                _quant(F.col("embedding")).alias("cq"))
    )
    j = q.crossJoin(F.broadcast(cb))
    outs = []
    for s in range(n_sub):
        sv = F.slice(F.col("vq"), s * sub_d + 1, sub_d)
        sc = F.slice(F.col("cq"), s * sub_d + 1, sub_d)
        dist = F.aggregate(
            F.zip_with(sv, sc, lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"), lambda acc, x: acc + x)
        outs.append(F.struct(F.lit(s).alias("subspace"), dist.alias("d")))
    ex = (
        j.select("vec_id", "cid", F.explode(F.array(*outs)).alias("o"))
        .select("vec_id", F.col("o.subspace").alias("subspace"), "cid",
                F.col("o.d").alias("d"))
    )
    per = ex.groupBy("vec_id", "subspace").agg(
        F.min(F.struct("d", "cid")).alias("m"))
    return (
        per.select("subspace", F.col("m.cid").alias("code_id"),
                   F.col("m.d").alias("d"))
        .groupBy(F.col("subspace").cast("int").alias("subspace"), "code_id")
        .agg(F.count("*").alias("n_vecs"), F.sum("d").alias("sum_dist"))
    )


def semdedup(embeddings: DataFrame, n_lists: int = 16,
             threshold: float = 0.35) -> DataFrame:
    """SemDeDup-style semantic dedup census (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus into coarse clusters
    (the IVF inverted lists — same codebook as ann_cosine_ivf), then
    WITHIN each cluster mark every vector that has a higher-similarity
    twin: vec v is dropped iff some u in the same list has
    cos_fp(u, v) >= threshold and u.vec_id < v.vec_id (deterministic
    min-id survivor — the same keep rule as dedup_survivors). Returns
    one row per list: (list_id, n_vecs, n_dropped, n_kept).

    Scale shape: the all-pairs step is CONFINED to one inverted list —
    SemDeDup's contract is that n_lists grows with the corpus
    (the paper uses k ~= sqrt(N)-scale clusterings), keeping per-list
    occupancy bounded, so the within-list self-join proposes
    O(N^2 / n_lists) pairs, never corpus x corpus. The join is an
    equi-join on list_id (shuffle-hash, co-partitioned both sides);
    the codebook broadcast + assignment argmax is the single
    corpus-wide shuffle, shared with ivf_inverted_lists. For skewed
    lists the ivf_list_balance audit is the guard rail: a list holding
    >> N/n_lists vectors is the signal to re-train / split the
    codebook before running semdedup, exactly as in the paper.

    Exactness: the cosine is the order-independent fixed-point dot
    (_dot_fp, quantized 2^-20 BIGINT sums) divided as one double op —
    bit-identical in DuckDB, so the threshold compare can never
    straddle engines.

    Reference scope: the reference has no semantic dedup; this is the
    LLM-curation extension family (SURVEY.md: training-data ops).
    """
    codebook = ivf_coarse_codebook(embeddings, n_lists)
    inv = ivf_inverted_lists(embeddings, codebook)
    a = inv.select(F.col("list_id"), F.col("vec_id").alias("vid_a"),
                   F.col("embedding").alias("emb_a"))
    b = inv.select(F.col("list_id"), F.col("vec_id").alias("vid_b"),
                   F.col("embedding").alias("emb_b"))
    pairs = a.hint("shuffle_hash").join(b, "list_id").filter(
        F.col("vid_b") < F.col("vid_a"))
    qual = pairs.filter(
        _cos_fp(F.col("emb_a"), F.col("emb_b")) >= F.lit(threshold))
    dropped = qual.select("list_id", F.col("vid_a").alias("vec_id")).distinct()
    per_list = inv.groupBy("list_id").agg(F.count("*").alias("n_vecs"))
    drops = dropped.groupBy("list_id").agg(F.count("*").alias("n_dropped"))
    zero = F.lit(0).cast("long")
    return (per_list.join(drops, "list_id", "left")
            .select(F.col("list_id"), F.col("n_vecs"),
                    F.coalesce(F.col("n_dropped"), zero).alias("n_dropped"),
                    (F.col("n_vecs") - F.coalesce(F.col("n_dropped"), zero)
                     ).alias("n_kept")))
