"""Dense-numpy parity for the round-4 embedding audits: every lattice
quantity (2^10 vector lattice, 2^-20 fixed-point dots) is rebuilt with
plain numpy/hashlib, independent of the relational formulation the
DuckDB oracles mirror."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from remotior_sensus_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb():
    df = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    vq = np.floor(v * 1024.0 + 0.5).astype(np.int64)
    return df["vec_id"].to_numpy(), df["label"].to_numpy(), v, vq


def _centroids(labels, vq):
    out = {}
    for lb in np.unique(labels):
        m = vq[labels == lb]
        out[int(lb)] = np.floor(m.sum(axis=0) / len(m)).astype(np.int64)
    return out


def test_centroid_separation_matches_numpy(spark, emb):
    _ids, labels, _v, vq = emb
    cent = _centroids(labels, vq)
    ls = sorted(cent)
    ref = {(a, b): int(((cent[a] - cent[b]) ** 2).sum())
           for i, a in enumerate(ls) for b in ls[i + 1:]}
    got = {(r["label_a"], r["label_b"]): r["dist_sq"] for r in
           Q.REGISTRY["centroid_separation"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_dim_variance_profile_matches_numpy(spark, emb):
    _ids, _labels, _v, vq = emb
    n = len(vq)
    s = vq.sum(axis=0)
    s2 = (vq * vq).sum(axis=0)
    ref = {d: (n, int(s[d]), int(n * s2[d] - s[d] * s[d]))
           for d in range(vq.shape[1])}
    got = {r["dim"]: (r["n_vecs"], r["sum_x"], r["var_num"]) for r in
           Q.REGISTRY["dim_variance_profile"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_centroid_margin_bands_match_numpy(spark, emb):
    _ids, labels, _v, vq = emb
    cent = _centroids(labels, vq)
    ls = sorted(cent)
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for i in range(len(vq)):
        ds = sorted((int(((vq[i] - cent[lb]) ** 2).sum()), lb) for lb in ls)
        margin = ds[1][0] - ds[0][0]
        correct = int(ds[0][1] == labels[i])
        band = margin.bit_length() - 1 if margin > 0 else -1
        cens[(band, correct)][0] += 1
        cens[(band, correct)][1] += margin
    ref = {k: tuple(x) for k, x in cens.items()}
    got = {(r["margin_band"], r["correct"]): (r["n_vecs"], r["sum_margin"])
           for r in Q.REGISTRY["centroid_margin_bands"][0](
               spark, SF_DIR).collect()}
    assert got == ref


def test_pq_assign_audit_matches_numpy(spark, emb):
    ids, _labels, _v, vq = emb
    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), ids[i]))
    cb = [(int(ids[i]), vq[i]) for i in order[:16]]
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for i in range(len(vq)):
        for s in range(4):
            sl = slice(s * 16, (s + 1) * 16)
            best = min((int(((vq[i][sl] - cq[sl]) ** 2).sum()), cid)
                       for cid, cq in cb)
            cens[(s, best[1])][0] += 1
            cens[(s, best[1])][1] += best[0]
    ref = {k: tuple(x) for k, x in cens.items()}
    got = {(r["subspace"], r["code_id"]): (r["n_vecs"], r["sum_dist"])
           for r in Q.REGISTRY["pq_assign_audit"][0](
               spark, SF_DIR).collect()}
    assert got == ref


def test_lsh_bucket_balance_matches_numpy(spark, emb):
    from remotior_sensus_spark.operators.similarity import _hyperplanes
    _ids, _labels, v, _vq = emb
    planes = np.array(_hyperplanes(64, 12))  # (12, 64) float64
    # elementwise fixed-point sign dot, same IEEE sequence as _dot_fp
    buckets = np.zeros(len(v), dtype=np.int64)
    for i, p in enumerate(planes):
        d = np.floor(v * p * 1048576.0 + 0.5).astype(np.int64).sum(axis=1)
        buckets |= (d > 0).astype(np.int64) << i
    from collections import Counter, defaultdict
    sizes = Counter(buckets.tolist())
    cens = defaultdict(lambda: [0, 0])
    for bk, sz in sizes.items():
        cens[sz][0] += 1
        cens[sz][1] += bk
    ref = {k: tuple(x) for k, x in cens.items()}
    got = {r["bucket_size"]: (r["n_buckets"], r["bucket_id_sum"]) for r in
           Q.REGISTRY["lsh_bucket_balance"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_quantize_error_matches_numpy(spark, emb):
    _ids, _labels, v, vq = emb
    q8 = np.clip(np.floor(v * 64.0 + 0.5).astype(np.int64), -128, 127)
    sse = ((vq - 16 * q8) ** 2).sum(axis=1)
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for x in sse.tolist():
        b = x.bit_length() - 1 if x > 0 else -1
        cens[b][0] += 1
        cens[b][1] += x
    ref = {k: tuple(t) for k, t in cens.items()}
    got = {r["err_band"]: (r["n_vecs"], r["sum_sse"]) for r in
           Q.REGISTRY["quantize_error"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_embedding_norm_bands_match_numpy(spark, emb):
    _ids, _labels, v, _vq = emb
    # the exact 2^-20 fixed-point self-dot, elementwise IEEE sequence
    nfp = np.floor(v * v * 1048576.0 + 0.5).astype(np.int64).sum(axis=1)
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for x in nfp.tolist():
        b = x.bit_length() - 1 if x > 0 else -1
        cens[b][0] += 1
        cens[b][1] += x
    ref = {k: tuple(t) for k, t in cens.items()}
    got = {r["norm_band"]: (r["n_vecs"], r["sum_norm_fp"]) for r in
           Q.REGISTRY["embedding_norm_bands"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_class_scatter_matches_numpy(spark, emb):
    _ids, labels, _v, vq = emb
    from collections import defaultdict
    cents = {}
    for lb in np.unique(labels):
        m = vq[labels == lb]
        cents[int(lb)] = np.floor(m.sum(axis=0) / len(m)).astype(np.int64)
    ref = {}
    for lb, cq in cents.items():
        m = vq[labels == lb]
        dd = ((m - cq) ** 2).sum(axis=1)
        ref[lb] = (len(m), int(dd.sum()), int(dd.sum()) * 1000 // len(m))
    got = {r["label"]: (r["n_vecs"], r["sum_dist"], r["mean_dist_x1000"])
           for r in Q.REGISTRY["class_scatter"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_knn_label_vote_matches_numpy(spark, emb):
    ids, labels, v, _vq = emb
    dfp = lambda a, b: np.floor(a * b * 1048576.0 + 0.5).astype(
        np.int64).sum(axis=-1)
    norms = np.sqrt(dfp(v, v).astype(np.float64))
    ref = {}
    for qid in range(10):
        qi = int(np.nonzero(ids == qid)[0][0])
        with np.errstate(all="ignore"):
            cos = dfp(v, v[qi]).astype(np.float64) / (norms * norms[qi])
        order = sorted((i for i in range(len(ids)) if i != qi),
                       key=lambda i: (-cos[i], ids[i]))[:5]
        from collections import Counter
        c = Counter(int(labels[i]) for i in order)
        voted = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
        ref[qid] = (int(labels[qi]), voted[0], voted[1])
    got = {r["query_id"]: (r["own_label"], r["voted_label"], r["n_votes"])
           for r in Q.REGISTRY["knn_label_vote"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_semdedup_matches_numpy(spark, emb):
    """Independent rebuild of the SemDeDup census: md5-order codebook,
    argmax assignment (tie -> smaller centroid id), within-list
    pairwise fixed-point cosine, min-id survivor drop rule — all in
    numpy/hashlib, no SQL formulation shared with the oracle."""
    ids, _labels, v, _vq = emb
    fp = 1 << 20

    def dotfp(a, b):
        return int(np.floor(a * b * fp + 0.5).astype(np.int64).sum())

    order = sorted(range(len(ids)),
                   key=lambda i: (hashlib.md5(str(ids[i]).encode())
                                  .hexdigest(), ids[i]))
    cents = [(int(ids[i]), v[i]) for i in order[:16]]

    def cosfp(a, b):
        return dotfp(a, b) / (np.sqrt(dotfp(a, a)) * np.sqrt(dotfp(b, b)))

    assign = {}
    for i in range(len(ids)):
        best = max(((cosfp(v[i], ce), -cid, cid) for cid, ce in cents))
        assign[int(ids[i])] = best[2]
    lists = {}
    for vid, lid in assign.items():
        lists.setdefault(lid, []).append(vid)
    ref = {}
    bywid = {int(ids[i]): v[i] for i in range(len(ids))}
    for lid, members in lists.items():
        members = sorted(members)
        dropped = 0
        for j, vb in enumerate(members):
            if any(cosfp(bywid[vb], bywid[va]) >= 0.35
                   for va in members[:j]):
                dropped += 1
        ref[lid] = (len(members), dropped, len(members) - dropped)
    got = {r["list_id"]: (r["n_vecs"], r["n_dropped"], r["n_kept"]) for r in
           Q.REGISTRY["semdedup"][0](spark, SF_DIR).collect()}
    assert got == ref


def test_dim_trunc_recall_matches_numpy(spark, emb):
    """Independent rebuild of the Matryoshka truncation audit: exact
    fixed-point-cosine top-10 under all 64 dims and under the first 16,
    per-query overlap + id sums, pure numpy ranking."""
    ids, _labels, v, _vq = emb

    def dfp(a, b):
        return np.floor(a * b * 1048576.0 + 0.5).astype(
            np.int64).sum(axis=-1)

    def topk(mat, qi, k=10):
        norms = np.sqrt(dfp(mat, mat).astype(np.float64))
        with np.errstate(all="ignore"):
            cos = dfp(mat, mat[qi]).astype(np.float64) / (norms * norms[qi])
        return sorted((i for i in range(len(ids)) if i != qi),
                      key=lambda i: (-cos[i], ids[i]))[:k]

    ref = {}
    for qid in range(5):
        qi = int(np.nonzero(ids == qid)[0][0])
        f = topk(v, qi)
        t = topk(v[:, :16], qi)
        ref[qid] = (len(set(f) & set(t)), 10,
                    int(sum(ids[i] for i in f)),
                    int(sum(ids[i] for i in t)))
    got = {r["query_id"]: (r["n_hits"], r["k"], r["full_id_sum"],
                           r["trunc_id_sum"])
           for r in Q.REGISTRY["dim_trunc_recall"][0](
               spark, SF_DIR).collect()}
    assert got == ref


def test_bq_recall_audit_matches_numpy(spark, emb):
    """Independent rebuild of the binary-quantization audit: sign-bit
    Hamming ranking (vec_id tie-break) vs fixed-point-cosine top-10,
    pure numpy."""
    ids, _labels, v, _vq = emb

    def dfp(a, b):
        return np.floor(a * b * 1048576.0 + 0.5).astype(
            np.int64).sum(axis=-1)

    norms = np.sqrt(dfp(v, v).astype(np.float64))
    bits = (v >= 0).astype(np.int64)
    ref = {}
    for qid in range(5):
        qi = int(np.nonzero(ids == qid)[0][0])
        with np.errstate(all="ignore"):
            cos = dfp(v, v[qi]).astype(np.float64) / (norms * norms[qi])
        ham = (bits != bits[qi]).sum(axis=1)
        others = [i for i in range(len(ids)) if i != qi]
        b = sorted(others, key=lambda i: (-cos[i], ids[i]))[:10]
        h = sorted(others, key=lambda i: (ham[i], ids[i]))[:10]
        ref[qid] = (len(set(b) & set(h)), 10,
                    int(sum(ids[i] for i in b)),
                    int(sum(ids[i] for i in h)))
    got = {r["query_id"]: (r["n_hits"], r["k"], r["brute_id_sum"],
                           r["bq_id_sum"])
           for r in Q.REGISTRY["bq_recall_audit"][0](
               spark, SF_DIR).collect()}
    assert got == ref
