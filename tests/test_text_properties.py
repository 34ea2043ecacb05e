"""Pure-Python reference tests for the round-4 text operators over
small synthetic corpora with known structure (exact duplicates,
truncation families, shared grams, template spam). The DuckDB oracles
share the repo's relational formulation; these references are written
independently from the definition in each docstring."""

import math

import pytest
from pyspark.sql import Row

from remotior_sensus_spark.operators import textops as tx


DOCS = [
    # (doc_id, text, lang, source)
    (0, "the cat sat on the mat and then the cat sat again today", "en", "s0"),
    (1, "the cat sat on the mat and then the cat sat again today", "en", "s0"),
    (2, "the cat sat on the mat and then the dog ran away home", "en", "s1"),
    (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s1"),
    (4, "SPAM SPAM SPAM buy NOW 100 percent FREE offer 42 clicks", "en", "s2"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s2"),
    (6, "one two three four five six seven eight nine ten eleven twelve", "en", "s2"),
]

# a genuine truncation family: two docs sharing the first 200+ chars,
# diverging after (the (group_size, n_variants>1) branch of prefix_dup)
_LONG = " ".join(f"token{i:03d}" for i in range(30))  # 269 chars
DOCS += [
    (7, _LONG + " ending alpha omega", "en", "s1"),
    (8, _LONG + " different closing words", "en", "s2"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [Row(doc_id=i, text=t, lang=lg, source=s,
                n_chars=len(t)) for i, t, lg, s in DOCS]
    return spark.createDataFrame(rows)


def _toks(t):
    return [w for w in t.strip().split() if w]


def _grams(t, n=8):
    toks = _toks(t)
    if len(toks) <= n:
        return [" ".join(toks[:n])]
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_yule_k_matches_reference(spark, docs_df):
    by_src = {}
    for _i, t, _lg, s in DOCS:
        by_src.setdefault(s, []).extend(_toks(t))
    ref = {}
    for s, toks in by_src.items():
        from collections import Counter
        c = Counter(toks)
        s1, s2 = sum(c.values()), sum(v * v for v in c.values())
        kfp = math.floor((s2 - s1) / (float(s1) * float(s1))
                         * 10000.0 * 1000000.0 + 0.5)
        ref[s] = (s1, s2, kfp)
    got = {r["source"]: (r["n_tokens"], r["sum_cnt_sq"], r["yule_k_fp"])
           for r in tx.yule_k(docs_df).collect()}
    assert got == ref


def test_hapax_rate_matches_reference(spark, docs_df):
    from collections import Counter
    ref = {}
    for s in {d[3] for d in DOCS}:
        c = Counter(w for _i, t, _lg, src in DOCS if src == s
                    for w in _toks(t))
        hap = sum(1 for v in c.values() if v == 1)
        ref[s] = (sum(c.values()), len(c), hap, hap * 1000000 // len(c))
    got = {r["source"]: (r["n_tokens"], r["n_terms"], r["n_hapax"],
                         r["hapax_fp"])
           for r in tx.hapax_rate(docs_df).collect()}
    assert got == ref


def test_case_profile_matches_reference(spark, docs_df):
    ref = {}
    for s in {d[3] for d in DOCS}:
        toks = [w for _i, t, _lg, src in DOCS if src == s
                for w in _toks(t)]
        cap = sum(1 for w in toks if "A" <= w[0] <= "Z")
        allc = sum(1 for w in toks
                   if len(w) > 1 and all("A" <= ch <= "Z" for ch in w))
        num = sum(1 for w in toks if all("0" <= ch <= "9" for ch in w))
        ref[s] = (len(toks), cap, allc, num, cap * 1000000 // len(toks))
    got = {r["source"]: (r["n_tokens"], r["n_capitalized"], r["n_allcaps"],
                         r["n_numeric"], r["caps_fp"])
           for r in tx.case_profile(docs_df).collect()}
    assert got == ref


def test_prefix_dup_matches_reference(spark, docs_df):
    from collections import defaultdict
    groups = defaultdict(list)
    for i, t, _lg, _s in DOCS:
        groups[t[:200]].append((i, t))
    cens = defaultdict(lambda: [0, 0])
    for _p, members in groups.items():
        k = len(members)
        v = len({t for _i, t in members})
        cens[(k, v)][0] += 1
        cens[(k, v)][1] += min(i for i, _t in members)
    ref = {kv: tuple(x) for kv, x in cens.items()}
    got = {(r["group_size"], r["n_variants"]): (r["n_groups"],
                                                r["min_doc_sum"])
           for r in tx.prefix_dup(docs_df).collect()}
    assert got == ref


def test_doc_dup_profile_matches_reference(spark, docs_df):
    from collections import defaultdict
    where = defaultdict(set)
    for i, t, _lg, _s in DOCS:
        for g in _grams(t):
            where[g].add(i)
    cens = defaultdict(lambda: [0, 0, 0])
    for i, t, _lg, _s in DOCS:
        gs = _grams(t)
        dup = sum(1 for g in gs if len(where[g]) > 1)
        dec = min((dup * 10) // len(gs), 9)
        cens[dec][0] += 1
        cens[dec][1] += dup
        cens[dec][2] += len(gs)
    ref = {d: tuple(x) for d, x in cens.items()}
    got = {r["dup_decile"]: (r["n_docs"], r["sum_dup"], r["sum_grams"])
           for r in tx.doc_dup_profile(docs_df).collect()}
    assert got == ref


def test_cross_source_contamination_matches_reference(spark, docs_df):
    from collections import defaultdict
    per_src = defaultdict(set)
    for _i, t, _lg, s in DOCS:
        per_src[s].update(_grams(t))
    srcs = sorted(per_src)
    ref = {}
    for ia, a in enumerate(srcs):
        for b in srcs[ia + 1:]:
            shared = len(per_src[a] & per_src[b])
            if shared:
                ref[(a, b)] = (shared,
                               shared * 1000000 // len(per_src[a]),
                               shared * 1000000 // len(per_src[b]))
    got = {(r["source_a"], r["source_b"]): (r["n_shared"], r["share_a_fp"],
                                            r["share_b_fp"])
           for r in tx.cross_source_contamination(docs_df).collect()}
    assert got == ref


def test_bigram_entropy_rate_matches_reference(spark, docs_df):
    from collections import Counter, defaultdict
    c2 = defaultdict(Counter)
    for _i, t, _lg, s in DOCS:
        toks = _toks(t)
        for a, b in zip(toks, toks[1:]):
            c2[s][(a, b)] += 1
    ref = {}
    for s, c in c2.items():
        n = sum(c.values())
        c1 = Counter()
        for (a, _b), v in c.items():
            c1[a] += v
        acc = 0
        for (a, _b), v in c.items():
            acc += math.floor(v / n * math.log(v / c1[a]) * 1e6 + 0.5)
        ref[s] = (n, len(c), -acc)
    got = {r["source"]: (r["n_bigrams"], r["n_pairs"], r["cond_entropy_fp"])
           for r in tx.bigram_entropy_rate(docs_df).collect()}
    assert got == ref


def _hex60(s: str) -> int:
    import hashlib
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_vocab_zipf_matches_reference(spark, docs_df):
    from collections import Counter, defaultdict
    c = Counter(w for _i, t, _lg, _s in DOCS for w in _toks(t))
    cens = defaultdict(lambda: [0, 0, 0])
    for term, n in c.items():
        b = n.bit_length() - 1
        cens[b][0] += 1
        cens[b][1] += n
        cens[b][2] += _hex60(term) % 1000003
    ref = {k: tuple(v) for k, v in cens.items()}
    got = {r["freq_band"]: (r["n_terms"], r["sum_count"],
                            r["term_hash_checksum"]) for r in
           tx.vocab_zipf(docs_df).collect()}
    assert got == ref


def test_dup_rate_by_source_matches_reference(spark, docs_df):
    import re as _re
    from collections import defaultdict
    norm = {i: _re.sub(r"\s+", " ", t.strip()).lower()
            for i, t, _lg, _s in DOCS}
    keep_of = {}
    for i, t, _lg, _s in DOCS:
        h = norm[i]
        keep_of[h] = min(keep_of.get(h, i), i)
    cens = defaultdict(lambda: [0, 0])
    for i, t, _lg, s in DOCS:
        cens[s][0] += 1
        cens[s][1] += keep_of[norm[i]] == i
    ref = {s: (n, k, n - k, (n - k) * 1000000 // n)
           for s, (n, k) in cens.items()}
    got = {r["source"]: (r["n_docs"], r["n_kept"], r["n_removed"],
                         r["dup_rate_fp"]) for r in
           tx.dup_rate_by_source(docs_df).collect()}
    assert got == ref


def test_sequence_packing_matches_reference(spark, docs_df):
    from collections import defaultdict
    L = 256
    by_src = defaultdict(list)
    for i, t, _lg, s in DOCS:
        by_src[s].append((i, len(_toks(t))))
    ref = {}
    for s, docs in by_src.items():
        docs.sort()
        cum = 0
        crossing = 0
        for _i, n in docs:
            start, end = cum, cum + n
            if n > 0 and start // L != (end - 1) // L:
                crossing += 1
            cum = end
        ref[s] = (len(docs), cum, -(-cum // L), crossing)
    got = {r["source"]: (r["n_docs"], r["total_tokens"], r["n_sequences"],
                         r["n_crossing"]) for r in
           tx.sequence_packing(docs_df).collect()}
    assert got == ref


def test_doc_length_bands_matches_reference(spark, docs_df):
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for _i, t, _lg, s in DOCS:
        n = len(t)
        b = n.bit_length() - 1 if n > 0 else -1
        cens[(s, b)][0] += 1
        cens[(s, b)][1] += n
    ref = {k: tuple(v) for k, v in cens.items()}
    got = {(r["source"], r["len_band"]): (r["n_docs"], r["sum_chars"])
           for r in tx.doc_length_bands(docs_df).collect()}
    assert got == ref


def test_ttr_profile_matches_reference(spark, docs_df):
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0])
    for _i, t, lg, _s in DOCS:
        toks = _toks(t)
        if not toks:
            continue
        dec = (len(set(toks)) * 10) // len(toks)
        cens[(lg, dec)][0] += 1
        cens[(lg, dec)][1] += len(toks)
    ref = {k: tuple(v) for k, v in cens.items()}
    got = {(r["lang"], r["ttr_decile"]): (r["n_docs"], r["sum_tokens"])
           for r in tx.ttr_profile(docs_df).collect()}
    assert got == ref


def test_token_entropy_matches_reference(spark, docs_df):
    from collections import Counter
    ref = {}
    for s in {d[3] for d in DOCS}:
        c = Counter(w for _i, t, _lg, src in DOCS if src == s
                    for w in _toks(t))
        n = sum(c.values())
        acc = sum(math.floor(v / n * math.log(v / n) * 1e6 + 0.5)
                  for v in c.values())
        ref[s] = (n, len(c), -acc)
    got = {r["source"]: (r["n_tokens"], r["n_terms"], r["entropy_fp"])
           for r in tx.token_entropy(docs_df).collect()}
    assert got == ref


def test_ngram_novelty_matches_reference(spark, docs_df):
    from collections import defaultdict
    inst = defaultdict(int)
    touched = defaultdict(set)
    owner = {}
    for i, t, _lg, s in sorted(DOCS):
        for g in _grams(t):
            inst[s] += 1
            touched[g].add(s)
            owner.setdefault(g, (i, s))
    owned = defaultdict(int)
    for g, (_i, s) in owner.items():
        owned[s] += 1
    dist = defaultdict(int)
    for g, srcs in touched.items():
        for s in srcs:
            dist[s] += 1
    ref = {s: (inst[s], dist[s], owned[s],
               owned[s] * 1000000 // dist[s]) for s in inst}
    got = {r["source"]: (r["n_instances"], r["n_distinct"], r["n_owned"],
                         r["novelty_fp"])
           for r in tx.ngram_novelty(docs_df).collect()}
    assert got == ref


def test_dup_ngram_coverage_matches_reference(spark, docs_df):
    from collections import defaultdict
    where = defaultdict(set)
    for i, t, _lg, _s in DOCS:
        for g in _grams(t):
            where[g].add(i)
    cov = defaultdict(int)
    tot = defaultdict(lambda: [0, 0])
    for i, t, _lg, s in DOCS:
        toks = _toks(t)
        gs = _grams(t)
        tot[s][0] += 1
        tot[s][1] += len(toks)
        covered = set()
        for k, g in enumerate(gs):
            if len(where[g]) > 1:
                covered.update(range(k, min(k + 8, len(toks))))
        cov[s] += len(covered)
    ref = {s: (n, ntok, cov[s], cov[s] * 1000000 // ntok)
           for s, (n, ntok) in tot.items()}
    got = {r["source"]: (r["n_docs"], r["total_tokens"],
                         r["covered_tokens"], r["coverage_fp"])
           for r in tx.dup_ngram_coverage(docs_df).collect()}
    assert got == ref


def test_stopword_profile_matches_reference(spark, docs_df):
    from collections import Counter, defaultdict
    c = Counter(w for _i, t, _lg, _s in DOCS for w in _toks(t))
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    stop = {w for w, _n in top}
    cens = defaultdict(lambda: [0, 0])
    for _i, t, lg, _s in DOCS:
        toks = _toks(t)
        if not toks:
            continue
        hits = sum(1 for w in toks if w in stop)
        dec = (hits * 10) // len(toks)
        cens[(lg, dec)][0] += 1
        cens[(lg, dec)][1] += hits
    ref = {k: tuple(v) for k, v in cens.items()}
    got = {(r["lang"], r["stop_decile"]): (r["n_docs"], r["sum_hits"])
           for r in tx.corpus_stopword_profile(docs_df).collect()}
    assert got == ref


def test_bigram_lm_proxy_matches_reference(spark, docs_df):
    from collections import Counter, defaultdict
    c2 = Counter()
    for _i, t, _lg, _s in DOCS:
        toks = _toks(t)
        c2.update(zip(toks, toks[1:]))
    c1 = Counter()
    for (a, _b), v in c2.items():
        c1[a] += v
    agg = defaultdict(lambda: [set(), 0, 0])
    for i, t, lg, _s in DOCS:
        toks = _toks(t)
        for bg in zip(toks, toks[1:]):
            agg[lg][0].add(i)
            agg[lg][1] += 1
            agg[lg][2] += c2[bg] * 1000000 // c1[bg[0]]
    ref = {lg: (len(d), n, s) for lg, (d, n, s) in agg.items()}
    got = {r["lang"]: (r["n_docs"], r["n_bigrams"], r["sum_score_fp"])
           for r in tx.bigram_lm_proxy(docs_df).collect()}
    assert got == ref


def test_mixture_sample_matches_reference(spark, docs_df):
    import hashlib
    from collections import defaultdict
    cens = defaultdict(lambda: [0, 0, 0])
    for i, _t, _lg, s in DOCS:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        srcnum = int("".join(ch for ch in s if ch.isdigit()) or 0)
        keep = h % 1000 < 900 - 80 * (srcnum % 10)
        cens[s][0] += 1
        cens[s][1] += keep
        cens[s][2] += i if keep else 0
    ref = {s: tuple(v) for s, v in cens.items()}
    got = {r["source"]: (r["n_docs"], r["n_kept"], r["kept_id_sum"])
           for r in tx.mixture_sample(docs_df).collect()}
    assert got == ref


def test_incremental_dedup_hand_corpus(spark):
    """Engineered base/incoming split: an exact copy, a near copy
    (shared prefix, half the shingles), an exact copy that is ALSO a
    near copy (must count as exact only), and a novel doc."""
    base_text = ("the quick brown fox jumps over the lazy dog and then "
                 "runs far away into the deep green forest tonight")
    near_text = ("the quick brown fox jumps over the lazy dog and then "
                 "walks home slowly whistling an old tune")
    novel = "completely different content about spark shuffles and joins"
    rows = [
        Row(doc_id="b1", source="src0", text=base_text),
        Row(doc_id="b2", source="src1", text=novel.upper()),
        Row(doc_id="i1", source="src7", text=base_text),        # exact
        Row(doc_id="i2", source="src7", text="  " + base_text + " "),
        # ^ exact after trim/whitespace normalization
        Row(doc_id="i3", source="src7", text=near_text),        # near
        Row(doc_id="i4", source="src8",
            text="entirely novel words nothing shared with any base"),
    ]
    out = {r["source"]: (r["n_docs"], r["n_exact"], r["n_near"],
                         r["n_novel"])
           for r in tx.incremental_dedup(
               spark.createDataFrame(rows),
               jaccard_threshold=0.4).collect()}
    assert out["src7"] == (3, 2, 1, 0)
    assert out["src8"] == (1, 0, 0, 1)
    # base sources never appear in the incoming census
    assert "src0" not in out and "src1" not in out


def test_vocab_growth_matches_reference(spark, docs_df):
    """Heaps census vs a sequential pure-Python scan: slice docs by
    exact integer id-range arithmetic, track first-seen terms and the
    running vocabulary."""
    mn = min(i for i, *_ in DOCS)
    span = max(i for i, *_ in DOCS) - mn + 1
    seen = set()
    ref = {s: [0, 0, 0] for s in range(10)}   # n_docs, n_tokens, new
    for i, t, _lg, _s in sorted(DOCS):
        sl = (i - mn) * 10 // span
        toks = t.split()
        ref[sl][0] += 1
        ref[sl][1] += len(toks)
        for tk in toks:
            if tk not in seen:
                seen.add(tk)
                ref[sl][2] += 1
    run, want = 0, {}
    for s in range(10):
        run += ref[s][2]
        want[s] = (ref[s][0], ref[s][1], ref[s][2], run)
    got = {r["slice"]: (r["n_docs"], r["n_tokens"], r["new_terms"],
                        r["vocab_size"]) for r in
           tx.vocab_growth(docs_df).collect()}
    assert got == want
    # growth actually decelerates on the repeated-vocab corpus: the
    # last populated slice contributes fewer new terms than the first
    pop = [s for s in want if want[s][0] > 0]
    assert want[pop[-1]][2] < want[pop[0]][2]
