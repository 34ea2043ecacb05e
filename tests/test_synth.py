import hashlib
import os
import tempfile

from remotior_sensus_spark.synth.generate import generate, splitmix64


def test_splitmix_deterministic():
    import numpy as np

    a = splitmix64(np.arange(100))
    b = splitmix64(np.arange(100))
    assert (a == b).all()
    assert len(np.unique(a)) == 100


def test_generation_byte_identical(geo001_dir):
    with tempfile.TemporaryDirectory() as d:
        generate(0.001, d)
        for f in os.listdir(d):
            h1 = hashlib.sha256(open(f"{d}/{f}", "rb").read()).hexdigest()
            h2 = hashlib.sha256(open(f"{geo001_dir}/{f}", "rb").read()).hexdigest()
            assert h1 == h2, f


def test_offsets_strictly_increasing(spark, geo001_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{geo001_dir}/documents.parquet")
    bad = docs.select(
        F.size(
            F.filter(
                F.zip_with(
                    F.col("spans"),
                    F.slice(F.col("spans"), 2, 100000),
                    lambda a, b: b.getField("offset") <= a.getField("offset"),
                ),
                lambda x: x,
            )
        ).alias("n")
    ).filter(F.col("n") > 0)
    assert bad.count() == 0


def _build_documents_loop(sf, geo_tbl):
    """The original per-doc loop implementation, kept verbatim as the
    semantic reference for the vectorized build_documents."""
    import numpy as np
    import pyarrow as pa

    from remotior_sensus_spark.synth.generate import (
        BANDS, BANDSETS, _LOREM, _h, grid_n, n_docs)

    nd = n_docs(sf)
    n = grid_n(sf)
    nr = geo_tbl.num_rows
    wkts = geo_tbl.column("wkt").to_pylist()

    doc_ids, spans_col = [], []
    ex = {k: [] for k in ("doc_id", "span_idx", "kind", "text",
                          "media_ref", "offset")}
    V = len(_LOREM)
    for i in range(nd):
        hv = int(_h(i, 555))
        nspan = 2 + hv % 7
        spans = []
        offset = 0
        for s in range(nspan):
            sh = int(_h(i, s, 999331))
            r = 0 if s == 0 else sh % 100
            if r < 50:
                ntok = 5 + (sh >> 8) % 8
                toks = [_LOREM[int(_h(i, s, t, 77)) % V] for t in range(ntok)]
                text, media_ref, kind = " ".join(toks), "", "text"
            elif r < 85:
                kind = "media"
                if (sh >> 16) % 100 < 20:
                    tx, ty = (sh >> 24) % 2, (sh >> 26) % 2
                    bs, band = BANDSETS[0], "B04"
                else:
                    bs = BANDSETS[(sh >> 16) % 2]
                    band = BANDS[(sh >> 20) % 4]
                    tx, ty = (sh >> 24) % n, (sh >> 40) % n
                media_ref = f"tile/{bs}/{band}/{tx}/{ty}"
                text = ""
            else:
                kind = "geom"
                j = (sh >> 16) % nr
                media_ref = f"roi/roi_{j}"
                text = wkts[j]
            spans.append({"kind": kind, "text": text,
                          "media_ref": media_ref, "offset": offset})
            ex["doc_id"].append(f"doc_{i:012d}")
            ex["span_idx"].append(s)
            ex["kind"].append(kind)
            ex["text"].append(text)
            ex["media_ref"].append(media_ref)
            ex["offset"].append(offset)
            offset += len(text) + 1
        doc_ids.append(f"doc_{i:012d}")
        spans_col.append(spans)

    span_type = pa.struct([
        ("kind", pa.string()), ("text", pa.string()),
        ("media_ref", pa.string()), ("offset", pa.int32()),
    ])
    docs_tbl = pa.table({
        "doc_id": pa.array(doc_ids),
        "spans": pa.array(spans_col, type=pa.list_(span_type)),
    })
    spans_tbl = pa.table({
        "doc_id": pa.array(ex["doc_id"]),
        "span_idx": pa.array(ex["span_idx"], type=pa.int32()),
        "kind": pa.array(ex["kind"]),
        "text": pa.array(ex["text"]),
        "media_ref": pa.array(ex["media_ref"]),
        "offset": pa.array(ex["offset"], type=pa.int32()),
    })
    return docs_tbl, spans_tbl


def test_build_documents_vectorization():
    """The vectorized build_documents is value-identical to the
    original loop at two scales (different grid_n / n_rois moduli)."""
    from remotior_sensus_spark.synth.generate import (
        build_documents, build_geometries)

    for sf in (0.001, 0.003):
        geo_tbl, _ = build_geometries(sf)
        vec_docs, vec_spans = build_documents(sf, geo_tbl)
        ref_docs, ref_spans = _build_documents_loop(sf, geo_tbl)
        assert vec_spans.equals(ref_spans), f"spans_tbl diverged at sf={sf}"
        # compare docs rows (schema-insensitive: list offsets int32 vs
        # int64 don't matter, values do)
        assert vec_docs.column("doc_id").equals(ref_docs.column("doc_id"))
        assert vec_docs.column("spans").to_pylist() == \
            ref_docs.column("spans").to_pylist(), f"spans diverged at sf={sf}"
