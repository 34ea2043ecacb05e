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
