"""Table loaders + view registry.

Two table families:
  * driver tables  — ``/root/testdata/sf{X}/*.parquet`` (TPC-H-ish star
    schema + documents/embeddings/events) used by the training-data
    pipeline operators and the DuckDB correctness harness.
  * geo tables     — the engine's own deterministic interleaved-document
    / tile / geometry layer under ``/root/repo/data/geo/sf{X}/``
    (regenerated on demand; see synth/generate.py).

Replaces the reference's BandSetCatalog registry
(core/bandset_catalog.py:1593) with Spark temp views + a bands
dimension table.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from remotior_sensus_spark.synth.generate import ensure_geo

DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
GEO_TABLES = [
    "tiles", "geometries", "geometry_rects", "documents", "doc_spans",
    "signatures", "signatures_long", "reclass_rules",
]


def sf_of_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    if not m:
        # silently defaulting to 0.01 made a typo'd/custom path read the
        # canonical dataset with no error — fail loudly instead
        raise ValueError(f"cannot infer scale factor from path {sf_dir!r}")
    return float(m.group(1))


def load_driver(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_geo(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    d = ensure_geo(sf_of_dir(sf_dir))
    return spark.read.parquet(f"{d}/{name}.parquet")


def geo_path(sf: float, name: str) -> str:
    return f"{ensure_geo(sf)}/{name}.parquet"


def register_all(spark: SparkSession, sf_dir: str) -> None:
    for t in DRIVER_TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
    d = ensure_geo(sf_of_dir(sf_dir))
    for t in GEO_TABLES:
        p = f"{d}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(f"geo_{t}")
