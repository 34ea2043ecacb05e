"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial-join + tile-assignment query
over the interleaved documents table at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: explode interleaved docs -> media spans salted-join to
    tiles + geom spans -> ROI cover cells -> per-doc assignment summary
    with span-sequence fingerprint (the input_hint invariant)."""
    from remotior_sensus_spark.operators import spatial_join as sj
    from remotior_sensus_spark.sources import catalog as cat

    sf_dir = "/root/testdata/sf0.001"
    docs = cat.load_geo(spark, sf_dir, "documents")
    tiles = cat.load_geo(spark, sf_dir, "tiles")
    geoms = cat.load_geo(spark, sf_dir, "geometries")
    rects = cat.load_geo(spark, sf_dir, "geometry_rects")

    media = sj.media_span_tiles(docs, tiles, hot_threshold=1000).groupBy("doc_id").agg(
        F.count("*").alias("n_tiles_matched"),
        F.countDistinct("cell_key").alias("n_cells"),
    )
    cover = sj.geometry_cell_cover(rects, extra_cols=())
    geom = (
        sj.geom_span_rois(docs, geoms.select("roi_id", "class"))
        .join(cover, "roi_id")
        .groupBy("doc_id")
        .agg(F.countDistinct("cell_key").alias("n_geom_cells"))
    )
    spans = sj.span_seq_hash(docs)
    out = (
        spans.join(media, "doc_id", "left")
        .join(geom, "doc_id", "left")
        .na.fill(0, ["n_tiles_matched", "n_cells", "n_geom_cells"])
    )
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from remotior_sensus_spark import queries as qmod

    return qmod.queries()


def oracle_sql() -> dict[str, str]:
    from remotior_sensus_spark import queries as qmod

    return qmod.oracle_sql()
