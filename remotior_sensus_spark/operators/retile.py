"""Tile-size transformation: merge ``factor x factor`` blocks of T-px
tiles into single (T*factor)-px tiles.

At 100 TB the per-row key/metadata overhead of small tiles rivals the
pixel payload (VERDICT r01 perf audit) — focal/CC kernels want 256^2+
tiles while ingest may produce smaller ones. ``retile`` is the bridge:
one groupBy on the coarse tile key (the same shuffle any neighbor op
would pay), assembly in an Arrow batch, and every downstream kernel
takes ``tile_px`` so results are provably tile-size-invariant
(tests/test_focal_components.py::test_tile_size_invariance).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from remotior_sensus_spark import NODATA
from remotior_sensus_spark.grid import TILE_PX


def retile(band_tiles: DataFrame, factor: int,
           tile_px: int | None = None, nodata: float = NODATA) -> DataFrame:
    """Coarsen the tile grid by ``factor`` in each axis. Missing source
    tiles fill with nodata. Output: (tile_x, tile_y, pixels) with
    (tile_px*factor)^2 pixel arrays, row-major."""
    t = tile_px or TILE_PX
    big = t * factor

    src = band_tiles.select(
        (F.col("tile_x") % factor).alias("sub_x"),
        (F.col("tile_y") % factor).alias("sub_y"),
        F.floor(F.col("tile_x") / factor).cast("int").alias("ntx"),
        F.floor(F.col("tile_y") / factor).cast("int").alias("nty"),
        "pixels",
    )

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        a = np.full((big, big), float(nodata))
        for _, r in pdf.iterrows():  # <= factor^2 rows per group
            block = np.asarray(r["pixels"], dtype=np.float64).reshape(t, t)
            a[r["sub_y"] * t:(r["sub_y"] + 1) * t,
              r["sub_x"] * t:(r["sub_x"] + 1) * t] = block
        return pd.DataFrame({
            "tile_x": [int(pdf["ntx"].iloc[0])],
            "tile_y": [int(pdf["nty"].iloc[0])],
            "pixels": [a.ravel().tolist()],
        })

    # Pin the grouping exchange's partition count (r06, guide §2.2):
    # AQE coalesces shuffles by COMPRESSED bytes, and zstd squeezes
    # synthetic tile arrays so hard that this corpus-wide exchange
    # lands under the 1 MB minPartitionSize — the retile kernel and
    # every CPU-heavy Python stage downstream (label_tiles, CC,
    # polygonize tracing) then ran on 1-2 partitions (measured:
    # label_tiles 12.2 s -> 2.1 s at sf0.1 once spread). An explicit
    # repartition(n, keys) is respected by AQE and satisfies the
    # groupBy's distribution, so NO extra exchange is added; n comes
    # from spark.sql.shuffle.partitions (the scale-adaptive conf), not
    # a local constant.
    n_part = int(band_tiles.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"))
    return src.repartition(n_part, "ntx", "nty").groupBy(
        "ntx", "nty").applyInPandas(
        assemble, schema="tile_x int, tile_y int, pixels array<double>"
    )
