"""Z-order clustering: the Column bit-spread equals a straightforward
per-bit Python Morton encode, and sorting a file by the key yields
parquet row groups whose (x, y) min/max bounding boxes are tight —
the stats a spatial range scan skips on."""

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from remotior_sensus_spark.functions.zorder import morton_key, spread_bits2


def _morton_py(x: int, y: int) -> int:
    out = 0
    for i in range(21):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_per_bit_reference(spark):
    rng = np.random.RandomState(7)
    xs = np.concatenate([rng.randint(0, 1 << 21, 200),
                         [0, 1, (1 << 21) - 1]]).astype("int64")
    ys = np.concatenate([rng.randint(0, 1 << 21, 200),
                         [(1 << 21) - 1, 0, 1]]).astype("int64")
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long")
    got = (df.select("x", "y", morton_key(F.col("x"), F.col("y"))
                     .alias("z")).toPandas())
    for _, r in got.iterrows():
        assert int(r["z"]) == _morton_py(int(r["x"]), int(r["y"])), \
            (r["x"], r["y"])


def test_spread_bits_is_monotone_on_each_axis(spark):
    # z-order preserves per-axis order when the other axis is fixed
    df = spark.range(0, 4096).select(
        spread_bits2(F.col("id")).alias("s"), "id").toPandas()
    s = df.sort_values("id")["s"].to_numpy()
    assert (np.diff(s) > 0).all()


def test_zsorted_file_prunes_on_both_axes(spark, tmp_path):
    """Write the same 256x256 grid twice — row-major vs z-sorted, same
    row-group size — and count row groups whose (x, y) min/max stats
    overlap an x-band query box (x in [0,16), all y). Row-major groups
    are full-width strips: x stats are [0,255] everywhere, so NOTHING
    prunes and every group is read. Z-sorted groups are near-square
    curve windows, so only the boxes touching the band survive — the
    two-axis prunability that makes ZORDER the spatial layout."""
    n = 256
    grid = spark.range(n * n).select(
        (F.col("id") % n).cast("long").alias("x"),
        (F.col("id") / n).cast("long").alias("y"))

    def rowgroup_bboxes(path):
        meta = pq.ParquetFile(path).metadata
        cols = {meta.row_group(0).column(i).path_in_schema: i
                for i in range(meta.num_columns)}
        out = []
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            sx = rg.column(cols["x"]).statistics
            sy = rg.column(cols["y"]).statistics
            out.append((sx.min, sx.max, sy.min, sy.max))
        return out

    import glob

    def write_one(df, name):
        d = str(tmp_path / name)
        (df.coalesce(1).write.mode("overwrite")
         .option("parquet.block.size", 64 * 1024).parquet(d))
        return glob.glob(d + "/part-*.parquet")[0]

    row_major = write_one(grid.orderBy("y", "x"), "row_major")
    zsorted = write_one(
        grid.orderBy(morton_key(F.col("x"), F.col("y"))), "zsorted")

    def overlapping(bboxes, x0, x1, y0, y1):
        return sum(1 for (xa, xb, ya, yb) in bboxes
                   if xb >= x0 and xa <= x1 and yb >= y0 and ya <= y1)

    rb, zb = rowgroup_bboxes(row_major), rowgroup_bboxes(zsorted)
    assert len(zb) > 4  # the block-size knob actually split groups
    # x-band query: strips cannot prune at all, z-order reads a sliver
    r_hit = overlapping(rb, 0, 15, 0, n - 1)
    z_hit = overlapping(zb, 0, 15, 0, n - 1)
    assert r_hit >= len(rb) - 1  # the final remainder strip may be partial
    assert z_hit <= len(zb) / 2
    assert z_hit / len(zb) < (r_hit / len(rb)) / 3
    # and the curve walk stays monotone in the key (sorted file)
    zk = pq.read_table(zsorted).to_pandas()
    keys = [_morton_py(int(x), int(y))
            for x, y in zip(zk["x"].head(5000), zk["y"].head(5000))]
    assert (np.diff(keys) > 0).all()
