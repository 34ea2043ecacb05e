"""Interleaved A/B timing of legacy vs r06-continuation operator paths
in ONE Spark session (bench.py stays frozen; measurement only).

Usage: python bench_ab.py [runs]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from remotior_sensus_spark.session import get_spark
    from remotior_sensus_spark.synth.generate import ensure_geo
    from remotior_sensus_spark.sources.catalog import sf_of_dir
    from remotior_sensus_spark import queries as qmod
    from remotior_sensus_spark.operators import hydrology as hy
    from remotior_sensus_spark.operators.focal import (
        dilation, erosion, neighbor_stats)
    from remotior_sensus_spark.operators.terrain import horn_terrain
    from remotior_sensus_spark.operators.band_calc import band_calc

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]")
    ensure_geo(sf_of_dir(SF_DIR))
    qmod._ensure_expected(SF_DIR)

    def t64():
        return qmod._retile4(qmod._b01(spark, SF_DIR, "B04"), SF_DIR)[0]

    def fan(h=1, df=None):
        return qmod._fan64(spark, SF_DIR, "B04", halo_tiles=h, df=df)[0]

    def q4():
        return band_calc(qmod._tiles(spark, SF_DIR),
                         'where("B04" > 3500, 7, 1)', nodata_mask="any")

    pairs = {
        "cost_distance": (
            lambda: hy.cost_distance_tiles(t64(), tile_px=64,
                                           use_check=False),
            lambda: hy.cost_distance_tiles(None, tile_px=64,
                                           init_fan=fan(4))),
        "cost_allocation": (
            lambda: hy.cost_allocation_tiles(t64(), tile_px=64,
                                             use_check=False),
            lambda: hy.cost_allocation_tiles(None, tile_px=64,
                                             init_fan=fan(4))),
        "corridor_census": (
            lambda: hy.corridor_tiles(t64(), tile_px=64, use_check=False),
            lambda: hy.corridor_tiles(None, tile_px=64,
                                      init_fan=fan(4).localCheckpoint())),
        "focal_mean": (
            lambda: neighbor_stats(t64(), stat="mean", size=1, tile_px=64),
            lambda: neighbor_stats(None, stat="mean", size=1, tile_px=64,
                                   fan=fan())),
        "terrain_horn": (
            lambda: horn_terrain(t64(), cellsize=10.0, tile_px=64),
            lambda: horn_terrain(None, cellsize=10.0, tile_px=64,
                                 fan=fan())),
        "dilation": (
            lambda: dilation(qmod._retile4(q4(), SF_DIR)[0],
                             values=[7.0], size=1, tile_px=64),
            lambda: dilation(None, values=[7.0], size=1, tile_px=64,
                             fan=fan(df=q4()))),
        "erosion": (
            lambda: erosion(qmod._retile4(q4(), SF_DIR)[0],
                            values=[7.0], size=1, tile_px=64),
            lambda: erosion(None, values=[7.0], size=1, tile_px=64,
                            fan=fan(df=q4()))),
    }
    names = sys.argv[2:] or list(pairs)
    for name in names:
        legacy, new = pairs[name]
        # one untimed warmup each
        legacy().count()
        new().count()
        la, nu = [], []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"ab:{name}:legacy")
            t0 = time.time(); legacy().count(); la.append(time.time() - t0)
            spark.sparkContext.setJobDescription(f"ab:{name}:new")
            t0 = time.time(); new().count(); nu.append(time.time() - t0)
        print(f"{name:18s} legacy min {min(la):6.2f} runs "
              f"{[round(x, 2) for x in la]}   new min {min(nu):6.2f} runs "
              f"{[round(x, 2) for x in nu]}", flush=True)


if __name__ == "__main__":
    main()
