"""sf0.4 scale rehearsal for the continuation-session families (cost,
connected components, ML census, halo twins, forced-distributed
phase 2). Operators constructed exactly as the query wrappers do;
expected-oracle builds skipped (driver-side dense rebuilds at this sf
are a one-time cost unrelated to the operators). Writes
BENCH/rehearsal_sf04_continuation.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
os.chdir(REPO)

SF = 0.4
SF_DIR = f"data/geo/sf{SF}"


def main() -> None:
    from remotior_sensus_spark.session import get_spark
    from remotior_sensus_spark.synth.generate import ensure_geo
    from remotior_sensus_spark import queries as qmod
    from remotior_sensus_spark.operators import (classification as cls_ops,
                                                 components as C,
                                                 geostats, hydrology as hy)
    from remotior_sensus_spark.operators.band_calc import band_calc
    from pyspark.sql import functions as F

    spark = get_spark("local[32]")
    t0 = time.time()
    ensure_geo(SF)
    print(f"ensure_geo({SF}): {time.time()-t0:.1f}s", flush=True)

    def tiles():
        return qmod._tiles(spark, SF_DIR)

    def b04():
        return qmod._b01(spark, SF_DIR, "B04")

    def fan(h=1, df=None):
        return qmod._fan64(spark, SF_DIR, "B04", halo_tiles=h, df=df)[0]

    def q4():
        return band_calc(tiles(), 'where("B04" > 2500, 2, 1)',
                         nodata_mask="any", out_nodata=0)

    def binary():
        return band_calc(tiles(), 'where("B04" > 2500, 1, 0)',
                         nodata_mask=None)

    targets = {
        "cost_distance": lambda: hy.cost_distance_tiles(
            None, tile_px=64, init_fan=fan(4)),
        "cost_allocation": lambda: hy.cost_allocation_tiles(
            None, tile_px=64, init_fan=fan(4)),
        "corridor_census": lambda: hy.corridor_tiles(
            None, tile_px=64, init_fan=fan(4).localCheckpoint()),
        "raster_label_histogram": lambda: C.component_size_histogram(
            qmod._retile4(binary(), SF_DIR)[0], tile_px=64),
        "sieve_reclass": lambda: C.sieve(
            qmod._retile4(q4(), SF_DIR)[0], min_size=4, tile_px=64
        ).groupBy("old_value", "new_value").agg(
            F.count("*"), F.sum("patch_size")),
        "polygonize_wkt": lambda: C.polygonize_geometry(
            qmod._retile4(q4(), SF_DIR)[0], tile_px=64),
        "focal_majority": lambda: geostats.focal_majority_tiles(
            None, tile_px=64, fan=fan()),
        "tri_ruggedness": lambda: geostats.tri_classes_tiles(
            None, tile_px=64, fan=fan()),
        "proximity_bands": lambda: geostats.proximity_classes_tiles(
            None, tile_px=64, fan=fan()),
        "ndvi_trend": lambda: __import__(
            "remotior_sensus_spark.operators.temporal",
            fromlist=["x"]).ndvi_trend_tiles(tiles(), qmod._BS3),
    }

    out = {"sf": SF, "note": "continuation families, min of 2 warm runs "
                             "at local[32]; 4x the sf0.1 pixels"}
    res = {}
    for name, mk in targets.items():
        mk().count()  # warm
        vals = []
        for _ in range(2):
            t1 = time.time()
            mk().count()
            vals.append(round(time.time() - t1, 2))
        res[name] = {"sec": min(vals), "runs": vals}
        print(name, res[name], flush=True)

    # ML census (training + classify, as the query does)
    def ml():
        bands, stats, stacked = qmod._ml_inputs(spark, SF_DIR)
        return cls_ops.ml_census_tiles(stacked, bands, stats,
                                       threshold=5.0, include_best=True)
    ml().count()
    vals = []
    for _ in range(2):
        t1 = time.time(); ml().count(); vals.append(round(time.time()-t1, 2))
    res["ml_threshold_confidence"] = {"sec": min(vals), "runs": vals}
    print("ml_threshold_confidence", res["ml_threshold_confidence"], flush=True)

    # forced-distributed phase 2 (pointer-doubled) at 4x data
    t1 = time.time()
    hy.flow_accumulation_tiles(None, tile_px=64, fan=fan(),
                               driver_threshold=0).count()
    res["flow_accumulation_forced_distributed"] = {
        "sec": round(time.time() - t1, 2),
        "ph2_rounds": int(hy._LAST_PH2_ROUNDS)}
    print("forced-distributed", res["flow_accumulation_forced_distributed"],
          flush=True)

    out["queries"] = res
    with open("BENCH/rehearsal_sf04_continuation.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote BENCH/rehearsal_sf04_continuation.json", flush=True)


if __name__ == "__main__":
    main()
