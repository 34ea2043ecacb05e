"""remotior_sensus_spark — a from-scratch PySpark-native spatial-join +
tiling engine with the query/data-processing capabilities of
``semiautomaticgit/remotior_sensus`` (reference studied read-only at
/root/reference; architecture is Spark-first, not a port).

Data model (see SURVEY.md §1):
  * ``documents``  — interleaved text+media docs
    ``(doc_id string, spans array<struct<kind,text,media_ref,offset:int>>)``
  * ``tiles``      — raster tiles ``(bandset, band, tile_x, tile_y,
    cell_key, origin_x, origin_y, nodata, pixels array<float>)``
  * ``geometries`` — ROI polygons ``(roi_id, class, macroclass, wkt, bbox)``
  * ``signatures`` — spectral signature catalog (broadcast side)

All pixel math is either pure Spark higher-order functions
(``transform``/``zip_with``/``aggregate`` — JVM-side, codegen'd) or
Arrow-batched pandas UDFs; there is no per-row Python anywhere.
"""

__version__ = "0.1.0"

NODATA = -32768.0  # reference: core/configurations.py:88 (nodata_val)
