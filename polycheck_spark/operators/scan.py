"""Simulated LiDAR scan (reference O7 `faux_scan`) as a Spark pipeline.

Rays are generated relationally (``spark.range(num_rays)``), the CSR-packed
polygon layer is broadcast once per executor (the analog of the reference's
single device upload, polycheck.py:1341-1366), and each Arrow batch marches
its rays with the exact float32 kernel.  Always returns the
(ranges, hit_polygon_ids) pair (SURVEY.md §2.1 quirk normalization).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from polycheck_spark.geo.kernel import pack_polygons_csr
from polycheck_spark.geo.kernel_batch import line_range_batch

_OUT = T.StructType([T.StructField("range", T.FloatType()),
                     T.StructField("hit_polygon", T.IntegerType())])


def faux_scan_df(spark, polygons, origin, angle_start, angle_inc,
                 num_rays: int, max_range: float, resolution: float) -> DataFrame:
    """(ray_id, angle, range, hit_polygon) for every ray."""
    rays = spark.range(num_rays).select(
        F.col("id").alias("ray_id"),
        (F.lit(float(np.float32(angle_start)))
         + F.col("id").cast("float") * F.lit(float(np.float32(angle_inc))))
        .cast("float").alias("angle"))

    if not len(polygons):
        return rays.select("ray_id", "angle",
                           F.lit(-1.0).cast("float").alias("range"),
                           F.lit(0x7FFFFFFF).alias("hit_polygon"))

    verts, offsets = pack_polygons_csr(polygons)
    bc = spark.sparkContext.broadcast((verts, offsets))
    ox, oy = float(origin[0]), float(origin[1])
    mr, res = float(max_range), float(resolution)
    a0, ainc = float(angle_start), float(angle_inc)

    @F.pandas_udf(_OUT)
    def march(ray_id: pd.Series) -> pd.DataFrame:
        v, o = bc.value
        ids = ray_id.to_numpy(np.int64)
        # float32 angle arithmetic, as in the CUDA kernel (polycheck.py:805)
        angles = (np.float32(a0)
                  + ids.astype(np.float32) * np.float32(ainc)).astype(np.float32)
        rng, hit = line_range_batch(v, o, ox, oy, angles, mr, res)
        return pd.DataFrame({"range": rng, "hit_polygon": hit})

    return (rays.withColumn("res", march(F.col("ray_id")))
            .select("ray_id", "angle", F.col("res.range").alias("range"),
                    F.col("res.hit_polygon").alias("hit_polygon")))
