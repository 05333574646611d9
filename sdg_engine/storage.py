"""Physical table layout (SURVEY.md §4 "Physical-layout decisions",
hard part 5): Iceberg-compatible partitioning on local parquet.

Design scale (10^12 rows): the images table is written partitioned by
``bucket(cell_id at BUCKET_LEVEL)`` and SORTED by ``cell_id`` within
files, so that (a) per-cell work prunes partitions at scan time and
(b) parquet min/max row-group stats skip within files — the stand-in
for Iceberg's bucket partition transform + sort order.  The real
Iceberg catalog path is config-gated (`format="iceberg"`) and needs
the runtime jars a cluster would ship; this sandbox has none
(SURVEY.md §0), so local tests run the parquet layout and assert the
pruning behavior that carries over 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_LEVEL = 7
N_BUCKETS = 16


def write_images_layout(
    images_geo: DataFrame, path: str, n_buckets: int = N_BUCKETS,
    fmt: str = "parquet",
) -> None:
    """Write partitioned-by-cell-bucket, sorted-by-cell layout."""
    from .ops.spatial import with_point_cell

    df = with_point_cell(images_geo, BUCKET_LEVEL, "lon", "lat", "cell_l7")
    df = df.withColumn(
        "cell_bucket", F.pmod(F.xxhash64("cell_l7"), F.lit(n_buckets)).cast("int")
    )
    (
        df.repartition("cell_bucket")
        .sortWithinPartitions("cell_l7")
        .write.mode("overwrite")
        .partitionBy("cell_bucket")
        .format(fmt)
        .save(path)
    )


def read_images_layout(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)


def cells_to_buckets(cells, n_buckets: int = N_BUCKETS):
    """Driver-side helper: which partitions can contain these cells —
    the pruning predicate a query pushes into the partitioned scan."""
    import numpy as np
    import pandas as pd

    # xxhash64 must match Spark's; compute via a tiny local DataFrame is
    # overkill — callers filter on cell_bucket IN (...) computed by Spark
    raise NotImplementedError(
        "use F.pmod(F.xxhash64('cell_l7'), n) on the query side; "
        "partition pruning is asserted in tests/test_plans.py"
    )
