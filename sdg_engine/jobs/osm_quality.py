"""Entry point 2 of the reference (SURVEY.md §3.1, ref≈OsmQualityMain):
per-country road network quality stats — road counts, total length,
percent all-season — over the roads table.  No raster stage.

All JVM-side: geometry length is an ``aggregate`` fold over the coords
array (X6), the all-season predicate is F2's tag CASE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import METERS_PER_DEG
from ..ops.spatial import filter_roads, with_all_season

_LEN_EXPR = (
    # sum of segment lengths: fold over vertex pairs (plate-carrée m)
    "aggregate(sequence(1, size(coords) - 1), CAST(0 AS DOUBLE), "
    "(acc, i) -> acc + SQRT("
    "(element_at(coords, i + 1).x - element_at(coords, i).x) * "
    "(element_at(coords, i + 1).x - element_at(coords, i).x) + "
    "(element_at(coords, i + 1).y - element_at(coords, i).y) * "
    "(element_at(coords, i + 1).y - element_at(coords, i).y))) "
    f"* CAST({METERS_PER_DEG} AS DOUBLE)"
)


def road_quality_summary(roads: DataFrame) -> DataFrame:
    """Per-country: n_roads, total_km, pct_all_season, km by class."""
    r = with_all_season(filter_roads(roads)).withColumn(
        "len_m", F.expr(_LEN_EXPR)
    )
    return (
        r.groupBy("country_code")
        .agg(
            F.count(F.lit(1)).alias("n_roads"),
            F.round(F.sum("len_m") / 1000.0, 3).alias("total_km"),
            F.round(
                F.sum(F.when(F.col("all_season"), F.col("len_m")).otherwise(0.0))
                / F.sum("len_m"),
                6,
            ).alias("pct_all_season_km"),
            F.round(
                F.sum(F.when(F.col("kind").isin("motorway", "trunk", "primary"),
                             F.col("len_m")).otherwise(0.0)) / 1000.0,
                3,
            ).alias("primary_km"),
        )
    )
