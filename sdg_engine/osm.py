"""S3: OSM ORC source + way assembly (SURVEY.md §2.1 S3; the analogue
of the reference's osmesa-ORC ingest, ref≈VectorPipe `osm` package —
/root/reference is empty, locus per SURVEY's recall).

An OSM extract arrives as two relations: ``nodes(node_id, lon, lat)``
and ``ways(way_id, nds array<bigint>, tags map)``.  A usable road
table needs each way's node refs RESOLVED to coordinates in ref
order — the "way assembly" step.

Spark-first shape (no Python in the pipeline):

    ways --posexplode(nds)--> (way_id, pos, node_id)
         --join nodes------->  (way_id, pos, x, y)        [one shuffle]
         --groupBy(way_id)-->  sort_array(collect_list(struct(pos,x,y)))
         --transform-------->  coords array<struct<x,y>>

``sort_array`` on the (pos, x, y) struct restores ref order inside the
aggregation (lexicographic struct compare, pos first), so no window or
secondary sort pass is needed.  At planet scale the nodes join is the
classic skew point (mega-ways); AQE skew-split covers it, and the
``collect_list`` group is bounded by OSM's 2000-node way limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assemble_ways(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """Resolve way node-refs to ordered coords (S3 way assembly).

    nodes: (node_id bigint, x double, y double)
    ways:  (way_id bigint, nds array<bigint>, tags map<string,string>)
    Returns: (way_id, tags, n_nodes int, coords array<struct<x,y>>)
    — the shape roads fixtures use, so every downstream operator
    (road_segments, segments_with_cells, …) composes directly.
    """
    refs = ways.select(
        "way_id", "tags", F.posexplode("nds").alias("pos", "node_id")
    )
    resolved = refs.join(nodes, "node_id", "inner")
    return (
        resolved.groupBy("way_id")
        .agg(
            F.first("tags").alias("tags"),
            F.expr(
                "transform(sort_array(collect_list(struct(pos, x, y))), "
                "s -> struct(s.x AS x, s.y AS y))"
            ).alias("coords"),
        )
        .withColumn("n_nodes", F.size("coords"))
        .select("way_id", "tags", "n_nodes", "coords")
    )


def way_lengths(assembled: DataFrame) -> DataFrame:
    """Plate-carrée polyline length per assembled way (meters).

    JVM higher-order aggregate over the coords array — interpreted, but
    O(n_nodes) per row outside any join loop (CLAUDE.md gotcha 4)."""
    from . import METERS_PER_DEG

    seg_len = (
        "aggregate(sequence(1, size(coords) - 1), CAST(0 AS DOUBLE), "
        "(acc, i) -> acc + SQRT("
        "(coords[i].x - coords[i-1].x) * (coords[i].x - coords[i-1].x) + "
        "(coords[i].y - coords[i-1].y) * (coords[i].y - coords[i-1].y)))"
    )
    return assembled.withColumn(
        "length_m", F.expr(f"{seg_len} * CAST({METERS_PER_DEG} AS DOUBLE)")
    )


def write_osm_orc_fixture(spark: SparkSession, path: str, sf: float) -> None:
    """Decompose the roads fixture into a synthetic osmesa-style ORC
    extract (nodes + ways), so assembly can be verified as an exact
    round-trip against the original polylines.

    Node ids are (road_id << 16) | position — unique and deterministic.
    Written as ORC (the reference's ingest format; Spark's built-in ORC
    source needs no extra jars).
    """
    import os

    from . import fixtures as FX

    recs = FX.roads_records(sf)
    node_rows = []
    way_rows = []
    for r in recs:
        nds = []
        for i, p in enumerate(r["coords"]):
            nid = (r["road_id"] << 16) | i
            node_rows.append((nid, p["x"], p["y"]))
            nds.append(nid)
        way_rows.append((r["road_id"], nds, r["tags"]))
    nodes = spark.createDataFrame(node_rows, "node_id bigint, x double, y double")
    ways = spark.createDataFrame(
        way_rows, "way_id bigint, nds array<bigint>, tags map<string,string>"
    )
    nodes.write.mode("overwrite").orc(os.path.join(path, "nodes.orc"))
    ways.write.mode("overwrite").orc(os.path.join(path, "ways.orc"))


def read_osm_orc(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    import os

    return (
        spark.read.orc(os.path.join(path, "nodes.orc")),
        spark.read.orc(os.path.join(path, "ways.orc")),
    )
