"""Round-5 wave 21: double-sweep graph diameter (two chained BFS
passes, live recursive-CTE oracle), FAST-12 corner detection (the
keypoint curation signal; table-driven golden), and classical
seasonal decomposition of the daily series (trend/seasonal/residual,
all integer-exact).

Parity rules as everywhere (CLAUDE.md gotchas 7/8/17).
Registered into queries.QUERIES via QUERIES_R5E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TS_US = "unix_micros(CAST(ts AS TIMESTAMP))"
_DAY_US = 86_400_000_000


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Double-sweep diameter estimate
# ---------------------------------------------------------------------------

_DIAM_MAX_HOPS = 32  # shared bound — mirrored in the oracle CTEs


def _bfs_labels(edges, seed, max_hops: int):
    """Hop labels from ``seed`` (node DataFrame) — the road_graph_bfs
    frontier loop, factored for reuse: per round one equi-join +
    distinct + anti-join, localCheckpointed (gotcha 15)."""
    visited = seed.selectExpr("node", "CAST(0 AS INT) AS hops") \
        .localCheckpoint()
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .selectExpr("dst AS node", f"CAST({hop} AS INT) AS hops")
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def roads_graph_diameter(spark, sf_dir):
    """DOUBLE-SWEEP DIAMETER estimate of the road graph — the classic
    2-BFS lower bound (sweep 1 from the max-degree hub finds the
    farthest node u; sweep 2 from u measures ecc(u), which on
    tree-like road networks is usually the exact diameter).  Both
    sweeps are the certified BFS frontier loop; argmax picks are
    (hops desc, node asc) deterministic.  Oracle: TWO chained
    recursive CTEs over the same quantized graph, identical 32-hop
    bound."""
    from .queries_ext import _fixture_images
    from .queries_r5 import _BFS_NODE

    _images, roads = _fixture_images(spark, sf_dir, pin_sf=0.01)
    node = _BFS_NODE.format(x="c.x", y="c.y")
    segs = roads.selectExpr(
        f"transform(coords, c -> {node}) AS nds"
    ).selectExpr(
        "explode(transform(sequence(1, size(nds) - 1), "
        "i -> struct(nds[i - 1] AS a, nds[i] AS b))) AS e"
    ).select("e.a", "e.b")
    edges = (
        segs.selectExpr("a AS src", "b AS dst")
        .unionAll(segs.selectExpr("b AS src", "a AS dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    hub = (
        deg.orderBy(F.col("deg").desc(), F.col("src").asc())
        .limit(1)
        .selectExpr("src AS node")
    )
    # the frontier tables are graph-sized, not corpus-sized — run the
    # ~2x32 tiny rounds at 8 shuffle partitions (gotcha 16d: iterative
    # fixed cost = partitions x rounds x stages)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        lab1 = _bfs_labels(edges, hub, _DIAM_MAX_HOPS)
        far1 = (
            lab1.orderBy(F.col("hops").desc(), F.col("node").asc())
            .limit(1)
        )
        lab2 = _bfs_labels(edges, far1.select("node"), _DIAM_MAX_HOPS)
        far2 = (
            lab2.orderBy(F.col("hops").desc(), F.col("node").asc())
            .limit(1)
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return (
        hub.selectExpr("node AS hub")
        .crossJoin(far1.selectExpr("node AS u", "hops AS ecc_hub"))
        .crossJoin(far2.selectExpr("node AS v", "hops AS diameter_lb"))
        .crossJoin(
            lab2.agg(
                F.count(F.lit(1)).alias("n_reachable"),
                F.sum("node").alias("chk"),
            )
        )
        .selectExpr(
            "hub", "ecc_hub", "u", "diameter_lb", "v",
            "CAST(n_reachable AS BIGINT) AS n_reachable",
            "CAST(chk AS BIGINT) AS chk",
        )
    )


# ---------------------------------------------------------------------------
# FAST-12 corner detection
# ---------------------------------------------------------------------------

def image_fast_corners(spark, sf_dir):
    """FAST-12 CORNER DETECTION (the keypoint/texture curation signal
    next to Sobel and Harris-free GLCM): a pixel is a corner when some
    CONTIGUOUS circular arc of >= 12 of its 16 Bresenham-circle
    neighbors is uniformly brighter (or darker) than center +- t.
    Pure-integer comparisons on milli-luma; interior pixels only.
    Engine: 16 shifted views -> packed 16-bit codes -> sliced circular
    AND; golden twin: the SAME codes through a 65536-entry max-run
    LOOKUP TABLE built scalar — two different run detectors."""
    from .ops.payload import fast_corner_stats
    from .queries_ext import _fixture_images

    images, _roads = _fixture_images(spark, sf_dir, pin_sf=0.01)
    sel = images.filter(
        (F.col("image_id") < "img000000000500") & (F.col("fmt") != "jpg")
    )
    return fast_corner_stats(sel)


# ---------------------------------------------------------------------------
# Seasonal decomposition (trend / day-of-week seasonal / residual)
# ---------------------------------------------------------------------------

def events_seasonal_decompose(spark, sf_dir):
    """CLASSICAL SEASONAL DECOMPOSITION of the daily spend series:
    trend = centered 7-day moving average (integer DIV over FULL
    windows only), seasonal = per-day-of-week truncating mean of the
    detrended values, residual = detrended - seasonal; emits the
    7-row seasonal profile with exact residual power.  All-integer
    (DIV <-> // verified for negatives); every window runs over the
    gap-filled dense DAY grid (time-bounded, never rows)."""
    daily = (
        _t(spark, sf_dir, "events")
        .selectExpr(
            f"{_TS_US} DIV {_DAY_US} AS d",
            "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents",
        )
        .groupBy("d")
        .agg(F.sum("cents").alias("v"))
    )
    span = daily.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    dense = (
        span.selectExpr("explode(sequence(d0, d1)) AS d")
        .join(daily, "d", "left")
        .selectExpr("d", "COALESCE(v, 0) AS v")
    )
    tr = dense.selectExpr(
        "d", "v",
        "SUM(v) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3"
        " FOLLOWING) AS s7",
        "COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3"
        " FOLLOWING) AS n7",
    ).filter("n7 = 7").selectExpr(
        "d", "v", "v - s7 DIV 7 AS det", "d % 7 AS dow"
    )
    seas = tr.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("SUM(det) DIV COUNT(*)").alias("seasonal_cents"),
    )
    return (
        tr.join(seas, "dow")
        .selectExpr("dow", "n_days", "seasonal_cents",
                    "det - seasonal_cents AS r")
        .groupBy("dow", "n_days", "seasonal_cents")
        .agg(
            F.sum(F.expr("r * r")).alias("sum_resid_sq"),
            F.sum("r").alias("sum_resid"),
        )
    )


QUERIES_R5E = {
    "roads_graph_diameter": roads_graph_diameter,
    "image_fast_corners": image_fast_corners,
    "events_seasonal_decompose": events_seasonal_decompose,
}
