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





# ---------------------------------------------------------------------------
# HLL sketch MERGE (the mergeability property, demonstrated)
# ---------------------------------------------------------------------------

def hll_union_merge(spark, sf_dir):
    """HLL SKETCH MERGE — the property that makes sketches the 100 TB
    cardinality path: per-type register tables for 'view' and 'click'
    USER-DAYS (user_id x activity date — thousands per type at sf0.01,
    comfortably above the raw-estimator small-range knee of ~2.5m; raw
    HLL has no LinearCounting here by design, it would need a
    transcendental on the oracle path), then the UNION sketch =
    per-bucket MAX of the two register sets (no rescan of either
    input), each estimated with the same integer harmonic form as
    hll_distinct.  Exact distincts ride along per type and for the
    union, so mergeability is oracle-visible: est('union') comes from
    merged registers yet lands within the error band of
    |view ∪ click|.  The only float op is the final one-row division
    per sketch."""
    from .queries_r5 import _HLL_M, _HLL_NUM, _hll_steps

    item = ("CONCAT(CAST(user_id AS STRING), '|', "
            "CAST(CAST(ts AS DATE) AS STRING))")
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .selectExpr("event_type", f"md5({item}) AS h")
    )
    br = ev.selectExpr("event_type", *_hll_steps("h"))
    regs = (
        br.groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
        .localCheckpoint()  # union branches below must not re-scan
    )
    merged = regs.groupBy("bucket").agg(F.max("m").alias("m")) \
        .selectExpr("'union' AS event_type", "bucket", "m")
    all_regs = regs.unionByName(merged)
    sketch = (
        all_regs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_regs"),
            F.sum(F.expr("CAST(1 AS BIGINT) << CAST(53 - m AS INT)"))
            .alias("s_part"),
        )
        .selectExpr(
            "event_type", "n_regs",
            f"CAST(FLOOR({_HLL_NUM} / CAST(s_part + "
            f"({_HLL_M} - n_regs) * (CAST(1 AS BIGINT) << 53) AS DOUBLE))"
            " AS BIGINT) AS est_hll",
        )
    )
    ue = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    exact = (
        ue.selectExpr("event_type", f"{item} AS item")
        .unionByName(
            ue.selectExpr("'union' AS event_type", f"{item} AS item")
        )
        .groupBy("event_type")
        .agg(F.countDistinct("item").alias("exact_distinct"))
    )
    return sketch.join(exact, "event_type").selectExpr(
        "event_type", "n_regs", "est_hll", "exact_distinct",
        "CAST(FLOOR(ABS(est_hll - exact_distinct) * 10000.0 "
        "/ CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_bp",
    )


# ---------------------------------------------------------------------------
# Fixed-point bilinear affine rotation
# ---------------------------------------------------------------------------

def image_affine_bilinear(spark, sf_dir):
    """AFFINE ROTATION with FIXED-POINT BILINEAR resampling — the
    interpolation family the nearest-neighbour CRS warp deliberately
    avoided, made hash-exact: the inverse-rotation matrix is an
    integer 16.16 fixed-point literal, source coordinates stay
    integral on a doubled grid, and the bilinear weights quantize to
    1/256 BEFORE the blend so every output pixel is one exact integer
    expression.  Map-only; out-of-bounds samples are skipped (counted).
    Oracle: committed golden with gather-based mechanics."""
    from .ops.payload import affine_bilinear_stats
    from .queries_ext import _fixture_images

    images, _roads = _fixture_images(spark, sf_dir, pin_sf=0.01)
    sel = images.filter(
        (F.col("image_id") < "img000000000500") & (F.col("fmt") != "jpg")
    )
    return affine_bilinear_stats(sel)


# ---------------------------------------------------------------------------
# Streaming dedup -> window chain
# ---------------------------------------------------------------------------

def streaming_dedup_then_window(spark, sf_dir):
    """MULTI-STATEFUL STREAMING CHAIN #2: watermark-bounded DEDUP
    feeding a windowed count inside one query — the exactly-once
    ingest shape.  The input is DOUBLED (two copies of the events
    file, one per micro-batch), so the dedup state is load-bearing:
    closed windows match the batch twin over DISTINCT events exactly.
    Drained at 8 shuffle partitions (gotcha 16d, two state stores)."""
    import os
    import shutil

    from . import streaming as STR
    from .queries_ext import _stream_base

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = _stream_base(spark, "dedupwin_")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(in_dir, "a.parquet"))
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(in_dir, "b.parquet"))
    out, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        STR.stream_dedup_then_window(spark, in_dir, out, ck)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.read.parquet(out).select(
        F.unix_timestamp("hour_start").alias("hour_epoch"),
        "event_type", "n", "sum_cents",
    )


# ---------------------------------------------------------------------------
# Hough line transform (wave 23)
# ---------------------------------------------------------------------------

def image_hough_lines(spark, sf_dir):
    """DOMINANT-LINE HOUGH TRANSFORM over the certified Sobel edge map
    — the straight-structure curation signal (documents/buildings/
    horizons score high, natural texture low).  ALL INTEGER: 12
    fixed-point 15-degree theta bins, 4-pixel rho bins, votes by
    bincount; argmax tie-break is the smallest (theta, rho), and the
    checksum folds votes^2 over the accumulator so the full vote
    surface is oracle-visible.  Map-only (payload bytes never
    shuffle).  Oracle: committed golden with np.add.at scatter
    mechanics over clamp-indexed generator pixels."""
    from .ops.payload import hough_lines_stats
    from .queries_ext import _fixture_images

    images, _roads = _fixture_images(spark, sf_dir, pin_sf=0.01)
    sel = images.filter(
        (F.col("image_id") < "img000000000500") & (F.col("fmt") != "jpg")
    )
    return hough_lines_stats(sel)


# ---------------------------------------------------------------------------
# Customer concentration deciles (Lorenz table)
# ---------------------------------------------------------------------------

def customer_deciles(spark, sf_dir):
    """REVENUE-CONCENTRATION DECILES (the Lorenz-curve table behind
    customer_gini): per-customer BIGINT-cents spend, EXACT global rank
    via the two-level bucket rank (never a single-partition window
    over customers — gotcha: the rank window runs inside value-range
    buckets, the offsets ride back broadcast), decile by the closed
    formula FLOOR(10*(rank-1)/n)+1, then per-decile share and
    cumulative share in integer millionths (cents*1e6 must fit int64 —
    fine to ~$9e10 total; past that, widen to the decimal path).  The
    only window over data-sized input is bucket-local; the cumulative
    window runs over the 10-row decile relation."""
    from .queries_r5 import _rank2

    od = _t(spark, sf_dir, "orders")
    per = (
        od.selectExpr(
            "o_custkey AS ck",
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        )
        .groupBy("ck")
        .agg(F.sum("cents").alias("mon"))
        .localCheckpoint()  # three consumers: totals + rank + join-back
    )
    tot = per.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("mon").alias("total_cents"),
    )
    mr = _rank2(per, "mon", "CAST(FLOOR(mon / 1048576) AS BIGINT)")
    dec = (
        per.join(mr, "ck")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "CAST(FLOOR(10 * (rank - 1) / n) + 1 AS BIGINT) AS decile",
            "mon", "total_cents",
        )
    )
    per_dec = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("mon").alias("sum_cents"),
        F.max("total_cents").alias("_tc"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_dec.withColumn(
        "cum_cents", F.sum("sum_cents").over(w)
    ).selectExpr(
        "decile", "n_customers", "sum_cents",
        "CAST(sum_cents * 1000000 DIV _tc AS BIGINT) AS share_micros",
        "CAST(cum_cents * 1000000 DIV _tc AS BIGINT) AS cum_share_micros",
    )


QUERIES_R5E = {
    "roads_graph_diameter": roads_graph_diameter,
    "image_fast_corners": image_fast_corners,
    "events_seasonal_decompose": events_seasonal_decompose,
    "hll_union_merge": hll_union_merge,
    "image_affine_bilinear": image_affine_bilinear,
    "streaming_dedup_then_window": streaming_dedup_then_window,
    "image_hough_lines": image_hough_lines,
    "customer_deciles": customer_deciles,
}
