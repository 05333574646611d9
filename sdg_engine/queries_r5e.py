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
    from .tablecache import read_table

    return read_table(spark, f"{sf_dir}/{name}.parquet")


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
    # fixed cost = partitions x rounds x stages) with codegen OFF for
    # the rounds too (per-round plan churn); r06 review consolidation:
    # one shared scoped helper instead of a hand-rolled save/restore
    from .queries_ext import _drain_confs

    with _drain_confs(spark):
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
    from .queries_ext import _drain_confs

    with _drain_confs(spark, nodata=False):
        STR.stream_dedup_then_window(spark, in_dir, out, ck)
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


# ---------------------------------------------------------------------------
# Perceptual stroke grouping (wave 24)
# ---------------------------------------------------------------------------

def roads_strokes(spark, sf_dir):
    """STROKE GROUPING (perceptual road-network generalization — the
    'good continuation' operator cartographers run before display
    filtering): same-kind segments that meet at an EXACT shared vertex
    and deflect by less than ~30 degrees chain into one stroke.  All
    geometry is integer micro-degrees; the angular gate is the exact
    cross/dot test 1000*|cross| < 577*dot with dot > 0 (tan 30 =
    0.577, no trig anywhere).  Segments come from explode(sequence) +
    element_at (no interpreted lambda, no window — gotcha 16b);
    continuation candidates are NODE-BUCKETED equi-join pairs (fanout
    = node degree, never all-pairs); components run through the
    pointer-jumped min-label primitive (O(log diameter) rounds).
    Stroke lengths fold FLOOR-micro segment lengths (exact BIGINTs).
    Oracle: identical fragments + the pruned recursive-CTE
    reachability min (the dissolve technique) in DuckDB."""
    from .queries_ext import _fixture_images
    from .queries_r5 import _components_jump

    _images, roads = _fixture_images(spark, sf_dir, pin_sf=0.01)
    segs = (
        roads.selectExpr(
            "CAST(road_id AS STRING) AS rid", "kind", "coords",
            "explode(sequence(1, size(coords) - 1)) AS i",
        )
        .selectExpr(
            "concat(rid, ':', CAST(i AS STRING)) AS seg",
            "kind",
            "CAST(FLOOR(element_at(coords, i).x * 1000000) AS BIGINT)"
            " AS x1",
            "CAST(FLOOR(element_at(coords, i).y * 1000000) AS BIGINT)"
            " AS y1",
            "CAST(FLOOR(element_at(coords, i + 1).x * 1000000) AS"
            " BIGINT) AS x2",
            "CAST(FLOOR(element_at(coords, i + 1).y * 1000000) AS"
            " BIGINT) AS y2",
        )
        .localCheckpoint()  # consumers: orientations, verts, lengths
    )
    ori = segs.selectExpr("seg", "kind", "x1", "y1", "x2", "y2") \
        .unionByName(segs.selectExpr(
            "seg", "kind", "x2 AS x1", "y2 AS y1", "x1 AS x2",
            "y1 AS y2",
        ))
    ins = ori.selectExpr(
        "seg AS seg_a",
        "concat(kind, '|', CAST(x2 AS STRING), '|', CAST(y2 AS STRING))"
        " AS nk",
        "x2 - x1 AS ux", "y2 - y1 AS uy",
    )
    outs = ori.selectExpr(
        "seg AS seg_b",
        "concat(kind, '|', CAST(x1 AS STRING), '|', CAST(y1 AS STRING))"
        " AS nk",
        "x2 - x1 AS vx", "y2 - y1 AS vy",
    )
    pairs = ins.join(outs, "nk").filter("seg_a <> seg_b").filter(
        "ux * vx + uy * vy > 0 AND "
        "1000 * abs(ux * vy - uy * vx) < 577 * (ux * vx + uy * vy)"
    )
    edges = pairs.selectExpr("seg_a AS src", "seg_b AS dst").distinct()
    verts = segs.selectExpr("seg AS k")
    labels = _components_jump(edges, verts)
    seg_len = segs.selectExpr(
        "seg", "kind",
        "CAST(FLOOR(sqrt(CAST((x2 - x1) * (x2 - x1) + (y2 - y1) *"
        " (y2 - y1) AS DOUBLE))) AS BIGINT) AS len_u",
    )
    per = (
        seg_len.join(labels, seg_len.seg == labels.v)
        .groupBy("kind", "label")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum("len_u").alias("sum_len"),
        )
    )
    return per.groupBy("kind").agg(
        F.sum("n_segs").alias("n_segments"),
        F.count(F.lit(1)).alias("n_strokes"),
        F.max("n_segs").alias("max_segments"),
        F.max("sum_len").alias("max_len_micros"),
    )


# ---------------------------------------------------------------------------
# Quantile-sketch quality eval (wave 24)
# ---------------------------------------------------------------------------

def quantile_sketch_eval(spark, sf_dir):
    """SKETCH-QUALITY EVAL for the histogram quantile sketch — the
    eval stage before trusting the single-pass p25..p99 at 100 TB
    (the ann_recall_eval pattern applied to quantiles): the certified
    hist_quantiles estimates joined against the EXACT nearest-rank
    order statistics at the same target ranks, per-percentile error in
    cents and the ±1-bin containment flag (provably always 1: the
    first bin whose cumulative count reaches the rank IS the bin of
    the exact value).  Exact side: cumulative distribution over the
    DISTINCT-cents relation with a TWO-LEVEL bucket prefix (the
    bucket-local window + broadcast offsets trick — never a
    single-partition window over row-scale input)."""
    from pyspark.sql import Window

    from .queries_r5 import hist_quantiles

    BIN = 819200
    sk = hist_quantiles(spark, sf_dir).select(
        "pct", "target_rank", "est_lo_cents"
    )
    dist = (
        _t(spark, sf_dir, "orders")
        .selectExpr(
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents"
        )
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .selectExpr(
            "cents", "cnt",
            f"CAST(FLOOR(cents / {BIN}) AS BIGINT) AS b",
        )
        .localCheckpoint()  # consumers: local window + bucket totals
    )
    wl = Window.partitionBy("b").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    loc = dist.withColumn("loc_cum", F.sum("cnt").over(wl))
    btot = dist.groupBy("b").agg(F.sum("cnt").alias("bt"))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.withColumn(
        "off", F.coalesce(F.sum("bt").over(wo), F.lit(0))
    ).select("b", "off")
    cum = loc.join(F.broadcast(offs), "b").selectExpr(
        "cents", "loc_cum + off AS n_le"
    )
    exact = (
        cum.join(F.broadcast(sk), cum.n_le >= F.col("target_rank"))
        .groupBy("pct", "target_rank", "est_lo_cents")
        .agg(F.min("cents").alias("exact_cents"))
    )
    return exact.selectExpr(
        "pct", "target_rank", "exact_cents", "est_lo_cents",
        "exact_cents - est_lo_cents AS err_cents",
        f"CAST(CASE WHEN exact_cents >= est_lo_cents AND exact_cents"
        f" < est_lo_cents + {BIN} THEN 1 ELSE 0 END AS INT) AS in_bin",
    )


# ---------------------------------------------------------------------------
# Hysteresis edge linking (wave 25)
# ---------------------------------------------------------------------------

def image_canny_hysteresis(spark, sf_dir):
    """TWO-THRESHOLD HYSTERESIS EDGE LINKING (the Canny stage after
    the gradient): weak edges survive only when 8-connected — through
    other weak pixels — to a strong edge, killing isolated noise while
    keeping faint continuations of real contours.  The engine kernel
    is a vectorized dilation fixpoint; the golden twin floods with a
    scalar BFS deque — two different algorithms meeting at the unique
    connected closure.  Map-only; every output is an exact integer.
    Oracle: committed golden over clamp-indexed generator pixels."""
    from .ops.payload import canny_hysteresis_stats
    from .queries_ext import _fixture_images

    images, _roads = _fixture_images(spark, sf_dir, pin_sf=0.01)
    sel = images.filter(
        (F.col("image_id") < "img000000000500") & (F.col("fmt") != "jpg")
    )
    return canny_hysteresis_stats(sel)


# ---------------------------------------------------------------------------
# Exact best-F1 operating point (wave 25)
# ---------------------------------------------------------------------------

def events_best_f1_threshold(spark, sf_dir):
    """EXACT OPERATING-POINT SELECTION — sweep every distinct score
    threshold and pick the best F1 of value-as-classifier for the
    'purchase' class (the threshold-tuning step after events_auc's
    ranking eval).  Counts come from ONE cumulative pass over the
    DISTINCT-cents relation (two-level bucket prefix — windows never
    see row-scale input): at threshold t, TP = P - pos_lt(t),
    FP = N - neg_lt(t); F1 compared at micro resolution
    (f1_micros = 2*TP*1e6 DIV (TP+FP+P), integer-exact in both
    engines), argmax via ONE max(struct) aggregation — max F1 then the
    smallest threshold, no ranking window anywhere."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").selectExpr(
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents",
        "CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        " AS BIGINT) AS pos",
    )
    dist = (
        ev.groupBy("cents")
        .agg(
            F.sum("pos").alias("p_at"),
            F.count(F.lit(1)).alias("n_at"),
        )
        .selectExpr(
            "cents", "p_at", "n_at",
            "CAST(FLOOR(cents / 819200) AS BIGINT) AS b",
        )
        .localCheckpoint()  # consumers: local window + bucket totals
    )
    wl = Window.partitionBy("b").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    loc = dist.withColumn("p_le", F.sum("p_at").over(wl)) \
        .withColumn("n_le", F.sum("n_at").over(wl))
    btot = dist.groupBy("b").agg(
        F.sum("p_at").alias("bp"), F.sum("n_at").alias("bn")
    )
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "b",
        F.coalesce(F.sum("bp").over(wo), F.lit(0)).alias("p_off"),
        F.coalesce(F.sum("bn").over(wo), F.lit(0)).alias("n_off"),
    )
    tot = dist.agg(
        F.sum("p_at").alias("tp_all"), F.sum("n_at").alias("tn_all")
    )
    sweep = (
        loc.join(F.broadcast(offs), "b")
        .crossJoin(F.broadcast(tot))
        .selectExpr(
            "cents",
            # predictions positive at score >= t: subtract the counts
            # STRICTLY BELOW t (inclusive-cum minus the at-t row)
            "tp_all - (p_le + p_off - p_at) AS tp",
            "(tn_all - tp_all) - ((n_le + n_off - n_at)"
            " - (p_le + p_off - p_at)) AS fp",
            "tp_all AS p",
        )
        .selectExpr(
            "cents", "tp", "fp", "p - tp AS fn",
            "CAST(2 * tp * 1000000 DIV (tp + fp + p) AS BIGINT)"
            " AS f1_micros",
        )
    )
    best = sweep.agg(
        F.max(
            F.struct(
                F.col("f1_micros"),
                (-F.col("cents")).alias("neg_c"),
                "tp", "fp", "fn",
            )
        ).alias("s")
    )
    return best.selectExpr(
        "-s.neg_c AS threshold_cents", "s.tp AS tp", "s.fp AS fp",
        "s.fn AS fn", "s.f1_micros AS f1_micros",
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
    "roads_strokes": roads_strokes,
    "quantile_sketch_eval": quantile_sketch_eval,
    "image_canny_hysteresis": image_canny_hysteresis,
    "events_best_f1_threshold": events_best_f1_threshold,
}
