"""Round-5 wave 5: Spark-4 SQL surface (native WITH RECURSIVE,
UNPIVOT/melt) + three more sketch/stats/graph operators (Zipf
rank-frequency slope with exact floor-log2, directed HITS
hubs/authorities, AMS F2 second-moment sketch).

Parity rules as everywhere (CLAUDE.md gotchas 7/8): money in cents
BIGINTs, floor-log2 via length(bin(n)) - 1 (bin() renders without
leading zeros in BOTH engines, so the length IS the bit count),
HITS runs UNNORMALIZED (pure integer mat-vec products — ranking is
scale-invariant, so skipping the sqrt normalization removes the only
float from the loop), AMS signs come from md5 hex digits (the repo's
hex→int fragment).

Registered into queries.QUERIES via QUERIES_R5B.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_ORDER_CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"


# Shared WITH RECURSIVE template — Spark 4 runs this text natively and
# DuckDB runs the identical text: the surface under test is the
# recursive-CTE execution itself (UnionLoop vs recurring CTE scan).
# The walk follows precomputed next-pointers (a lead-join linked list),
# so the recursion is linear, cycle-free, and terminates at the longest
# per-customer order chain (~max orders per customer — depth-bounded by
# data shape, not data SIZE; Spark's recursion limit of 100 is safely
# above any plausible per-customer order count and loudly fails rather
# than silently truncating if exceeded).
RECURSIVE_CHAIN_TEMPLATE = f"""
WITH RECURSIVE ord AS (
  SELECT o_custkey, o_orderkey, {_ORDER_CENTS} AS cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey)
              AS BIGINT) AS rn
  FROM {{orders}}
),
linked AS (
  SELECT a.o_custkey AS ck, a.o_orderkey AS ok, a.cents AS cents,
         a.rn AS rn, b.o_orderkey AS nxt
  FROM ord a LEFT JOIN ord b
    ON a.o_custkey = b.o_custkey AND b.rn = a.rn + 1
),
walk AS (
  SELECT ck, ok, nxt, CAST(1 AS BIGINT) AS depth, cents AS run_cents
  FROM linked WHERE rn = 1
  UNION ALL
  SELECT l.ck, l.ok, l.nxt, w.depth + 1, w.run_cents + l.cents
  FROM walk w JOIN linked l ON l.ok = w.nxt
)
SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_chains,
       CAST(SUM(run_cents) AS BIGINT) AS sum_run_cents,
       CAST(SUM(ok) AS BIGINT) AS ok_checksum
FROM walk GROUP BY depth
"""


def recursive_order_chain(spark, sf_dir):
    """NATIVE WITH RECURSIVE (new in Spark 4): per-customer order
    chains walked as a linked list — depth index + running spend
    computed by the recursion, then aggregated per depth.  The
    pointers (next order of the same customer) are precomputed by a
    window + self-join so the recursive step is a pure equi-join on
    the pointer; Spark executes the loop natively (UnionLoopExec),
    DuckDB runs the IDENTICAL text.  The window-function route would
    compute the same result in one pass — the recursion is the
    deliberate surface, mirroring hierarchy/BOM walks that windows
    cannot express."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_rchain_orders")
    return spark.sql(RECURSIVE_CHAIN_TEMPLATE.format(orders="_rchain_orders"))


def unpivot_order_metrics(spark, sf_dir):
    """UNPIVOT / melt (relational breadth O-family): wide per-status
    aggregates rotated into (status, metric, value) rows via the
    native DataFrame unpivot (Expand, one pass, no join/union re-scan).
    All three measures are BIGINT so the melted value column needs no
    widening; the oracle is the classic UNION ALL rotation."""
    agg = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(f"CAST(SUM({_ORDER_CENTS}) AS BIGINT)").alias("sum_cents"),
            F.expr(f"MAX({_ORDER_CENTS})").alias("max_cents"),
        )
    )
    return agg.unpivot(
        ["o_orderstatus"], ["n_orders", "sum_cents", "max_cents"],
        "metric", "val",
    )


# floor(log2(n)) for n >= 1, exact in BOTH engines: bin() renders the
# minimal binary string (no leading zeros), so its length - 1 is the
# integer log2 — no float log anywhere (gotcha 8).
_LOG2 = "(CAST(LENGTH(bin({n})) AS BIGINT) - 1)"


def zipf_word_slope(spark, sf_dir):
    """Zipf rank-frequency fit over the corpus vocabulary: OLS slope of
    floor(log2 freq) on floor(log2 rank) for the top-256 words — the
    corpus-health diagnostic (natural text ≈ -1; templated/duplicated
    text flattens).  Exact integer path: octaves via length(bin(n))-1,
    closed-form OLS over five BIGINT sums, ONE final FLOOR to micros.
    The ranking window runs over the vocabulary-sized count table,
    never the corpus (vocab_oov_rate precedent)."""
    wc = (
        _t(spark, sf_dir, "documents")
        .selectExpr("explode(split(text, ' ')) AS w")
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w_rank = Window.orderBy(F.col("freq").desc(), F.col("w").asc())
    ranked = (
        wc.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter("rnk <= 256")
        .selectExpr(
            f"{_LOG2.format(n='rnk')} AS x",
            f"{_LOG2.format(n='freq')} AS y",
        )
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("CAST(SUM(x * y) AS BIGINT)").alias("sxy"),
        F.expr("CAST(SUM(x * x) AS BIGINT)").alias("sxx"),
    ).selectExpr(
        "n_words",
        "sx", "sy", "sxy", "sxx",
        "CAST(FLOOR(1000000.0 * (n_words * sxy - sx * sy)"
        " / (n_words * sxx - sx * sx)) AS BIGINT) AS slope_micros",
    )


# Directed road-graph edges: same quantized endpoints as
# pagerank_roads (queries_r5._PR_NODE_A/B), but KEPT DIRECTED (a→b as
# drawn) so hub and authority scores genuinely differ (symmetrizing
# would make them equal by construction).
_HITS_ITERS = 3


def hits_roads(spark, sf_dir):
    """HITS hubs/authorities on the DIRECTED quantized road graph,
    INTEGER-EXACT: scores stay unnormalized BIGINTs (ranking is
    scale-invariant, so the per-round sqrt normalization — the only
    float in classic HITS — is dropped; 2k=6 mat-vec products over
    degree ≤ ~10² keeps scores far inside int64).  Per round: ONE
    edges⋈score equi-join + map-side-combined SUM, localCheckpointed
    (gotcha 15).  Output: top-10 per role with deterministic
    tie-break.  Oracle: the identical recurrence as an unrolled LINEAR
    CTE chain (each round references only the previous one — the
    shortest_path_weighted lesson)."""
    from .harness import segments_df
    from .queries_r5 import _PR_NODE_A, _PR_NODE_B

    segs = segments_df(spark, sf_dir).withColumnRenamed("by", "byy")
    edges = (
        segs.selectExpr(f"{_PR_NODE_A} AS src", f"{_PR_NODE_B} AS dst")
        .filter("src <> dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1).cast("bigint").alias("h"))
    for _ in range(_HITS_ITERS):
        auth = (
            edges.join(hub, edges.src == hub.node)
            .select("dst", F.expr("w * h AS c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("a"))
        )
        auth = (
            nodes.join(auth, nodes.node == auth.dst, "left")
            .selectExpr("node", "CAST(COALESCE(a, 0) AS BIGINT) AS a")
            .localCheckpoint()
        )
        hub = (
            edges.join(auth, edges.dst == auth.node)
            .select("src", F.expr("w * a AS c"))
            .groupBy("src")
            .agg(F.sum("c").alias("h"))
        )
        hub = (
            nodes.join(hub, nodes.node == hub.src, "left")
            .selectExpr("node", "CAST(COALESCE(h, 0) AS BIGINT) AS h")
            .localCheckpoint()
        )
    w_h = Window.orderBy(F.col("score").desc(), F.col("node").asc())
    top_h = (
        hub.selectExpr("node", "h AS score")
        .withColumn("rnk", F.row_number().over(w_h).cast("int"))
        .filter("rnk <= 10")
        .selectExpr("'hub' AS role", "node", "score", "rnk")
    )
    top_a = (
        auth.selectExpr("node", "a AS score")
        .withColumn("rnk", F.row_number().over(w_h).cast("int"))
        .filter("rnk <= 10")
        .selectExpr("'authority' AS role", "node", "score", "rnk")
    )
    return top_h.unionAll(top_a)


# AMS sign: md5 hex digit j of the stringified user id, high bit →
# ±1.  The repo's hex→int fragment (instr over the hex alphabet) —
# conv() is absent in DuckDB.
_AMS_SKETCHES = 16
_AMS_SIGN = (
    "CASE WHEN instr('0123456789abcdef',"
    " substr(md5(CAST(user_id AS STRING)), j, 1)) - 1 >= 8"
    " THEN 1 ELSE -1 END"
)


def ams_f2_sketch(spark, sf_dir):
    """AMS (Alon-Matias-Szegedy) F2 second-moment sketch over the
    events user-frequency vector, 16 estimators: est_j = (Σ_u cnt_u ·
    sign_j(u))², signs from md5 hex digits — deterministic, no RNG
    (hll_distinct precedent).  Everything BIGINT; the exact F2 =
    Σ cnt² rides along so the sketch's accuracy is visible in the
    output.  Scale shape: one user-keyed agg (the same agg any
    distinct-count needs), then a 16-way explode over the USER table
    and a 16-row reduce — mergeable across partitions by construction."""
    cnts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_sketch = (
        cnts.selectExpr("user_id", "cnt", "explode(sequence(1, 16)) AS j")
        .selectExpr("j", f"cnt * ({_AMS_SIGN}) AS signed")
        .groupBy("j")
        .agg(F.expr("CAST(SUM(signed) AS BIGINT) AS s"))
    )
    exact = cnts.agg(
        F.expr("CAST(SUM(cnt * cnt) AS BIGINT) AS f2_exact"),
        F.count(F.lit(1)).alias("n_users"),
    )
    est = per_sketch.agg(
        F.expr(
            f"CAST(FLOOR(CAST(SUM(s * s) AS BIGINT) / {_AMS_SKETCHES}.0)"
            " AS BIGINT) AS f2_ams"
        )
    )
    return exact.crossJoin(F.broadcast(est))


QUERIES_R5B = {
    "recursive_order_chain": recursive_order_chain,
    "unpivot_order_metrics": unpivot_order_metrics,
    "zipf_word_slope": zipf_word_slope,
    "hits_roads": hits_roads,
    "ams_f2_sketch": ams_f2_sketch,
}
