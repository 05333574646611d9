"""DuckDB oracle twins for queries_r5e (wave 21)."""

from __future__ import annotations

import os

from .queries_r5e import _DAY_US, _DIAM_MAX_HOPS

ORACLES_R5E: dict[str, str] = {}

ORACLES_R5E["events_seasonal_decompose"] = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS d,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS v
  FROM events GROUP BY 1
),
span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
dense AS (
  SELECT g.d, COALESCE(daily.v, 0) AS v
  FROM (SELECT UNNEST(range(d0, d1 + 1)) AS d FROM span) g
  LEFT JOIN daily ON daily.d = g.d
),
tr AS (
  SELECT d, v,
         CAST(SUM(v) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3
           FOLLOWING) AS BIGINT) AS s7,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3
           FOLLOWING) AS n7
  FROM dense
),
det AS (
  SELECT d, v, v - s7 // 7 AS det, d % 7 AS dow FROM tr WHERE n7 = 7
),
seas AS (
  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(CAST(SUM(det) AS BIGINT) // COUNT(*) AS BIGINT)
           AS seasonal_cents
  FROM det GROUP BY 1
)
SELECT det.dow, seas.n_days, seas.seasonal_cents,
       CAST(SUM((det - seasonal_cents) * (det - seasonal_cents))
            AS BIGINT) AS sum_resid_sq,
       CAST(SUM(det - seasonal_cents) AS BIGINT) AS sum_resid
FROM det JOIN seas ON det.dow = seas.dow
GROUP BY 1, 2, 3
"""


def _hll_union_sql() -> str:
    """Identical HLL algorithm in DuckDB — registers per type, merged
    union registers via per-bucket MAX, same integer harmonic form."""
    from .queries_r5 import _HLL_M, _HLL_NUM, _hll_steps

    steps = ", ".join(_hll_steps("h"))
    item = ("CONCAT(CAST(user_id AS VARCHAR), '|', "
            "CAST(CAST(ts AS DATE) AS VARCHAR))")
    return f"""
WITH ev AS (
  SELECT event_type, md5({item}) AS h
  FROM events WHERE event_type IN ('view', 'click')
),
br AS (SELECT event_type, {steps} FROM ev),
regs AS (SELECT event_type, bucket, MAX(rho) AS m FROM br GROUP BY 1, 2),
merged AS (SELECT 'union' AS event_type, bucket, MAX(m) AS m
           FROM regs GROUP BY 2),
all_regs AS (SELECT * FROM regs UNION ALL SELECT * FROM merged),
sk AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_regs,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m AS INT)) AS BIGINT)
           AS s_part
  FROM all_regs GROUP BY 1
),
est AS (
  SELECT event_type, n_regs,
         CAST(FLOOR({_HLL_NUM} / CAST(s_part + ({_HLL_M} - n_regs)
           * (CAST(1 AS BIGINT) << 53) AS DOUBLE)) AS BIGINT) AS est_hll
  FROM sk
),
ue AS (SELECT event_type, {item} AS item FROM events
       WHERE event_type IN ('view', 'click')
       UNION ALL
       SELECT 'union', {item} AS item FROM events
       WHERE event_type IN ('view', 'click')),
ex AS (SELECT event_type, CAST(COUNT(DISTINCT item) AS BIGINT)
         AS exact_distinct FROM ue GROUP BY 1)
SELECT est.event_type, est.n_regs, est.est_hll, ex.exact_distinct,
       CAST(FLOOR(ABS(est_hll - exact_distinct) * 10000.0
         / CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_bp
FROM est JOIN ex ON est.event_type = ex.event_type
"""


ORACLES_R5E["hll_union_merge"] = _hll_union_sql()

ORACLES_R5E["streaming_dedup_then_window"] = """
WITH mx AS (SELECT MAX(epoch(ts)) AS m FROM events),
agg AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events GROUP BY 1, 2
)
SELECT a.hour_epoch, a.event_type, a.n, a.sum_cents
FROM agg a, mx WHERE a.hour_epoch + 3600 <= mx.m - 7200
"""


ORACLES_R5E["customer_deciles"] = """
WITH per AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
           AS BIGINT) AS mon
  FROM orders GROUP BY 1
),
rk AS (SELECT ck, mon,
              ROW_NUMBER() OVER (ORDER BY mon, ck) AS rank FROM per),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(mon) AS BIGINT) AS total_cents FROM per),
dec AS (
  SELECT CAST(FLOOR(10 * (rank - 1) / tot.n) + 1 AS BIGINT) AS decile,
         mon, total_cents
  FROM rk, tot
),
pd AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(mon) AS BIGINT) AS sum_cents,
         MAX(total_cents) AS _tc
  FROM dec GROUP BY 1
)
SELECT decile, n_customers, sum_cents,
       CAST(sum_cents * 1000000 // _tc AS BIGINT) AS share_micros,
       CAST(SUM(sum_cents) OVER (ORDER BY decile
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         * 1000000 // _tc AS BIGINT) AS cum_share_micros
FROM pd
"""


def fixture_oracles_r5e() -> dict[str, str]:
    """Lazily-built oracles embedding absolute fixture/golden paths."""
    from .jobs.rai import fixture_dir
    from .queries_r5 import _BFS_NODE

    fdir = fixture_dir(0.01)
    roads = os.path.join(fdir, "roads.parquet").replace("'", "''")
    img = os.path.join(fdir, "images.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    node = _BFS_NODE.format(x="c.x", y="c.y")
    diameter = f"""
WITH RECURSIVE
nds AS (SELECT list_transform(coords, c -> {node}) AS nds
        FROM read_parquet('{roads}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
e AS (SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM ab
        UNION ALL SELECT b AS src, a AS dst FROM ab)
      WHERE src <> dst),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
hub AS (SELECT src AS node FROM deg ORDER BY deg DESC, src ASC LIMIT 1),
walk1(node, hops) AS (
  SELECT node, 0 FROM hub
  UNION
  SELECT e.dst, w.hops + 1 FROM walk1 w JOIN e ON e.src = w.node
  WHERE w.hops < {_DIAM_MAX_HOPS}
),
lab1 AS (SELECT node, MIN(hops) AS hops FROM walk1 GROUP BY node),
far1 AS (SELECT node, hops FROM lab1 ORDER BY hops DESC, node ASC
         LIMIT 1),
walk2(node, hops) AS (
  SELECT node, 0 FROM far1
  UNION
  SELECT e.dst, w.hops + 1 FROM walk2 w JOIN e ON e.src = w.node
  WHERE w.hops < {_DIAM_MAX_HOPS}
),
lab2 AS (SELECT node, MIN(hops) AS hops FROM walk2 GROUP BY node),
far2 AS (SELECT node, hops FROM lab2 ORDER BY hops DESC, node ASC
         LIMIT 1)
SELECT hub.node AS hub, CAST(far1.hops AS INT) AS ecc_hub,
       far1.node AS u, CAST(far2.hops AS INT) AS diameter_lb,
       far2.node AS v,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lab2) AS n_reachable,
       (SELECT CAST(SUM(node) AS BIGINT) FROM lab2) AS chk
FROM hub, far1, far2
"""
    return {
        "roads_graph_diameter": diameter,
        "image_affine_bilinear": f"""
SELECT g.image_id, g.n_sampled, g.sum_out, g.max_out, g.chk
FROM read_parquet('{gdir}/affine_sf0.01.parquet') g
JOIN read_parquet('{img}') f2 USING (image_id)
WHERE f2.image_id < 'img000000000500' AND f2.fmt <> 'jpg'
""",
        "image_hough_lines": f"""
SELECT g.image_id, g.n_edges, g.best_votes, g.best_theta, g.best_rho,
       g.chk
FROM read_parquet('{gdir}/hough_sf0.01.parquet') g
JOIN read_parquet('{img}') f2 USING (image_id)
WHERE f2.image_id < 'img000000000500' AND f2.fmt <> 'jpg'
""",
        "image_fast_corners": f"""
SELECT g.image_id, g.n_interior, g.n_corners, g.n_bright, g.n_dark,
       g.chk
FROM read_parquet('{gdir}/fast_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
    }
