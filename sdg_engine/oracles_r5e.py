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


ORACLES_R5E["quantile_sketch_eval"] = """
WITH cents AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
dist AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM cents GROUP BY 1),
cum AS (
  SELECT cents, SUM(cnt) OVER (ORDER BY cents
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le
  FROM dist
),
hist AS (
  SELECT CAST(FLOOR(cents / 819200) AS BIGINT) AS bin, COUNT(*) AS cnt
  FROM cents GROUP BY 1
),
hcum AS (
  SELECT bin, SUM(cnt) OVER (ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_le
  FROM hist
),
tot AS (SELECT SUM(cnt) AS n FROM hist),
pcts AS (
  SELECT pct, CAST(FLOOR((pct * n + 99) / 100) AS BIGINT) AS target_rank
  FROM tot, UNNEST([25, 50, 75, 90, 99]) AS t(pct)
),
hit AS (
  SELECT p.pct, p.target_rank,
         CAST(MIN(c.bin) * 819200 AS BIGINT) AS est_lo_cents
  FROM pcts p JOIN hcum c ON c.n_le >= p.target_rank
  GROUP BY 1, 2
),
ex AS (
  SELECT p.pct, p.target_rank, MIN(c.cents) AS exact_cents
  FROM pcts p JOIN cum c ON c.n_le >= p.target_rank
  GROUP BY 1, 2
)
SELECT CAST(ex.pct AS INT) AS pct, ex.target_rank, ex.exact_cents,
       hit.est_lo_cents,
       CAST(ex.exact_cents - hit.est_lo_cents AS BIGINT) AS err_cents,
       CAST(CASE WHEN ex.exact_cents >= hit.est_lo_cents
                  AND ex.exact_cents < hit.est_lo_cents + 819200
            THEN 1 ELSE 0 END AS INT) AS in_bin
FROM ex JOIN hit ON ex.pct = hit.pct AND ex.target_rank = hit.target_rank
"""


ORACLES_R5E["events_best_f1_threshold"] = """
WITH ev AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
           AS BIGINT) AS pos
  FROM events
),
dist AS (SELECT cents, CAST(SUM(pos) AS BIGINT) AS p_at,
                CAST(COUNT(*) AS BIGINT) AS n_at
         FROM ev GROUP BY 1),
cum AS (
  SELECT cents, p_at, n_at,
         CAST(SUM(p_at) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS p_le,
         CAST(SUM(n_at) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_le
  FROM dist
),
tot AS (SELECT CAST(SUM(p_at) AS BIGINT) AS tp_all,
               CAST(SUM(n_at) AS BIGINT) AS tn_all FROM dist),
sweep AS (
  SELECT cents,
         tp_all - (p_le - p_at) AS tp,
         (tn_all - tp_all) - ((n_le - n_at) - (p_le - p_at)) AS fp,
         tp_all AS p
  FROM cum, tot
),
sc AS (
  SELECT cents, tp, fp, p - tp AS fn,
         CAST(2 * tp * 1000000 // (tp + fp + p) AS BIGINT) AS f1_micros
  FROM sweep
)
SELECT cents AS threshold_cents, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn, f1_micros
FROM sc ORDER BY f1_micros DESC, cents ASC LIMIT 1
"""


def _strokes_sql(roads_pq: str) -> str:
    """roads_strokes: identical micro-degree segment extraction and
    cross/dot angular gate; component labels via the pruned
    recursive-CTE reachability min (the dissolve technique)."""
    return f"""
WITH raw AS (
  SELECT CAST(road_id AS VARCHAR) AS rid, kind, coords AS cs
  FROM read_parquet('{roads_pq}')
),
segs AS (
  SELECT concat(rid, ':', CAST(i AS VARCHAR)) AS seg, kind,
         CAST(FLOOR(cs[i].x * 1000000) AS BIGINT) AS x1,
         CAST(FLOOR(cs[i].y * 1000000) AS BIGINT) AS y1,
         CAST(FLOOR(cs[i + 1].x * 1000000) AS BIGINT) AS x2,
         CAST(FLOOR(cs[i + 1].y * 1000000) AS BIGINT) AS y2
  FROM (SELECT rid, kind, cs,
               unnest(generate_series(1, len(cs) - 1)) AS i FROM raw)
),
ori AS (
  SELECT seg, kind, x1, y1, x2, y2 FROM segs
  UNION ALL
  SELECT seg, kind, x2 AS x1, y2 AS y1, x1 AS x2, y1 AS y2 FROM segs
),
ins AS (
  SELECT seg AS seg_a,
         concat(kind, '|', CAST(x2 AS VARCHAR), '|',
                CAST(y2 AS VARCHAR)) AS nk,
         x2 - x1 AS ux, y2 - y1 AS uy
  FROM ori
),
outs AS (
  SELECT seg AS seg_b,
         concat(kind, '|', CAST(x1 AS VARCHAR), '|',
                CAST(y1 AS VARCHAR)) AS nk,
         x2 - x1 AS vx, y2 - y1 AS vy
  FROM ori
),
adj AS (
  SELECT DISTINCT i.seg_a AS a, o.seg_b AS b
  FROM ins i JOIN outs o USING (nk)
  WHERE i.seg_a <> o.seg_b
    AND ux * vx + uy * vy > 0
    AND 1000 * abs(ux * vy - uy * vx) < 577 * (ux * vx + uy * vy)
),
verts AS (SELECT seg AS k FROM segs),
w AS (
  WITH RECURSIVE t(v, lab) AS (
    SELECT k, k FROM verts
    UNION
    SELECT adj.b, t.lab FROM t JOIN adj ON adj.a = t.v
    WHERE t.lab < adj.b
  ) SELECT v, MIN(lab) AS label FROM t GROUP BY v
),
sl AS (
  SELECT seg, kind,
         CAST(FLOOR(sqrt(CAST((x2 - x1) * (x2 - x1) + (y2 - y1) *
           (y2 - y1) AS DOUBLE))) AS BIGINT) AS len_u
  FROM segs
),
per AS (
  SELECT sl.kind, w.label, CAST(COUNT(*) AS BIGINT) AS n_segs,
         CAST(SUM(len_u) AS BIGINT) AS sum_len
  FROM sl JOIN w ON w.v = sl.seg GROUP BY 1, 2
)
SELECT kind, CAST(SUM(n_segs) AS BIGINT) AS n_segments,
       CAST(COUNT(*) AS BIGINT) AS n_strokes,
       CAST(MAX(n_segs) AS BIGINT) AS max_segments,
       CAST(MAX(sum_len) AS BIGINT) AS max_len_micros
FROM per GROUP BY kind
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
        "roads_strokes": _strokes_sql(roads),
        "image_affine_bilinear": f"""
SELECT g.image_id, g.n_sampled, g.sum_out, g.max_out, g.chk
FROM read_parquet('{gdir}/affine_sf0.01.parquet') g
JOIN read_parquet('{img}') f2 USING (image_id)
WHERE f2.image_id < 'img000000000500' AND f2.fmt <> 'jpg'
""",
        "image_canny_hysteresis": f"""
SELECT g.image_id, g.n_weak, g.n_strong, g.n_final, g.chk
FROM read_parquet('{gdir}/canny_sf0.01.parquet') g
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
