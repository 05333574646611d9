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
        "image_fast_corners": f"""
SELECT g.image_id, g.n_interior, g.n_corners, g.n_bright, g.n_dark,
       g.chk
FROM read_parquet('{gdir}/fast_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
    }
