"""DuckDB oracle twins for queries_r5b (wave 5).

recursive_order_chain runs the ENGINE'S OWN WITH RECURSIVE template —
both engines parse identical text, so the native recursive execution
is the only thing under test.  hits_roads unrolls the identical
integer recurrence as a LINEAR CTE chain (each round references only
the previous round once — the shortest_path_weighted lesson: a
twice-referenced chained CTE re-inlines its whole prefix per round).
"""

from __future__ import annotations

from .harness import AX, AY, BX, BY
from .queries_r5 import _PR_NODE_A, _PR_NODE_B
from .queries_r5b import (
    _AMS_SIGN,
    _AMS_SKETCHES,
    _HITS_ITERS,
    _LOG2,
    _ORDER_CENTS,
    RECURSIVE_CHAIN_TEMPLATE,
)

ORACLES_R5B = {
    "recursive_order_chain": RECURSIVE_CHAIN_TEMPLATE.format(orders="orders"),
}

ORACLES_R5B["unpivot_order_metrics"] = f"""
WITH agg AS (
  SELECT o_orderstatus,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM({_ORDER_CENTS}) AS BIGINT) AS sum_cents,
         CAST(MAX({_ORDER_CENTS}) AS BIGINT) AS max_cents
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM agg
UNION ALL
SELECT o_orderstatus, 'sum_cents' AS metric, sum_cents AS val FROM agg
UNION ALL
SELECT o_orderstatus, 'max_cents' AS metric, max_cents AS val FROM agg
"""

ORACLES_R5B["zipf_word_slope"] = f"""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
),
wc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM toks WHERE w <> '' GROUP BY w
),
rk AS (
  SELECT freq,
         CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS BIGINT) AS rnk
  FROM wc
),
pts AS (
  SELECT {_LOG2.format(n='rnk')} AS x, {_LOG2.format(n='freq')} AS y
  FROM rk WHERE rnk <= 256
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts
)
SELECT n_words, sx, sy, sxy, sxx,
       CAST(FLOOR(1000000.0 * (n_words * sxy - sx * sy)
                  / (n_words * sxx - sx * sx)) AS BIGINT) AS slope_micros
FROM s
"""


def _hits_roads_sql() -> str:
    """Unrolled directed-HITS recurrence: a_i from h_{i-1}, h_i from
    a_i — every round CTE references only its predecessor (linear
    chain); nodes/ew are cheap bases re-inlined per round (the
    pagerank-oracle precedent)."""
    ctes = [
        f"segs AS (SELECT {AX} AS ax, {AY} AS ay, {BX} AS bx, {BY} AS byy"
        " FROM supplier)",
        f"ab AS (SELECT {_PR_NODE_A} AS a, {_PR_NODE_B} AS b FROM segs)",
        "ew AS (SELECT a AS src, b AS dst, CAST(COUNT(*) AS BIGINT) AS w"
        " FROM ab WHERE a <> b GROUP BY a, b)",
        "nodes AS (SELECT src AS node FROM ew UNION SELECT dst FROM ew)",
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes)",
    ]
    for i in range(1, _HITS_ITERS + 1):
        ctes.append(
            f"a{i} AS (SELECT node, CAST(COALESCE(t.s, 0) AS BIGINT) AS a"
            " FROM nodes LEFT JOIN ("
            "SELECT dst, CAST(SUM(w * h) AS BIGINT) AS s"
            f" FROM ew JOIN h{i - 1} ON h{i - 1}.node = ew.src GROUP BY dst"
            ") t ON t.dst = nodes.node)"
        )
        ctes.append(
            f"h{i} AS (SELECT node, CAST(COALESCE(t.s, 0) AS BIGINT) AS h"
            " FROM nodes LEFT JOIN ("
            "SELECT src, CAST(SUM(w * a) AS BIGINT) AS s"
            f" FROM ew JOIN a{i} ON a{i}.node = ew.dst GROUP BY src"
            ") t ON t.src = nodes.node)"
        )
    k = _HITS_ITERS
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT role, node, score, rnk FROM (
  SELECT 'hub' AS role, node, h AS score,
         CAST(ROW_NUMBER() OVER (ORDER BY h DESC, node ASC) AS INT) AS rnk
  FROM h{k}
) WHERE rnk <= 10
UNION ALL
SELECT role, node, score, rnk FROM (
  SELECT 'authority' AS role, node, a AS score,
         CAST(ROW_NUMBER() OVER (ORDER BY a DESC, node ASC) AS INT) AS rnk
  FROM a{k}
) WHERE rnk <= 10""")


ORACLES_R5B["hits_roads"] = _hits_roads_sql()

ORACLES_R5B["ams_f2_sketch"] = f"""
WITH cnts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
per_sketch AS (
  SELECT j, CAST(SUM(cnt * ({_AMS_SIGN})) AS BIGINT) AS s
  FROM cnts, UNNEST(generate_series(1, 16)) AS u(j)
  GROUP BY j
)
SELECT
  (SELECT CAST(SUM(cnt * cnt) AS BIGINT) FROM cnts) AS f2_exact,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM cnts) AS n_users,
  (SELECT CAST(FLOOR(CAST(SUM(s * s) AS BIGINT) / {_AMS_SKETCHES}.0)
               AS BIGINT) FROM per_sketch) AS f2_ams
"""
