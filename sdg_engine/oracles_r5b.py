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
    RECURSIVE_LINKED_SQL,
    RECURSIVE_WALK_SQL,
)


def _recursive_chain_sql() -> str:
    """Compose the engine's two fragments into ONE WITH RECURSIVE
    statement: ord+linked inline (DuckDB plans CTEs once, so no
    materialization is needed here), walk text identical."""
    linked_body = RECURSIVE_LINKED_SQL.format(orders="orders").strip()
    # RECURSIVE_LINKED_SQL is "WITH ord AS (...) SELECT ..."; rewrap it
    # as CTE members of the recursive WITH.
    assert linked_body.startswith("WITH ord AS")
    ord_and_select = linked_body[len("WITH "):]
    # -> "ord AS (...)\nSELECT ..." ; split at the top-level SELECT
    idx = ord_and_select.index("\nSELECT")
    ord_cte = ord_and_select[:idx].rstrip().rstrip(",")
    linked_select = ord_and_select[idx + 1:]
    walk = RECURSIVE_WALK_SQL.format(linked="linked").strip()
    assert walk.startswith("WITH RECURSIVE walk AS")
    walk_rest = walk[len("WITH RECURSIVE "):]
    return (
        "WITH RECURSIVE " + ord_cte + ",\nlinked AS (" + linked_select
        + "),\n" + walk_rest
    )


ORACLES_R5B = {
    "recursive_order_chain": _recursive_chain_sql(),
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


ORACLES_R5B["events_theil_sen"] = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY h
),
pairs AS (
  SELECT a.h AS h1, b.h AS h2,
         CAST(FLOOR(1000000.0 * (b.x - a.x) / (b.h - a.h)) AS BIGINT)
           AS slope
  FROM hourly a JOIN hourly b ON b.h > a.h
),
ranked AS (
  SELECT slope, CAST(ROW_NUMBER() OVER (ORDER BY slope, h1, h2) AS BIGINT)
           AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
  FROM pairs
)
SELECT n_pairs, slope AS median_slope_micros
FROM ranked WHERE rn = CAST(FLOOR((n_pairs + 1) / 2.0) AS BIGINT)
"""

# the corpus is ASCII, where UTF8_LCASE equivalence is lower()-equality
ORACLES_R5B["collation_token_dedup"] = """
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
),
t AS (SELECT w FROM toks WHERE w <> '')
SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS n_cs,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lower(w)) AS BIGINT) AS n_ci
FROM t
"""

ORACLES_R5B["param_sql_revenue"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                * CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS discount_cc
FROM lineitem
WHERE CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 3 AND 6
  AND l_quantity < 30
"""


def _pca_sql() -> str:
    """Unrolled integer power iteration: v_i -> w_{i+1} -> v_{i+1},
    each CTE referencing only its predecessor ONCE (the per-round max
    is a window over the 64-row relation, not a scalar subquery — a
    second reference would re-inline the whole chain per round)."""
    from .queries_r5b import _PCA_DAMP, _PCA_DIM, _PCA_ROUNDS

    ctes = [
        f"q AS (SELECT vec_id, u.j AS j,"
        " CAST(FLOOR(CAST(embedding[u.j] AS DOUBLE) * 1000.0 + 0.5)"
        " AS BIGINT) AS qv"
        f" FROM embeddings, UNNEST(generate_series(1, {_PCA_DIM})) AS u(j))",
        "cov AS (SELECT a.j AS j, b.j AS k,"
        " CAST(SUM(a.qv * b.qv) AS BIGINT) AS s"
        " FROM q a JOIN q b USING (vec_id) GROUP BY a.j, b.j)",
        f"m AS (SELECT j, k, CAST(FLOOR(CAST(s AS DOUBLE) / {_PCA_DAMP})"
        " AS BIGINT) AS m FROM cov)",
        "v0 AS (SELECT DISTINCT j, CAST(1000000 AS BIGINT) AS v FROM m)",
    ]
    for i in range(1, _PCA_ROUNDS + 1):
        ctes.append(
            f"w{i} AS (SELECT m.j AS j, CAST(SUM(m.m * v{i - 1}.v) AS BIGINT)"
            f" AS w FROM m JOIN v{i - 1} ON v{i - 1}.j = m.k GROUP BY m.j)"
        )
        ctes.append(
            f"v{i} AS (SELECT j, CAST(FLOOR(1000000.0 * w / MAX(ABS(w))"
            f" OVER ()) AS BIGINT) AS v FROM w{i})"
        )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT j, v AS loading FROM v{_PCA_ROUNDS}")


ORACLES_R5B["pca_power_iteration"] = _pca_sql()


ORACLES_R5B["scd2_user_state"] = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
flagged AS (
  SELECT user_id, event_type, us,
         CASE WHEN LAG(event_type) OVER
                (PARTITION BY user_id ORDER BY us, event_id)
              IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg,
         event_id
  FROM ev
),
grouped AS (
  SELECT user_id, event_type, us,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM flagged
),
iv AS (
  SELECT user_id, grp, MIN(event_type) AS state,
         CAST(MIN(us) AS BIGINT) AS valid_from
  FROM grouped GROUP BY user_id, grp
),
iv2 AS (
  SELECT state, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
           AS valid_to
  FROM iv
)
SELECT state, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_current,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 0
                ELSE valid_to - valid_from END) AS BIGINT)
         AS closed_dur_us
FROM iv2 GROUP BY state
"""

ORACLES_R5B["events_mad"] = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY h
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hours FROM hourly),
med AS (
  SELECT x AS median_x, n_hours FROM (
    SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x, h) AS BIGINT) AS rn,
           n_hours
    FROM hourly, n
  ) WHERE rn = CAST(FLOOR((n_hours + 1) / 2.0) AS BIGINT)
),
dev AS (
  SELECT h, ABS(x - median_x) AS d, median_x, n_hours FROM hourly, med
)
SELECT n_hours, median_x, d AS mad FROM (
  SELECT d, median_x, n_hours,
         CAST(ROW_NUMBER() OVER (ORDER BY d, h) AS BIGINT) AS rn
  FROM dev
) WHERE rn = CAST(FLOOR((n_hours + 1) / 2.0) AS BIGINT)
"""
