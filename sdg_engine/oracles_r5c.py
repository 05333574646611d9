"""DuckDB oracle twins for queries_r5c (wave 6).

Dialect adaptations per CLAUDE.md gotcha 7: size->len, split->
string_split, DIV->//, SUM(int)->HUGEINT->CAST BIGINT, epoch_us(ts)
for unix_micros(CAST(ts AS TIMESTAMP)), 1-indexed lists.  Float
fragments (_RHO_MICROS, _RUNS_Z, the KW per-group chain, readability
terms, the shoelace running fold) are the ENGINE'S OWN text imported
from queries_r5c so both engines evaluate identical expressions.
"""

from __future__ import annotations

import os

from .queries_r5c import (
    CENTROID_SQL,
    _FC_K,
    _FC_MICROS,
    _FKG_MILS,
    _FRE_MILS,
    _RANK_EXPRS,
    _RHO_MICROS,
    _RUNS_Z,
)


ORACLES_R5C: dict[str, str] = {}

ORACLES_R5C["events_spearman"] = f"""
WITH hourly0 AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(SUM(CASE WHEN event_type = 'view'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END)
              AS BIGINT) AS xv,
         CAST(SUM(CASE WHEN event_type = 'click'
                  THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END)
              AS BIGINT) AS xc
  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1
),
hourly AS (SELECT * FROM hourly0 WHERE xv IS NOT NULL AND xc IS NOT NULL),
ranked AS (
  SELECT 2 * RANK() OVER (ORDER BY xv)
           + COUNT(*) OVER (PARTITION BY xv) - 1 AS r2v,
         2 * RANK() OVER (ORDER BY xc)
           + COUNT(*) OVER (PARTITION BY xc) - 1 AS r2c
  FROM hourly
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM((r2v - r2c) * (r2v - r2c)) AS BIGINT) AS sum_d2_sq
  FROM ranked
)
SELECT n_hours, sum_d2_sq, {_RHO_MICROS} AS rho_micros FROM agg
"""

ORACLES_R5C["events_runs_test"] = f"""
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
d AS (SELECT h, x - LAG(x) OVER (ORDER BY h) AS d FROM hourly),
s AS (
  SELECT h, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
  FROM d WHERE d IS NOT NULL AND d <> 0
),
r AS (
  SELECT s,
         CASE WHEN LAG(s) OVER (ORDER BY h) IS NULL THEN 1
              WHEN s <> LAG(s) OVER (ORDER BY h) THEN 1 ELSE 0 END AS new_run
  FROM s
),
agg AS (
  SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM r
)
SELECT n_pos, n_neg, n_runs, {_RUNS_Z} AS z_micros FROM agg
"""

ORACLES_R5C["events_kruskal"] = """
WITH ev AS (
  SELECT event_type AS g,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
cells AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c FROM ev GROUP BY 1, 2),
scores AS (SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY 1),
r2 AS (
  SELECT v, t,
         CAST(2 * COALESCE(SUM(t) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + t + 1 AS BIGINT) AS r2
  FROM scores
),
grp AS (
  SELECT g, CAST(SUM(c) AS BIGINT) AS n_g,
         CAST(SUM(c * r2) AS BIGINT) AS r2_g
  FROM cells JOIN r2 USING (v) GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
  FROM r2
),
per_g AS (
  SELECT g, n_g, n, tie_sum, r2_g - n_g * (n + 1) AS dev
  FROM grp CROSS JOIN tot
),
t2 AS (
  SELECT g, n_g, n, tie_sum,
         CAST(FLOOR(3000000.0 * dev * dev
              / (CAST(n_g AS DOUBLE) * n * (n + 1))) AS BIGINT) AS t_micros
  FROM per_g
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(t_micros) AS BIGINT) AS h_micros,
       CAST(FLOOR(1000000.0 - 1000000.0 * MAX(tie_sum)
            / (CAST(MAX(n) AS DOUBLE) * MAX(n) * MAX(n) - MAX(n)))
            AS BIGINT) AS tie_corr_micros
FROM t2
"""

ORACLES_R5C["doc_readability"] = f"""
WITH d AS (
  SELECT lang,
         CAST(len(regexp_extract_all(text, '([A-Za-z]+)', 1)) AS BIGINT)
           AS n_words,
         CAST(len(regexp_extract_all(lower(text), '([aeiouy]+)', 1))
              AS BIGINT) AS n_syl,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(len(regexp_extract_all(text, '([.!?]+)', 1))
                       AS BIGINT)) AS n_sents
  FROM documents
),
f AS (
  SELECT lang, {_FRE_MILS} AS fre_mils, {_FKG_MILS} AS fkg_mils
  FROM d WHERE n_words > 0
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(fre_mils) AS BIGINT) AS sum_fre_mils,
       CAST(MIN(fre_mils) AS BIGINT) AS min_fre_mils,
       CAST(MAX(fre_mils) AS BIGINT) AS max_fre_mils,
       CAST(SUM(fkg_mils) AS BIGINT) AS sum_fkg_mils
FROM f GROUP BY 1
"""

ORACLES_R5C["doc_repetition"] = """
WITH bg AS (
  SELECT doc_id, lang, parts[i] || ' ' || parts[i + 1] AS bg
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS parts
        FROM documents) t,
       UNNEST(range(1, len(parts))) AS r(i)
),
per_bg AS (
  SELECT doc_id, lang, bg, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, lang, CAST(SUM(c) AS BIGINT) AS n_bg,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         CAST(MAX(c) AS BIGINT) AS max_c
  FROM per_bg GROUP BY 1, 2
),
sc AS (
  SELECT doc_id, lang, n_bg,
         (1000 * max_c) // n_bg AS top_share_mils,
         (1000 * (n_bg - n_distinct)) // n_bg AS dup_mils
  FROM per_doc
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN top_share_mils >= 100 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repetitive,
       CAST(SUM(top_share_mils) AS BIGINT) AS sum_top_mils,
       CAST(SUM(dup_mils) AS BIGINT) AS sum_dup_mils,
       CAST(SUM(n_bg) AS BIGINT) AS sum_bigrams
FROM sc GROUP BY 1
"""


ORACLES_R5C["streaming_user_streaks"] = """
WITH e AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
runs AS (
  SELECT user_id, event_type, rn,
         rn - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                 ORDER BY rn) AS grp
  FROM e
),
rl AS (
  SELECT user_id, event_type, grp,
         CAST(COUNT(*) AS BIGINT) AS len,
         MIN(rn) AS start_rn
  FROM runs GROUP BY 1, 2, 3
),
best AS (
  SELECT user_id, event_type AS best_type, len AS best_len,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_rn ASC) AS rk
  FROM rl
),
ne AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
)
SELECT b.user_id, n.n_events, b.best_len, b.best_type
FROM best b JOIN ne n USING (user_id) WHERE rk = 1
"""


_FC_LAGS = ", ".join(
    f"LAG(x, {j}) OVER (ORDER BY h) AS x{j}" for j in range(1, _FC_K + 1)
)
_FC_SX = " + ".join(f"x{j}" for j in range(1, _FC_K + 1))
_FC_SIX = " + ".join(
    f"{_FC_K + 1 - j} * x{j}" for j in range(1, _FC_K + 1)
)

ORACLES_R5C["events_forecast_ols"] = f"""
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
lags AS (SELECT h, x, {_FC_LAGS} FROM hourly),
sums AS (
  SELECT h, x, x1, ({_FC_SX}) AS sx, ({_FC_SIX}) AS six
  FROM lags WHERE x{_FC_K} IS NOT NULL
),
fc AS (
  SELECT h, x, {_FC_MICROS} AS fc_micros, x1 * 1000000 AS naive_micros
  FROM sums
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(ABS(x * 1000000 - fc_micros)) AS BIGINT)
           AS mae_ols_micros,
         CAST(SUM(ABS(x * 1000000 - naive_micros)) AS BIGINT)
           AS mae_naive_micros
  FROM fc
)
SELECT n_obs, mae_ols_micros, mae_naive_micros,
       CAST(FLOOR(1000.0 * CAST(mae_ols_micros AS DOUBLE)
            / mae_naive_micros) AS BIGINT) AS mase_mils
FROM agg
"""

ORACLES_R5C["orders_rank_functions"] = f"""
WITH base AS (
  SELECT o_orderstatus AS st, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
ranked AS (
  SELECT st, cents, {", ".join(_RANK_EXPRS)}
  FROM base
)
SELECT st, quartile, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(SUM(pr_micros) AS BIGINT) AS sum_pr_micros,
       CAST(SUM(cd_micros) AS BIGINT) AS sum_cd_micros
FROM ranked GROUP BY 1, 2
"""


def _ripley_sql() -> str:
    from .harness import PX, PY
    from .queries_r5c import _RK_BOUND, _RK_CELL, _RK_K, _RK_L, _RK_RADII

    legs = " UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS r_micro, p{r} AS n_pairs, n, "
        f"{_RK_K.format(p=f'p{r}')} AS k_micros, "
        f"{_RK_L.format(p=f'p{r}')} AS l_micros FROM joined"
        for r in _RK_RADII
    )
    csums = ", ".join(
        f"CAST(SUM(CASE WHEN dsq <= {r * r} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS p{r}"
        for r in _RK_RADII
    )
    return f"""
WITH pts AS (
  SELECT o_orderkey AS pid,
         CAST(FLOOR({PX} * 1000000) AS BIGINT) AS x,
         CAST(FLOOR({PY} * 1000000) AS BIGINT) AS y,
         COALESCE({_RK_CELL.format(c=PX)} * 1000
                  + {_RK_CELL.format(c=PY)}, -1) AS cell
  FROM orders WHERE o_orderkey <= {_RK_BOUND}
),
nb AS (
  SELECT pid AS pid2, x AS x2, y AS y2,
         cell + (u.k % 3 - 1) * 1000 + CAST(FLOOR(u.k / 3) AS BIGINT) - 1
           AS cell
  FROM pts, UNNEST(range(0, 9)) AS u(k)
),
pairs AS (
  SELECT (p.x - nb.x2) * (p.x - nb.x2)
         + (p.y - nb.y2) * (p.y - nb.y2) AS dsq
  FROM pts p JOIN nb USING (cell) WHERE p.pid < nb.pid2
),
agg AS (SELECT {csums} FROM pairs),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
joined AS (SELECT * FROM agg, nn)
{legs}
"""


ORACLES_R5C["cells_ripley_k"] = _ripley_sql()


def _bootstrap_sql() -> str:
    from .queries_r5c import _BS_B, _bs_h48

    h48 = _bs_h48("concat('bs', b, ':', s)")
    return f"""
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
idx AS (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY h) - 1 AS BIGINT) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM hourly
),
slots AS (SELECT i AS s FROM idx),
draws AS (
  SELECT u.b AS b, s, ({h48}) % 1000000 AS h48
  FROM slots, UNNEST(range(0, {_BS_B})) AS u(b)
),
joined AS (
  SELECT d.b, i.x FROM draws d JOIN idx i ON i.i = d.h48 % i.n
),
reps AS (
  SELECT b, (1000000 * CAST(SUM(x) AS BIGINT)) // COUNT(*) AS mean_micros
  FROM joined GROUP BY 1
),
ranked AS (
  SELECT mean_micros,
         ROW_NUMBER() OVER (ORDER BY mean_micros, b) AS rk
  FROM reps
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
       CAST(MAX(CASE WHEN rk = 2 THEN mean_micros END) AS BIGINT)
         AS lo_micros,
       CAST(MAX(CASE WHEN rk = {_BS_B - 1} THEN mean_micros END) AS BIGINT)
         AS hi_micros,
       CAST(SUM(mean_micros) AS BIGINT) AS sum_mean_micros
FROM ranked
"""


ORACLES_R5C["events_bootstrap_ci"] = _bootstrap_sql()

ORACLES_R5C["embeddings_davies_bouldin"] = """
WITH comp AS (
  SELECT vec_id, label, u.j - 1 AS j,
         CAST(FLOOR(CAST(embedding[u.j] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS qx
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(j)
),
cent AS (
  SELECT label, j, CAST(CAST(SUM(qx) AS BIGINT) // COUNT(*) AS BIGINT) AS c
  FROM comp GROUP BY 1, 2
),
dists AS (
  SELECT comp.label,
         CAST(FLOOR(SQRT(CAST(CAST(SUM((qx - c) * (qx - c)) AS BIGINT)
              AS DOUBLE))) AS BIGINT) AS dist
  FROM comp JOIN cent USING (label, j)
  GROUP BY comp.vec_id, comp.label
),
scatter AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(CAST(SUM(dist) AS BIGINT) // COUNT(*) AS BIGINT) AS s_mils
  FROM dists GROUP BY 1
),
csep AS (
  SELECT a.label AS la, b.label AS lb,
         CAST(FLOOR(SQRT(CAST(CAST(SUM((a.c - b.c) * (a.c - b.c))
              AS BIGINT) AS DOUBLE))) AS BIGINT) AS m_mils
  FROM cent a JOIN cent b ON a.j = b.j AND a.label <> b.label
  GROUP BY 1, 2
),
r AS (
  SELECT la, CAST(MAX((1000 * (sa.s_mils + sb.s_mils)) // m_mils)
              AS BIGINT) AS d_mils
  FROM csep
  JOIN scatter sa ON sa.label = csep.la
  JOIN scatter sb ON sb.label = csep.lb
  GROUP BY 1
)
SELECT s.label, s.n_members, s.s_mils, r.d_mils
FROM scatter s JOIN r ON r.la = s.label
"""


ORACLES_R5C["orders_abc_analysis"] = """
WITH rev AS (
  SELECT p_brand,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
),
cl AS (
  SELECT p_brand, rev,
         COALESCE(CAST(SUM(rev) OVER (ORDER BY rev DESC, p_brand
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           0) AS cum_before,
         CAST(SUM(rev) OVER () AS BIGINT) AS total
  FROM rev
),
classed AS (
  SELECT rev,
         CASE WHEN cum_before * 100 < total * 80 THEN 'A'
              WHEN cum_before * 100 < total * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM cl
)
SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_brands,
       CAST(SUM(rev) AS BIGINT) AS sum_cents
FROM classed GROUP BY 1
"""


def _markov_sql() -> str:
    from .queries_r5c import _MK_ROUNDS

    parts = ["""
WITH ev AS (
  SELECT user_id, event_type AS t, epoch_us(ts) AS us, event_id
  FROM events
),
lagged AS (
  SELECT t, LEAD(t) OVER (PARTITION BY user_id
                          ORDER BY us, event_id) AS nxt
  FROM ev
),
tr AS (
  SELECT t, nxt, CAST(COUNT(*) AS BIGINT) AS c
  FROM lagged WHERE nxt IS NOT NULL GROUP BY 1, 2
),
rs AS (SELECT t, CAST(SUM(c) AS BIGINT) AS r FROM tr GROUP BY 1),
tm AS MATERIALIZED (
  SELECT tr.t, tr.nxt, tr.c, rs.r FROM tr JOIN rs USING (t)),
p0 AS (SELECT t AS s, CAST(1000000 // 5 AS BIGINT) AS pi FROM rs)"""]
    for k in range(1, _MK_ROUNDS + 1):
        parts.append(f""",
p{k} AS (
  SELECT nxt AS s, CAST(SUM((pi * c) // r) AS BIGINT) AS pi
  FROM tm JOIN p{k - 1} ON tm.t = p{k - 1}.s GROUP BY 1)""")
    parts.append(f"""
SELECT s AS event_type, pi AS pi_micros FROM p{_MK_ROUNDS}""")
    return "".join(parts)


ORACLES_R5C["events_markov_stationary"] = _markov_sql()


def _frechet_sql(roads_pq: str) -> str:
    """roads_frechet twin — a GENUINELY DIFFERENT algorithm: minimax
    shortest path on the pair lattice (Bellman relaxation with
    GREATEST as the path cost, MIN as the fold), unrolled 80
    MATERIALIZED rounds (max 41 + 41 vertices) with zero-cost
    self-loop moves (the events_dtw technique, max-min semiring)."""
    rounds = 80
    parts = [f"""
WITH first AS (
  SELECT road_id,
         COALESCE(CAST(FLOOR(coords[1].x * 10) AS BIGINT) * 100000
                  + CAST(FLOOR(coords[1].y * 10) AS BIGINT), -1) AS cell
  FROM read_parquet('{roads_pq}')
),
verts AS (
  SELECT road_id, u.i AS i,
         CAST(FLOOR(coords[u.i].x * 1000000) AS BIGINT) AS x,
         CAST(FLOOR(coords[u.i].y * 1000000) AS BIGINT) AS y,
         len(coords) AS nv
  FROM read_parquet('{roads_pq}'),
       UNNEST(generate_series(1, len(coords))) AS u(i)
),
pairs AS (
  SELECT a.road_id AS ra, b.road_id AS rb
  FROM first a JOIN first b USING (cell)
  WHERE a.road_id < b.road_id
),
cost AS MATERIALIZED (
  SELECT p.ra, p.rb, va.i AS i, vb.i AS j,
         (va.x - vb.x) * (va.x - vb.x)
           + (va.y - vb.y) * (va.y - vb.y) AS dsq,
         va.nv AS na, vb.nv AS nb
  FROM pairs p
  JOIN verts va ON va.road_id = p.ra
  JOIN verts vb ON vb.road_id = p.rb
),
moves AS MATERIALIZED (
  SELECT ra, rb, i, j, i AS i2, j AS j2, CAST(0 AS BIGINT) AS mc
  FROM cost
  UNION ALL
  SELECT p.ra, p.rb, p.i, p.j, c.i, c.j, c.dsq
  FROM cost p JOIN cost c ON c.ra = p.ra AND c.rb = p.rb
   AND ((c.i = p.i + 1 AND c.j = p.j)
        OR (c.i = p.i AND c.j = p.j + 1)
        OR (c.i = p.i + 1 AND c.j = p.j + 1))),
b0 AS (SELECT ra, rb, i, j, dsq AS cost FROM cost WHERE i = 1 AND j = 1)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
b{k} AS MATERIALIZED (
  SELECT m.ra, m.rb, m.i2 AS i, m.j2 AS j,
         CAST(MIN(GREATEST(b.cost, m.mc)) AS BIGINT) AS cost
  FROM b{k - 1} b JOIN moves m
    ON m.ra = b.ra AND m.rb = b.rb AND m.i = b.i AND m.j = b.j
  GROUP BY 1, 2, 3, 4)""")
    parts.append(f"""
SELECT b.ra, b.rb, CAST(c.na AS INT) AS n_a, CAST(c.nb AS INT) AS n_b,
       b.cost AS f_sq,
       CAST(FLOOR(SQRT(CAST(b.cost AS DOUBLE))) AS BIGINT) AS f_micro
FROM b{rounds} b
JOIN (SELECT DISTINCT ra, rb, na, nb FROM cost) c
  ON c.ra = b.ra AND c.rb = b.rb
WHERE b.i = c.na AND b.j = c.nb""")
    return "".join(parts)


def _centroid_sql() -> str:
    from .harness import edges_values_sql_indexed

    return CENTROID_SQL.format(edges=edges_values_sql_indexed())


ORACLES_R5C["country_centroids"] = _centroid_sql()


def _dtw_sql() -> str:
    """DTW as shortest path on the banded lattice DAG: Bellman-Ford
    unrolled 2*(28-1) rounds, each round ONE join against a moves
    relation that includes zero-weight SELF-LOOPS (so every round
    references only the previous round once — the
    shortest_path_weighted technique).  The engine runs a genuinely
    different algorithm (row-by-column DP kernel); both are exact
    BIGINT min-plus, so equality is bit-level."""
    from .queries_r5c import _DTW_BAND, _DTW_DAYS

    rounds = 2 * (_DTW_DAYS - 1)
    parts = [f"""
WITH ev AS (
  SELECT event_type AS t,
         CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
st AS (SELECT MIN(day) AS d0 FROM ev),
dd AS MATERIALIZED (
  SELECT LEAST({_DTW_DAYS}, CAST(MAX(day - d0) AS INT) + 1) AS nd
  FROM ev, st),
daily AS (
  SELECT t, day - d0 AS d, CAST(SUM(cents) AS BIGINT) AS v
  FROM ev, st WHERE day - d0 < {_DTW_DAYS} GROUP BY 1, 2),
types AS (SELECT DISTINCT t FROM daily),
grid AS MATERIALIZED (
  SELECT ty.t, g.d, COALESCE(da.v, CAST(0 AS BIGINT)) AS v
  FROM types ty CROSS JOIN dd
       CROSS JOIN UNNEST(range(0, dd.nd)) AS g(d)
  LEFT JOIN daily da ON da.t = ty.t AND da.d = g.d),
base AS (SELECT d, v FROM grid WHERE t = 'view'),
cost AS MATERIALIZED (
  SELECT a.t, a.d AS i, b.d AS j, ABS(a.v - b.v) AS c
  FROM grid a JOIN base b ON ABS(a.d - b.d) <= {_DTW_BAND}
  WHERE a.t <> 'view'),
moves AS MATERIALIZED (
  SELECT t, i, j, i AS i2, j AS j2, CAST(0 AS BIGINT) AS mc FROM cost
  UNION ALL
  SELECT p.t, p.i, p.j, c.i, c.j, c.c
  FROM cost p JOIN cost c ON c.t = p.t
   AND ((c.i = p.i + 1 AND c.j = p.j)
        OR (c.i = p.i AND c.j = p.j + 1)
        OR (c.i = p.i + 1 AND c.j = p.j + 1))),
b0 AS (SELECT t, i, j, c AS cost FROM cost WHERE i = 0 AND j = 0)"""]
    for k in range(1, rounds + 1):
        # every round MATERIALIZED: a 54-deep inlined chain blows up
        # DuckDB's planner (measured: >2 min at sf0.001 inlined,
        # sub-second materialized)
        parts.append(f""",
b{k} AS MATERIALIZED (
  SELECT m.t, m.i2 AS i, m.j2 AS j,
         CAST(MIN(b.cost + m.mc) AS BIGINT) AS cost
  FROM b{k - 1} b JOIN moves m
    ON m.t = b.t AND m.i = b.i AND m.j = b.j
  GROUP BY 1, 2, 3)""")
    parts.append(f"""
SELECT t AS event_type, CAST(dd.nd AS INT) AS n_days, cost AS dtw_cost
FROM b{rounds}, dd WHERE i = dd.nd - 1 AND j = dd.nd - 1""")
    return "".join(parts)


ORACLES_R5C["events_dtw"] = _dtw_sql()


def _resample_sql(roads_pq: str) -> str:
    """roads_resample_points twin: identical running-window fold and
    interpolation text over the same roads parquet (DuckDB windows +
    generate_series in place of posexplode/explode)."""
    return f"""
WITH verts AS (
  SELECT road_id, kind, u.i - 1 AS i, coords[u.i].x AS x, coords[u.i].y AS y
  FROM read_parquet('{roads_pq}'),
       UNNEST(generate_series(1, len(coords))) AS u(i)
),
seg AS (
  SELECT road_id, kind, i, x, y,
         LEAD(x) OVER (PARTITION BY road_id ORDER BY i) AS x2,
         LEAD(y) OVER (PARTITION BY road_id ORDER BY i) AS y2
  FROM verts
  QUALIFY x2 IS NOT NULL
),
sl AS (
  SELECT *, SQRT((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)) AS slen
  FROM seg
),
cums AS (
  SELECT *,
         SUM(slen) OVER (PARTITION BY road_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(slen) OVER (PARTITION BY road_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - slen AS start,
         SUM(slen) OVER (PARTITION BY road_id) AS total
  FROM sl
),
picks AS (
  SELECT kind, CAST(g.k AS INT) AS k,
         CAST(FLOOR((x + ((total * g.k / 8.0 - start) / slen)
              * (x2 - x)) * 1000000 + 0.5) AS BIGINT) AS ux,
         CAST(FLOOR((y + ((total * g.k / 8.0 - start) / slen)
              * (y2 - y)) * 1000000 + 0.5) AS BIGINT) AS uy
  FROM cums, UNNEST(generate_series(1, 7)) AS g(k)
  WHERE total > 0 AND start <= total * g.k / 8.0
    AND total * g.k / 8.0 < cum
)
SELECT kind, k, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(ux) AS BIGINT) AS sum_ux,
       CAST(SUM(uy) AS BIGINT) AS sum_uy
FROM picks GROUP BY 1, 2
"""


def _betweenness_sql(roads_pq: str) -> str:
    """Integer-floor Brandes as a generated UNROLLED CTE chain: the
    sigma layers s0..s12 and delta layers d12..d1 each reference only
    the previous chain member once (the shortest_path_weighted lesson);
    the multi-referenced bases (edges, BFS hop labels, each sigma
    layer) are AS MATERIALIZED so DuckDB cannot re-inline them per
    round.  Identical recurrence and FLOOR-division text as the
    engine's layered DataFrame rounds."""
    from .queries_r5 import _BFS_NODE
    from .queries_r5c import _BC_HOPS, _BC_SEEDS

    node = _BFS_NODE.format(x="c.x", y="c.y")
    parts = [f"""
WITH RECURSIVE
nds AS (SELECT list_transform(coords, c -> {node}) AS nds
        FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM ab
        UNION ALL SELECT b AS src, a AS dst FROM ab)
      WHERE src <> dst),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
seeds AS (SELECT src AS seed FROM deg
          ORDER BY deg DESC, src ASC LIMIT {_BC_SEEDS}),
walk(seed, node, hops) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION
  SELECT w.seed, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {_BC_HOPS}
),
lab AS MATERIALIZED (SELECT seed, node, MIN(hops) AS hops
                     FROM walk GROUP BY 1, 2),
s0 AS MATERIALIZED (SELECT seed, seed AS node, CAST(1 AS BIGINT) AS sigma
                    FROM seeds)"""]
    for d in range(1, _BC_HOPS + 1):
        parts.append(f""",
s{d} AS MATERIALIZED (
  SELECT w.seed, e.dst AS node, CAST(SUM(w.sigma) AS BIGINT) AS sigma
  FROM s{d - 1} w JOIN e ON e.src = w.node
  JOIN lab l ON l.seed = w.seed AND l.node = e.dst AND l.hops = {d}
  GROUP BY 1, 2)""")
    parts.append(f""",
d{_BC_HOPS} AS MATERIALIZED (
  SELECT seed, node, sigma, CAST(0 AS BIGINT) AS delta
  FROM s{_BC_HOPS})""")
    for d in range(_BC_HOPS - 1, 0, -1):
        parts.append(f""",
d{d} AS MATERIALIZED (
  SELECT v.seed, v.node, v.sigma,
         CAST(COALESCE(SUM((v.sigma * (1000000 + w.delta)) // w.sigma), 0)
              AS BIGINT) AS delta
  FROM s{d} v
  LEFT JOIN e ON e.src = v.node
  LEFT JOIN d{d + 1} w ON w.seed = v.seed AND w.node = e.dst
  GROUP BY 1, 2, 3)""")
    unions = "\nUNION ALL ".join(
        f"SELECT seed, node, delta FROM d{d}"
        for d in range(1, _BC_HOPS + 1)
    )
    parts.append(f""",
alld AS ({unions}),
bc AS (SELECT node, CAST(SUM(delta) AS BIGINT) AS bc_micros,
              CAST(COUNT(*) AS BIGINT) AS n_seeds
       FROM alld GROUP BY 1),
rk AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY bc_micros DESC, node)
                   AS INT) AS rk, node, bc_micros, n_seeds
       FROM bc)
SELECT rk, node, bc_micros, n_seeds FROM rk WHERE rk <= 10""")
    return "".join(parts)


def fixture_oracles_r5c() -> dict[str, str]:
    """Lazily-built oracles that embed the absolute sf0.01 fixture path
    (building them at import time would trigger fixture generation on
    every import — the image_oracles precedent)."""
    from .jobs.rai import fixture_dir

    fdir = fixture_dir(0.01)
    roads = os.path.join(fdir, "roads.parquet").replace("'", "''")
    img = os.path.join(fdir, "images.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    out = {
        # image_tpi_tri / image_flow_length: committed INDEPENDENT
        # goldens (generator pixels + np.ix_ gathers / memoized chain
        # walks — see scripts/make_goldens.py), restricted to the same
        # harness subset/fmt filter so the fixture join stays
        # load-bearing.  All int64 — exact parity.
        "image_tpi_tri": f"""
SELECT g.image_id, g.n_px, g.sum_tri, g.max_tri, g.n_ridge,
       g.n_valley, g.chk
FROM read_parquet('{gdir}/tpi_tri_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_flow_length": f"""
SELECT g.image_id, g.n_px, g.n_sinks, g.sum_len, g.max_len, g.chk
FROM read_parquet('{gdir}/flow_length_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_box_downscale": f"""
SELECT g.image_id, g.n_out, g.sum_ds, g.max_ds, g.min_ds, g.chk
FROM read_parquet('{gdir}/box_downscale_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_median3": f"""
SELECT g.image_id, g.n_px, g.sum_med, g.n_changed, g.max_absdiff, g.chk
FROM read_parquet('{gdir}/median3_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "roads_resample_points": _resample_sql(roads),
    }
    out["betweenness_roads"] = _betweenness_sql(roads)
    out["roads_frechet"] = _frechet_sql(roads)
    out["roads_hausdorff"] = f"""
WITH first AS (
  SELECT road_id,
         COALESCE(CAST(FLOOR(coords[1].x * 10) AS BIGINT) * 100000
                  + CAST(FLOOR(coords[1].y * 10) AS BIGINT), -1) AS cell
  FROM read_parquet('{roads}')
),
verts AS (
  SELECT road_id, i,
         CAST(FLOOR(coords[i].x * 1000000) AS BIGINT) AS x,
         CAST(FLOOR(coords[i].y * 1000000) AS BIGINT) AS y
  FROM read_parquet('{roads}'),
       UNNEST(range(1, len(coords) + 1)) AS r(i)
),
pairs AS (
  SELECT a.road_id AS ra, b.road_id AS rb
  FROM first a JOIN first b USING (cell)
  WHERE a.road_id < b.road_id
),
ab AS (
  SELECT p.ra, p.rb, va.i AS ai,
         (va.x - vb.x) * (va.x - vb.x)
           + (va.y - vb.y) * (va.y - vb.y) AS dsq
  FROM pairs p
  JOIN verts va ON va.road_id = p.ra
  JOIN verts vb ON vb.road_id = p.rb
),
minb AS (
  SELECT ra, rb, ai, CAST(MIN(dsq) AS BIGINT) AS min_dsq
  FROM ab GROUP BY 1, 2, 3
)
SELECT ra, rb, CAST(COUNT(*) AS BIGINT) AS n_a,
       CAST(MAX(min_dsq) AS BIGINT) AS h_sq,
       CAST(FLOOR(SQRT(CAST(MAX(min_dsq) AS DOUBLE))) AS BIGINT) AS h_micro
FROM minb GROUP BY 1, 2
"""
    return out
