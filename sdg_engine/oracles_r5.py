"""DuckDB oracles for queries_r5.py.

Shared scalar fragments (_hll_steps, _BM25_IDF/_BM25_PART, node
quantization) are imported from queries_r5 so the two engines execute
textually identical arithmetic; the surrounding relational plumbing is
written independently in each dialect (UNNEST/list_transform here vs
explode/transform there).
"""

from __future__ import annotations

from .harness import AX, AY, BX, BY
from .queries_r5 import (
    _BM25_IDF,
    _BM25_PART,
    _BM25_TERMS,
    _BM25_TOPK,
    _HLL_M,
    _HLL_NUM,
    _PR_DAMP,
    _PR_ITERS,
    _PR_NODE_A,
    _PR_NODE_B,
    _PR_UNIT,
    _RET_EPOCH_US,
    _RET_WEEK_US,
    _WS_K,
    _WS_PRI_SQL,
    _b12_cells,
    _hll_steps,
)

EVENTS_ASOF_JOIN = """
WITH w AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
         last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
           OVER prior_w AS view_event_id,
         last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
           OVER prior_w AS view_value,
         last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END IGNORE NULLS)
           OVER prior_w AS view_us
  FROM events
  WINDOW prior_w AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
       COALESCE(view_event_id, -1) AS view_event_id,
       COALESCE(view_value, -1.0) AS view_value,
       COALESCE(CAST(ts_us - view_us AS BIGINT), -1) AS gap_us
FROM w WHERE event_type = 'click'
"""

EVENTS_FUNNEL = """
WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
t1 AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN us END) AS t1
  FROM ev GROUP BY user_id
),
t2 AS (
  SELECT ev.user_id, t1,
         MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END) AS t2
  FROM ev JOIN t1 USING (user_id) GROUP BY ev.user_id, t1
),
t3 AS (
  SELECT ev.user_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END) AS t3
  FROM ev JOIN t2 USING (user_id) GROUP BY ev.user_id, t1, t2
),
staged AS (
  SELECT user_id,
         CAST(CASE WHEN t3 IS NOT NULL THEN 3
                   WHEN t2 IS NOT NULL THEN 2
                   WHEN t1 IS NOT NULL THEN 1
                   ELSE 0 END AS INT) AS stage
  FROM t3
)
SELECT stage, COUNT(*) AS n_users,
       MIN(user_id) AS min_user, MAX(user_id) AS max_user
FROM staged GROUP BY stage
"""

_HLL_SHINGLES_DUCK = """
  SELECT UNNEST(list_transform(
           generate_series(1, GREATEST(len(t) - 2, 1)),
           i -> t[i] || ' ' || t[LEAST(i + 1, len(t))] || ' ' ||
                t[LEAST(i + 2, len(t))])) AS s
  FROM (SELECT string_split(text, ' ') AS t FROM documents)
"""

_HLL_BUCKET, _HLL_RHO = _hll_steps("h")

HLL_DISTINCT = f"""
WITH sh AS (SELECT md5(s) AS h FROM ({_HLL_SHINGLES_DUCK})),
br AS (SELECT {_HLL_BUCKET}, {_HLL_RHO} FROM sh),
regs AS (SELECT bucket, MAX(rho) AS m FROM br GROUP BY bucket),
sk AS (
  SELECT COUNT(*) AS n_regs,
         CAST(SUM(m) AS BIGINT) AS sum_rho,
         CAST(SUM(CAST(1 AS BIGINT) << CAST(53 - m AS INT)) AS BIGINT) AS s_part
  FROM regs
),
ex AS (SELECT COUNT(DISTINCT h) AS exact_distinct FROM sh),
est AS (
  SELECT n_regs, sum_rho,
         CAST(FLOOR({_HLL_NUM} / CAST(s_part +
              ({_HLL_M} - n_regs) * (CAST(1 AS BIGINT) << 53) AS DOUBLE))
              AS BIGINT) AS est_hll,
         exact_distinct
  FROM sk, ex
)
SELECT n_regs, sum_rho, est_hll, exact_distinct,
       CAST(FLOOR(ABS(est_hll - exact_distinct) * 10000.0
            / CAST(exact_distinct AS DOUBLE)) AS BIGINT) AS err_bp
FROM est
"""


def _pr_base_ctes() -> list[str]:
    """The (e, ew, deg, nodes, nn, p0) PageRank preamble over an `ab`
    pair CTE — shared by every unrolled-PageRank oracle."""
    return [
        "e AS (SELECT a AS src, b AS dst FROM ab UNION ALL SELECT b AS src, a AS dst FROM ab)",
        "ew AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w FROM e GROUP BY src, dst)",
        "deg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg FROM ew GROUP BY src)",
        "nodes AS (SELECT src AS node FROM deg)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"p0 AS (SELECT node, CAST(FLOOR({_PR_UNIT}.0 / CAST(n AS DOUBLE)) AS BIGINT)"
        " AS pr FROM nodes, nn)",
    ]


def _pr_round_ctes() -> list[str]:
    """One (contrib, rank) CTE pair per iteration — the identical
    integer recurrence as queries_r5.pagerank."""
    base = (
        f"CAST(FLOOR({_PR_UNIT // 100 * (100 - _PR_DAMP)}.0 / CAST(n AS DOUBLE)) AS BIGINT)"
    )
    ctes = []
    for i in range(1, _PR_ITERS + 1):
        ctes.append(
            f"c{i} AS (SELECT ew.dst AS dst, CAST(SUM(CAST(FLOOR(CAST(pr AS DOUBLE)"
            " / CAST(outdeg AS DOUBLE)) AS BIGINT) * w) AS BIGINT) AS s"
            f" FROM ew JOIN deg USING (src) JOIN p{i - 1} ON p{i - 1}.node = ew.src"
            " GROUP BY ew.dst)"
        )
        ctes.append(
            f"p{i} AS (SELECT node, {base}"
            f" + CAST(FLOOR({_PR_DAMP}.0 * CAST(COALESCE(s, 0) AS DOUBLE) / 100.0)"
            f" AS BIGINT) AS pr FROM nodes LEFT JOIN c{i} ON c{i}.dst = nodes.node, nn)"
        )
    return ctes


def _pagerank_roads_sql() -> str:
    """Unrolled-CTE PageRank over the quantized road graph."""
    ctes = [
        f"segs AS (SELECT {AX} AS ax, {AY} AS ay, {BX} AS bx, {BY} AS byy FROM supplier)",
        f"ab AS (SELECT {_PR_NODE_A} AS a, {_PR_NODE_B} AS b FROM segs)",
    ] + _pr_base_ctes() + _pr_round_ctes()
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, pr FROM p{_PR_ITERS}"


def _textrank_sql() -> str:
    """Unrolled-CTE PageRank over the word co-occurrence graph (same
    recurrence CTEs as the roads variant — only the `ab` base
    differs), top-15 ranking window over the vocab-sized result."""
    ctes = [
        "toks AS (SELECT string_split(text, ' ') AS ws FROM documents)",
        "ab AS (SELECT ws[i] AS a, ws[i + 1] AS b FROM toks,"
        " UNNEST(generate_series(1, len(ws) - 1)) AS u(i)"
        " WHERE ws[i] <> ws[i + 1])",
    ] + _pr_base_ctes() + _pr_round_ctes()
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT word, pr, rnk FROM (
  SELECT node AS word, pr,
         CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, node) AS INT) AS rnk
  FROM p{_PR_ITERS}
) WHERE rnk <= 15""")


# WAP: after publish, ref readers see the full table; pre-publish they
# saw only snapshot 1 (doc_id < 300); the published head is snapshot 2
SNAPSHOT_WAP_PUBLISH = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE doc_id < 300) AS n_before_publish,
       CAST(2 AS INT) AS published_snap
FROM documents GROUP BY lang
"""


_BM25_IN = ", ".join(f"'{t}'" for t in _BM25_TERMS)

BM25_TOP_DOCS = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
qt AS (SELECT * FROM toks WHERE tok IN ({_BM25_IN})),
tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM qt GROUP BY doc_id, tok),
dfq AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM qt GROUP BY tok),
j AS (
  SELECT tf.doc_id AS doc_id, tf.tf AS tf, dl.dl AS dl, dfq.df AS df,
         corpus.n_docs AS n_docs, corpus.sum_dl AS sum_dl
  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok) CROSS JOIN corpus
),
ji AS (SELECT *, {_BM25_IDF} AS idf FROM j),
parts AS (SELECT doc_id, {_BM25_PART} AS part FROM ji),
scored AS (
  SELECT doc_id, CAST(SUM(part) AS BIGINT) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM parts GROUP BY doc_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
  FROM scored
)
SELECT CAST(rnk AS INT) AS rnk, doc_id, score, n_terms
FROM ranked WHERE rnk <= {_BM25_TOPK}
"""

SAMPLE_WEIGHTED = """
WITH p AS (SELECT doc_id, n_chars, {pri} AS priority FROM documents),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY priority ASC, doc_id ASC) AS rnk
  FROM p
)
SELECT CAST(rnk AS INT) AS rnk, doc_id, n_chars, priority
FROM ranked WHERE rnk <= {k}
""".format(pri=_WS_PRI_SQL, k=_WS_K)

EVENTS_RETENTION = """
WITH ev AS (
  SELECT user_id,
         CAST(FLOOR((epoch_us(ts) - {e}) / {w}.0) AS BIGINT) AS wk
  FROM events
),
first AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY user_id),
act AS (
  SELECT DISTINCT ev.user_id, cohort_week, wk - cohort_week AS week_offset
  FROM ev JOIN first USING (user_id)
)
SELECT cohort_week, week_offset, COUNT(*) AS n_users
FROM act GROUP BY cohort_week, week_offset
""".format(e=_RET_EPOCH_US, w=_RET_WEEK_US)

PIVOT_ORDERS_STATUS = """
WITH o AS (
  SELECT EXTRACT(month FROM o_orderdate) AS m, o_orderstatus AS st,
         CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT) AS rev_mils
  FROM orders
)
SELECT CAST(m AS INT) AS m,
       CAST(SUM(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(SUM(CASE WHEN st = 'O' THEN rev_mils ELSE 0 END) AS BIGINT) AS rev_o,
       CAST(SUM(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(SUM(CASE WHEN st = 'F' THEN rev_mils ELSE 0 END) AS BIGINT) AS rev_f,
       CAST(SUM(CASE WHEN st = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
       CAST(SUM(CASE WHEN st = 'P' THEN rev_mils ELSE 0 END) AS BIGINT) AS rev_p
FROM o GROUP BY m
"""

from .queries_r5 import _PMI_LIFT, _PMI_TOPK  # noqa: E402

PMI_BIGRAMS = f"""
WITH toks AS (
  SELECT w[i] AS x, w[i + 1] AS y
  FROM (SELECT string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, len(w) - 1)) AS u(i)
),
big AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS f_xy FROM toks GROUP BY x, y),
ux AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS f_x FROM toks GROUP BY x),
uy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS f_y FROM toks GROUP BY y),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_big FROM toks),
lifted AS (
  SELECT big.x, big.y, f_xy, {_PMI_LIFT} AS lift
  FROM big JOIN ux USING (x) JOIN uy USING (y) CROSS JOIN nb
  WHERE f_xy >= 5
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, x ASC, y ASC) AS rnk
  FROM lifted
)
SELECT CAST(rnk AS INT) AS rnk, x, y, f_xy, lift
FROM ranked WHERE rnk <= {_PMI_TOPK}
"""

EVENTS_OUTLIERS = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v
  FROM events
),
st AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s1,
         CAST(SUM(v * v) AS BIGINT) AS s2
  FROM ev GROUP BY event_type
),
scored AS (
  SELECT ev.event_type, event_id, v,
         CAST(FLOOR(ABS(CAST(v AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(s1 AS DOUBLE)) * 10000.0 / (CAST(n AS DOUBLE)
              * SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))))
              AS BIGINT) AS z_bp
  FROM ev JOIN st USING (event_type)
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN z_bp > 30000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       CAST(FLOOR(MAX(z_bp * 10000000 + event_id) / 10000000.0) AS BIGINT)
         AS max_z_bp,
       CAST(MAX(z_bp * 10000000 + event_id) % 10000000 AS BIGINT)
         AS extreme_event
FROM scored GROUP BY event_type
"""

STREAMING_LEFT_JOIN = """
WITH c AS (
  SELECT user_id AS cu, event_id AS click_id, ts AS cts
  FROM events
  WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-09 00:00:00'
),
v AS (
  SELECT user_id AS vu, event_id AS view_id, ts AS vts
  FROM events WHERE event_type = 'view'
),
j AS (
  SELECT cu, click_id, view_id
  FROM c LEFT JOIN v
    ON vu = cu AND vts >= cts - INTERVAL 30 MINUTE AND vts <= cts
)
SELECT cu AS user_id, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN view_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unmatched,
       CAST(SUM(COALESCE(view_id, -1)) AS BIGINT) AS sum_view
FROM j GROUP BY cu
"""

SNAPSHOT_DIFF = """
SELECT 'added' AS change, COUNT(*) AS n_rows,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids
FROM documents WHERE doc_id >= 300 AND doc_id < 400
UNION ALL
SELECT 'removed', COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents WHERE doc_id < 100
UNION ALL
SELECT 'unchanged', COUNT(*), CAST(SUM(doc_id) AS BIGINT)
FROM documents WHERE doc_id >= 100 AND doc_id < 300
"""


def _grid_idw_sql() -> str:
    from .harness import PX, PY
    from .queries_r5 import _IDW_CELL, _IDW_DEG, _IDW_LEVEL, _IDW_RADIUS_M, _IDW_W
    from .sqlgen import grid_index_expr

    return f"""
WITH pts AS (
  SELECT {PX} AS px, {PY} AS py,
         CAST((o_orderkey % 1000) * 1000 AS BIGINT) AS v_mils
  FROM orders
),
g AS (
  SELECT *, {grid_index_expr(f"px - {_IDW_DEG}", _IDW_LEVEL)} AS ix0,
         {grid_index_expr(f"px + {_IDW_DEG}", _IDW_LEVEL)} AS ix1,
         {grid_index_expr(f"py - {_IDW_DEG}", _IDW_LEVEL)} AS iy0,
         {grid_index_expr(f"py + {_IDW_DEG}", _IDW_LEVEL)} AS iy1
  FROM pts
),
cand AS (
  SELECT px, py, v_mils, u1.ix AS ix, u2.iy AS iy,
         (CAST(0 AS DOUBLE) + (CAST(u1.ix AS DOUBLE) + 0.5)
          * CAST({_IDW_CELL} AS DOUBLE)) AS lon,
         (CAST(0 AS DOUBLE) + (CAST(u2.iy AS DOUBLE) + 0.5)
          * CAST({_IDW_CELL} AS DOUBLE)) AS lat
  FROM g, UNNEST(generate_series(ix0, ix1)) AS u1(ix),
       UNNEST(generate_series(iy0, iy1)) AS u2(iy)
),
d AS (
  SELECT ix, iy, v_mils,
         (SQRT(((lon - px) * (lon - px)) + ((lat - py) * (lat - py)))
          * CAST(111320 AS DOUBLE)) AS dist_m
  FROM cand
),
w AS (
  SELECT ix, iy, v_mils, {_IDW_W} AS w
  FROM d WHERE dist_m <= CAST({_IDW_RADIUS_M!r} AS DOUBLE)
)
SELECT ix, iy, COUNT(*) AS n_pts,
       CAST(FLOOR(CAST(CAST(SUM(w * v_mils) AS BIGINT) AS DOUBLE)
            / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE)) AS BIGINT) AS idw_mils
FROM w GROUP BY ix, iy
"""


FUZZY_NAME_PAIRS = """
WITH p AS (
  SELECT p_partkey AS k, p_name AS nm,
         string_split(p_name, ' ')[-1] AS blk
  FROM part
),
pairs AS (
  SELECT a.blk, levenshtein(a.nm, b.nm) AS d, a.k AS ka, b.k AS kb
  FROM p a JOIN p b ON a.blk = b.blk AND a.k < b.k
)
SELECT blk, CAST(d AS INT) AS d, COUNT(*) AS n_pairs,
       CAST(SUM(ka + kb) AS BIGINT) AS sum_keys
FROM pairs WHERE d BETWEEN 1 AND 3 GROUP BY blk, d
"""

EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n
FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
"""

CUSTOMER_GINI = """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(FLOOR(o_totalprice * 1000 + 0.5) AS BIGINT)) AS BIGINT)
           AS x
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x ASC, o_custkey ASC) AS BIGINT)
           AS i
  FROM per
)
SELECT COUNT(*) AS n_customers, CAST(SUM(x) AS BIGINT) AS total_mils,
       CAST(FLOOR((2.0 * CAST(CAST(SUM(i * x) AS BIGINT) AS DOUBLE)
            - (CAST(COUNT(1) AS DOUBLE) + 1.0)
            * CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE)) * 10000.0
            / (CAST(COUNT(1) AS DOUBLE)
            * CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE))) AS BIGINT) AS gini_bp
FROM ranked
"""


def _morans_i_sql() -> str:
    from .harness import PX, PY
    from .queries_r5 import _MI_LEVEL
    from .sqlgen import grid_index_expr

    return f"""
WITH pts AS (
  SELECT {grid_index_expr(PX, _MI_LEVEL)} AS ix,
         {grid_index_expr(PY, _MI_LEVEL)} AS iy
  FROM orders
),
cells AS (SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY ix, iy),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
        FROM cells),
dev AS (SELECT ix, iy, n * c - s AS d, n FROM cells, tot),
nb AS (
  SELECT ix + o.dx AS ix, iy + o.dy AS iy, d AS d_j
  FROM dev, (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
pairs AS (SELECT dev.d AS d, nb.d_j AS d_j FROM dev JOIN nb USING (ix, iy)),
den AS (SELECT MAX(n) AS n_cells, CAST(SUM(d * d) AS BIGINT) AS sdd FROM dev),
num AS (SELECT COUNT(*) AS w_edges, CAST(SUM(d * d_j) AS BIGINT) AS swdd
        FROM pairs)
SELECT n_cells, w_edges,
       CAST(FLOOR(CAST(n_cells AS DOUBLE) * CAST(swdd AS DOUBLE) * 10000.0
            / (CAST(w_edges AS DOUBLE) * CAST(sdd AS DOUBLE))) AS BIGINT)
         AS morans_i_bp
FROM den, num
"""


def _bloom_filter_join_sql() -> str:
    """Identical 4096-bit Bloom construction (shared _b12_cells md5
    fragments); membership probed via three LEFT JOINs to the 64-word
    table (DuckDB has no broadcast-map idiom) — same bits, same
    semantics.  Shift is `<<` here vs shiftleft() in Spark (gotcha 7:
    shift ops don't parse inside Spark function-call argument lists);
    both are exact BIGINT powers of two."""
    c1, c2, c3 = _b12_cells("h", 3)
    bit = "(CAST(1 AS BIGINT) << CAST({c} % 63 AS INT))"
    word = "CAST(FLOOR({c} / 64) AS INT)"
    hit = (
        f"((COALESCE(w{{j}}.m, CAST(0 AS BIGINT)) & "
        + bit.format(c="p.c{j}")
        + ") <> 0)"
    )
    return f"""
WITH seg AS (
  SELECT c_custkey AS k, md5(CAST(c_custkey AS STRING)) AS h
  FROM customer WHERE c_mktsegment = 'BUILDING'
),
cells AS (SELECT unnest([{c1}, {c2}, {c3}]) AS cell FROM seg),
words AS (
  SELECT {word.format(c='cell')} AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(cell % 63 AS INT)) AS m
  FROM cells GROUP BY 1
),
probe AS (
  SELECT o_orderstatus, o_custkey, md5(CAST(o_custkey AS STRING)) AS h
  FROM orders
),
pc AS (
  SELECT o_orderstatus, o_custkey,
         {c1} AS c1, {c2} AS c2, {c3} AS c3
  FROM probe
),
flags AS (
  SELECT p.o_orderstatus,
         ({hit.format(j=1)} AND {hit.format(j=2)} AND {hit.format(j=3)})
           AS pass_bloom,
         CASE WHEN s.k IS NULL THEN 0 ELSE 1 END AS is_true
  FROM pc p
  LEFT JOIN words w1 ON w1.w = {word.format(c='p.c1')}
  LEFT JOIN words w2 ON w2.w = {word.format(c='p.c2')}
  LEFT JOIN words w3 ON w3.w = {word.format(c='p.c3')}
  LEFT JOIN seg s ON s.k = p.o_custkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass_bloom,
       CAST(SUM(is_true) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN pass_bloom AND is_true = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       CAST(FLOOR(SUM(CASE WHEN pass_bloom AND is_true = 0 THEN 1 ELSE 0 END)
            * 10000.0
            / CAST(SUM(CASE WHEN is_true = 0 THEN 1 ELSE 0 END) AS DOUBLE))
            AS BIGINT) AS fp_bp
FROM flags GROUP BY o_orderstatus
"""


def _cms_heavy_hitters_sql() -> str:
    """Same d=4 x w=4096 Count-Min construction over the identical
    md5-chunk cells; posexplode becomes a 4-way UNION ALL (tiny: rows =
    vocabulary)."""
    c1, c2, c3, c4 = _b12_cells("h", 4)
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tc AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks WHERE tok <> '' GROUP BY tok
),
tch AS (SELECT tok, cnt, md5(tok) AS h FROM tc),
cells AS (
  SELECT tok, cnt, 0 AS j, {c1} AS cell FROM tch
  UNION ALL SELECT tok, cnt, 1, {c2} FROM tch
  UNION ALL SELECT tok, cnt, 2, {c3} FROM tch
  UNION ALL SELECT tok, cnt, 3, {c4} FROM tch
),
sketch AS (
  SELECT j, cell, CAST(SUM(cnt) AS BIGINT) AS sc FROM cells GROUP BY j, cell
),
est AS (
  SELECT c.tok, c.cnt, MIN(s.sc) AS est_cms
  FROM cells c JOIN sketch s ON s.j = c.j AND s.cell = c.cell
  GROUP BY c.tok, c.cnt
),
ranked AS (
  SELECT tok, cnt, est_cms,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rk
  FROM est
)
SELECT tok, CAST(rk AS INT) AS rk, cnt AS exact_cnt, est_cms,
       est_cms - cnt AS overestimate
FROM ranked WHERE rk <= 20
"""


def _kmv_set_similarity_sql() -> str:
    """Identical KMV construction: same 48-bit md5 hash (shared _h48
    fragment), same k, same union-sketch CASE when the true union is
    smaller than k."""
    from .queries_r5 import _H48_SCALE, _KMV_K, _h48

    h48 = _h48("hm")
    return f"""
WITH ev AS (
  SELECT DISTINCT event_type AS t, user_id AS u FROM events
),
ht AS (
  SELECT t, {h48} AS h
  FROM (SELECT t, md5(CAST(u AS STRING)) AS hm FROM ev)
),
sk AS (
  SELECT t, h FROM (
    SELECT t, h, ROW_NUMBER() OVER (PARTITION BY t ORDER BY h ASC) AS r
    FROM ht
  ) WHERE r <= {_KMV_K}
),
types AS (SELECT DISTINCT t FROM sk),
pairs AS (
  SELECT a.t AS ta, b.t AS tb FROM types a JOIN types b ON a.t < b.t
),
merged AS (
  SELECT COALESCE(a.ta, b.ta) AS ta, COALESCE(a.tb, b.tb) AS tb,
         COALESCE(a.h, b.h) AS h,
         CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS in_a,
         CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS in_b
  FROM (SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.ta) a
  FULL JOIN (SELECT p.ta, p.tb, s.h FROM pairs p JOIN sk s ON s.t = p.tb) b
    ON a.ta = b.ta AND a.tb = b.tb AND a.h = b.h
),
ku AS (
  SELECT * FROM (
    SELECT ta, tb, h, in_a, in_b,
           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h ASC) AS r
    FROM merged
  ) WHERE r <= {_KMV_K}
),
est0 AS (
  SELECT ta, tb, MAX(h) AS uk, COUNT(*) AS ks,
         SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS shared
  FROM ku GROUP BY ta, tb
),
est AS (
  SELECT ta, tb, shared, ks,
         CASE WHEN ks < {_KMV_K} THEN ks ELSE
           CAST(FLOOR({_KMV_K - 1} * CAST({_H48_SCALE} AS DOUBLE)
                / CAST(uk AS DOUBLE)) AS BIGINT) END AS est_union
  FROM est0
),
n AS (SELECT t, COUNT(*) AS n FROM ev GROUP BY t),
inter AS (
  SELECT a.t AS ta, b.t AS tb, COUNT(*) AS exact_inter
  FROM ev a JOIN ev b ON a.u = b.u AND a.t < b.t
  GROUP BY a.t, b.t
)
SELECT e.ta, e.tb,
       CAST(na.n + nb.n - i.exact_inter AS BIGINT) AS exact_union,
       CAST(e.est_union AS BIGINT) AS est_union,
       CAST(i.exact_inter AS BIGINT) AS exact_inter,
       CAST(FLOOR(CAST(e.shared AS DOUBLE) * CAST(e.est_union AS DOUBLE)
            / CAST(e.ks AS DOUBLE)) AS BIGINT) AS est_inter,
       CAST(FLOOR(CAST(e.shared AS DOUBLE) * 10000.0
            / CAST(e.ks AS DOUBLE)) AS BIGINT) AS est_jaccard_bp
FROM est e
JOIN inter i ON i.ta = e.ta AND i.tb = e.tb
JOIN n na ON na.t = e.ta
JOIN n nb ON nb.t = e.tb
"""


HIST_QUANTILES = """
WITH hist AS (
  SELECT CAST(FLOOR(FLOOR(o_totalprice * 100 + 0.5) / 819200) AS BIGINT)
           AS bin,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1
),
cum AS (
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
  SELECT p.pct, p.target_rank, MIN(c.bin) AS est_bin
  FROM pcts p JOIN cum c ON c.n_le >= p.target_rank
  GROUP BY p.pct, p.target_rank
)
SELECT CAST(h.pct AS INT) AS pct, h.target_rank, h.est_bin,
       h.est_bin * 819200 AS est_lo_cents,
       CAST(c.n_le AS BIGINT) AS n_le
FROM hit h JOIN cum c ON c.bin = h.est_bin
"""


EVENTS_ACF = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
stats AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM hourly),
dev AS (SELECT h, n * x - s AS d FROM hourly, stats),
den AS (SELECT SUM(d * d) AS den, COUNT(*) AS n_hours FROM dev),
pairs AS (
  SELECT l.lag, a.d AS d, b.d AS d2
  FROM (SELECT unnest([1, 2, 3]) AS lag) l
  JOIN dev a ON TRUE
  JOIN dev b ON b.h = a.h + l.lag
),
num AS (
  SELECT lag, SUM(d * d2) AS num, COUNT(*) AS n_pairs
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(FLOOR(CAST(num AS DOUBLE) * 10000.0
            / CAST(den AS DOUBLE)) AS BIGINT) AS acf_bp
FROM num, den
"""


EVENTS_GAPFILL = """
WITH hourly AS (
  SELECT event_type AS t,
         CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
grid AS (
  SELECT t, gs.h
  FROM (SELECT DISTINCT t FROM hourly),
       bounds, UNNEST(generate_series(h0, h1)) AS gs(h)
),
filled AS (
  SELECT g.t, g.h, hy.v,
         last_value(hy.v IGNORE NULLS) OVER (
           PARTITION BY g.t ORDER BY g.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
  FROM grid g LEFT JOIN hourly hy ON hy.t = g.t AND hy.h = g.h
)
SELECT t, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
       CAST(SUM(COALESCE(ff, 0)) AS BIGINT) AS sum_filled,
       CAST(SUM(COALESCE(v, 0)) AS BIGINT) AS sum_observed
FROM filled GROUP BY t
"""


# INDEPENDENT formulation: quadratic NOT-EXISTS dominance over the same
# collapsed (status, price) points — certifies the Spark window rewrite.
ORDERS_SKYLINE = """
WITH pts AS (
  SELECT o_orderstatus AS st,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c,
         MAX(epoch_us(o_orderdate)) AS date_us
  FROM orders GROUP BY 1, 2
),
sky AS (
  SELECT * FROM pts p
  WHERE NOT EXISTS (
    SELECT 1 FROM pts q
    WHERE q.st = p.st AND q.price_c < p.price_c AND q.date_us >= p.date_us
  )
)
SELECT st, CAST(COUNT(*) AS BIGINT) AS n_skyline,
       CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
       MIN(price_c) AS min_price_c, MAX(date_us) AS max_date_us
FROM sky GROUP BY st
"""


CUSUM_CHANGEPOINT = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
stats AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM hourly),
cus AS (
  SELECT h, n,
         SUM(n * x - s) OVER (ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM hourly, stats
),
pk AS (
  SELECT n, MAX(ABS(c) * 1048576 + (1048575 - h % 1048576)) AS packed
  FROM cus GROUP BY n
)
SELECT CAST(n AS BIGINT) AS n_hours,
       CAST(FLOOR(packed / 1048576) AS BIGINT) AS max_abs_cusum,
       CAST(1048575 - packed % 1048576 AS BIGINT) AS cp_hour_mod
FROM pk
"""


def _spw_sql(roads_pq: str, node: str) -> str:
    """Unrolled Bellman-Ford recurrence (PageRank precedent): the same
    weighted edges, 12 relaxation rounds as chained CTEs.  Each round
    references the previous CTE exactly ONCE — the keep-incumbent leg
    rides on zero-weight SELF-LOOPS in the edge set (the min-plus
    identity) instead of a second d{k} reference, because a
    twice-referenced chained CTE re-inlines the whole prefix per
    round: 2^rounds copies of the base plan (measured: the two-leg
    UNION form never finished; this form runs in milliseconds)."""
    from .queries_r5 import _SPW_ROUNDS

    w = (
        "CAST(FLOOR(SQRT(CAST((FLOOR(u / 1000) - FLOOR(v / 1000)) "
        "* (FLOOR(u / 1000) - FLOOR(v / 1000)) "
        "+ (u % 1000 - v % 1000) * (u % 1000 - v % 1000) AS DOUBLE)) "
        "* 1000) AS BIGINT)"
    )
    rounds = "".join(
        f""",
d{k + 1} AS (
  SELECT e.dst AS node, MIN(d{k}.d + e.w) AS d
  FROM d{k} JOIN e ON e.src = d{k}.node
  GROUP BY e.dst
)"""
        for k in range(_SPW_ROUNDS)
    )
    return f"""
WITH nds AS (SELECT list_transform(coords, c -> {node}) AS nds
             FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM ab WHERE a <> b),
wed AS (SELECT u, v, {w} AS w FROM und),
e0 AS (SELECT u AS src, v AS dst, w FROM wed
       UNION ALL SELECT v, u, w FROM wed),
nodes AS (SELECT DISTINCT src FROM e0),
e AS (SELECT src, dst, w FROM e0
      UNION ALL SELECT src, src, CAST(0 AS BIGINT) FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM e0 GROUP BY src),
d0 AS (SELECT src AS node, CAST(0 AS BIGINT) AS d
       FROM deg ORDER BY deg DESC, src ASC LIMIT 1){rounds}
SELECT CAST(FLOOR(d / 2000) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node,
       MIN(d) AS min_d, MAX(d) AS max_d
FROM d{_SPW_ROUNDS} GROUP BY band
"""


def _sinuosity_sql(roads_pq: str) -> str:
    """Identical sequential-fold path length (the route_interpolate
    running-sum window) over endpoint chord, micro-snap at the end."""
    return f"""
WITH r AS (SELECT road_id, kind, coords FROM read_parquet('{roads_pq}')),
verts AS (
  SELECT road_id, kind, u.i AS i,
         coords[u.i].x AS x, coords[u.i].y AS y
  FROM r, UNNEST(generate_series(1, len(coords))) AS u(i)
),
seg0 AS (
  SELECT road_id, i, x, y,
         lead(x) OVER (PARTITION BY road_id ORDER BY i) AS x2,
         lead(y) OVER (PARTITION BY road_id ORDER BY i) AS y2
  FROM verts
),
seg AS (
  SELECT road_id, i,
         SQRT((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)) AS slen
  FROM seg0 WHERE x2 IS NOT NULL
),
tot AS (
  SELECT road_id, MAX(cum) AS total FROM (
    SELECT road_id,
           SUM(slen) OVER (PARTITION BY road_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM seg
  ) GROUP BY 1
),
ends AS (
  SELECT road_id, kind,
         SQRT((coords[len(coords)].x - coords[1].x)
              * (coords[len(coords)].x - coords[1].x)
              + (coords[len(coords)].y - coords[1].y)
              * (coords[len(coords)].y - coords[1].y)) AS chord
  FROM r
),
per AS (
  SELECT e.kind,
         CAST(FLOOR(t.total / e.chord * 1000000 + 0.5) AS BIGINT)
           AS sin_micros
  FROM ends e JOIN tot t USING (road_id)
  WHERE e.chord > 0
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_roads,
       CAST(SUM(sin_micros) AS BIGINT) AS sum_sin_micros,
       CAST(MAX(sin_micros) AS BIGINT) AS max_sin_micros
FROM per GROUP BY 1
"""


def _route_interp_sql(roads_pq: str) -> str:
    """Identical lead/running-sum/half-open-pick construction; the
    running sum is a sequential ordered fold in both engines (gotcha 8:
    never a partial-agg double SUM)."""
    return f"""
WITH r AS (SELECT road_id, kind, coords FROM read_parquet('{roads_pq}')),
verts AS (
  SELECT road_id, kind, u.i AS i,
         coords[u.i].x AS x, coords[u.i].y AS y
  FROM r, UNNEST(generate_series(1, len(coords))) AS u(i)
),
seg0 AS (
  SELECT road_id, kind, i, x, y,
         lead(x) OVER (PARTITION BY road_id ORDER BY i) AS x2,
         lead(y) OVER (PARTITION BY road_id ORDER BY i) AS y2
  FROM verts
),
seg AS (
  SELECT road_id, kind, i, x, y, x2, y2,
         SQRT((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)) AS slen
  FROM seg0 WHERE x2 IS NOT NULL
),
cums AS (
  SELECT *,
         SUM(slen) OVER (PARTITION BY road_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM seg
),
tot AS (
  SELECT *, cum - slen AS strt,
         MAX(cum) OVER (PARTITION BY road_id) AS total
  FROM cums
),
mid AS (
  SELECT road_id, kind,
         CAST(FLOOR((x + ((total / 2 - strt) / slen) * (x2 - x))
              * 1000000 + 0.5) AS BIGINT) AS mid_ux,
         CAST(FLOOR((y + ((total / 2 - strt) / slen) * (y2 - y))
              * 1000000 + 0.5) AS BIGINT) AS mid_uy
  FROM tot
  WHERE total > 0 AND strt <= total / 2 AND total / 2 < cum
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_roads,
       CAST(SUM(mid_ux) AS BIGINT) AS sum_mid_ux,
       CAST(SUM(mid_uy) AS BIGINT) AS sum_mid_uy
FROM mid GROUP BY kind
"""


def _phrase_search_sql() -> str:
    from .queries_r5 import _PHRASES

    qa = " UNION ALL ".join(
        f"SELECT '{a} {b}' AS phrase, '{a}' AS ta, '{b}' AS tb"
        for a, b in _PHRASES
    )
    return f"""
WITH toks AS (
  SELECT doc_id, u.i - 1 AS pos, tk[u.i] AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       UNNEST(generate_series(1, len(tk))) AS u(i)
  WHERE tk[u.i] <> ''
),
qa AS ({qa}),
hits AS (
  SELECT q.phrase, a.doc_id, a.pos
  FROM toks a JOIN qa q ON a.tok = q.ta
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
             AND b.tok = q.tb
)
SELECT phrase, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(SUM(doc_id * 2 + pos) AS BIGINT) AS checksum
FROM hits GROUP BY phrase
"""


EVENTS_TREND = """
WITH daily AS (
  SELECT event_type AS t,
         CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
base AS (SELECT t, MIN(day) AS d0 FROM daily GROUP BY t),
fit AS (
  SELECT daily.t, COUNT(*) AS n,
         SUM(day - d0) AS sx, SUM(y) AS sy,
         SUM((day - d0) * y) AS sxy,
         SUM((day - d0) * (day - d0)) AS sxx
  FROM daily JOIN base ON base.t = daily.t
  GROUP BY daily.t
)
SELECT t, CAST(n AS BIGINT) AS n, CAST(sy AS BIGINT) AS total_events,
       CAST(FLOOR((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * 1000.0
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
         AS slope_milli_per_day
FROM fit
"""


DRIFT_CHISQ = """
WITH wt AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 604800000000) AS BIGINT) AS wk,
         event_type AS t, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT wk, SUM(o) AS rt FROM wt GROUP BY wk),
ct AS (SELECT t, SUM(o) AS ct FROM wt GROUP BY t),
nn AS (SELECT SUM(o) AS nn FROM wt),
cell AS (
  SELECT wt.wk, wt.t, o,
         CAST(FLOOR((CAST(o AS DOUBLE) * CAST(nn AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
              * (CAST(o AS DOUBLE) * CAST(nn AS DOUBLE)
              - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) * 1000000.0
              / (CAST(nn AS DOUBLE) * CAST(rt AS DOUBLE)
              * CAST(ct AS DOUBLE))) AS BIGINT) AS chi_part,
         o * nn - rt * ct AS excess,
         CAST(instr('cepsv', substring(wt.t, 1, 1)) AS BIGINT) AS tidx
  FROM wt JOIN rt ON rt.wk = wt.wk JOIN ct ON ct.t = wt.t, nn
),
pk AS (
  SELECT wk, SUM(chi_part) AS chisq_u, COUNT(*) AS n_types,
         MAX(excess * 8 + (7 - tidx)) AS packed
  FROM cell GROUP BY wk
)
SELECT wk, CAST(chisq_u AS BIGINT) AS chisq_u,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(7 - (packed - FLOOR(packed / 8) * 8) AS BIGINT) AS top_tidx
FROM pk
"""


MARKET_BASKET_BRANDS = """
WITH ob AS (
  SELECT DISTINCT l_orderkey AS o, p_brand AS brand
  FROM lineitem JOIN part ON p_partkey = l_partkey
),
nb AS (SELECT brand, COUNT(*) AS n_brand FROM ob GROUP BY brand),
no AS (SELECT COUNT(DISTINCT o) AS n_orders FROM ob),
pr AS (
  SELECT x.brand AS a, y.brand AS b, COUNT(*) AS n_both
  FROM ob x JOIN ob y ON x.o = y.o AND x.brand < y.brand
  GROUP BY 1, 2
)
SELECT a AS brand_a, b AS brand_b, CAST(n_both AS BIGINT) AS n_both,
  CAST(FLOOR(1000 * n_both / n_orders) AS BIGINT) AS support_milli,
  CAST(FLOOR(1000.0 * CAST(n_both AS DOUBLE) * CAST(n_orders AS DOUBLE)
       / (CAST(na.n_brand AS DOUBLE) * CAST(nbb.n_brand AS DOUBLE))) AS BIGINT)
    AS lift_milli
FROM pr JOIN nb na ON na.brand = pr.a JOIN nb nbb ON nbb.brand = pr.b, no
WHERE n_both >= 3
"""


# ROW_NUMBER twin of the two-level distributed rank: equal because
# (metric, ck) is a total order and the Spark bucket ids are monotone
# in the metric.
CUSTOMER_RFM = """
WITH per AS (
  SELECT o_custkey AS ck,
         MAX(CAST(FLOOR(epoch_us(o_orderdate) / 86400000000) AS BIGINT)) AS last_d,
         COUNT(*) AS freq,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS mon
  FROM orders GROUP BY 1
),
mx AS (SELECT MAX(last_d) AS maxd FROM per),
base AS (SELECT ck, maxd - last_d AS rec, freq, CAST(mon AS BIGINT) AS mon
         FROM per, mx),
nn AS (SELECT COUNT(*) AS n FROM base),
rk AS (
  SELECT ck, mon,
         ROW_NUMBER() OVER (ORDER BY rec, ck) AS r_rank,
         ROW_NUMBER() OVER (ORDER BY freq, ck) AS f_rank,
         ROW_NUMBER() OVER (ORDER BY mon, ck) AS m_rank
  FROM base
),
sc AS (
  SELECT mon,
         CAST(5 - (FLOOR(4 * (r_rank - 1) / n) + 1) AS BIGINT) AS r_score,
         CAST(FLOOR(4 * (f_rank - 1) / n) + 1 AS BIGINT) AS f_score,
         CAST(FLOOR(4 * (m_rank - 1) / n) + 1 AS BIGINT) AS m_score
  FROM rk, nn
)
SELECT r_score, f_score, m_score, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(mon) AS BIGINT) AS sum_cents
FROM sc GROUP BY 1, 2, 3
"""


BPE_MERGE_CANDIDATES = """
WITH words AS (
  SELECT w, COUNT(*) AS wf FROM (
    SELECT tk[u.i] AS w
    FROM (SELECT string_split(text, ' ') AS tk FROM documents),
         UNNEST(generate_series(1, len(tk))) AS u(i)
  ) WHERE w <> '' GROUP BY w
),
pairs AS (
  SELECT substring(w, CAST(g.i AS INT), 2) AS pair,
         CAST(SUM(wf) AS BIGINT) AS cnt
  FROM (SELECT w, wf FROM words WHERE length(w) >= 2),
       UNNEST(generate_series(1, length(w) - 1)) AS g(i)
  GROUP BY 1
),
rk AS (SELECT pair, cnt,
              ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rnk FROM pairs)
SELECT CAST(rnk AS INT) AS rnk, pair, cnt FROM rk WHERE rnk <= 20
"""


def _geohash_cells_sql() -> str:
    from .harness import PX, PY
    from .sqlgen import chain_select, geohash_steps

    base = (
        f"SELECT o_orderkey AS point_id, {PX} AS lon, {PY} AS lat FROM orders"
    )
    enc = chain_select(
        base, geohash_steps("lon", "lat", 6, "gh"), ["point_id", "gh", "gh_g"]
    )
    return f"""
WITH enc AS ({enc})
SELECT substring(gh, 1, 4) AS gh4, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(COUNT(DISTINCT gh) AS BIGINT) AS n_cells6,
       CAST(SUM(gh_g) AS BIGINT) AS checksum
FROM enc GROUP BY gh4
"""


CONTAMINATION_CHECK = """
WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sh0 AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(tk, CAST(g.i AS INT), CAST(g.i + 3 AS INT)), ' ') AS sh
  FROM (SELECT doc_id, tk FROM tk WHERE len(tk) >= 4),
       UNNEST(generate_series(1, len(tk) - 3)) AS g(i)
),
rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= 256),
shr AS (SELECT sh0.doc_id, sh0.sh FROM sh0 JOIN rare USING (sh)),
ev AS (SELECT doc_id AS eval_doc, sh FROM shr WHERE doc_id % 97 = 0),
tr AS (SELECT doc_id AS train_doc, sh FROM shr WHERE doc_id % 97 <> 0)
SELECT train_doc, eval_doc, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM tr JOIN ev USING (sh) GROUP BY 1, 2
"""


DATASET_MIX_WEIGHTS = """
WITH src AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000) AS BIGINT) AS w_m
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(w_m) AS sw, SUM(n_docs) AS nd FROM src)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
       CAST(FLOOR(1000000 * n_docs / nd) AS BIGINT) AS natural_ppm,
       CAST(FLOOR(1000000 * w_m / sw) AS BIGINT) AS temperature_ppm
FROM src, tot
"""


VOCAB_OOV_RATE = """
WITH toks AS (
  SELECT source, tk[u.i] AS w
  FROM (SELECT source, string_split(text, ' ') AS tk FROM documents),
       UNNEST(generate_series(1, len(tk))) AS u(i)
  WHERE tk[u.i] <> ''
),
tw AS (SELECT source, w, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
wc AS (SELECT w, SUM(cnt) AS tot FROM tw GROUP BY w),
vocab AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY tot DESC, w) AS rnk FROM wc
  ) WHERE rnk <= 1000
)
SELECT source, CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN vocab.w IS NULL THEN cnt ELSE 0 END) AS BIGINT)
         AS oov_tokens,
       CAST(FLOOR(1000000 * SUM(CASE WHEN vocab.w IS NULL THEN cnt ELSE 0 END)
            / SUM(cnt)) AS BIGINT) AS oov_ppm
FROM tw LEFT JOIN vocab ON vocab.w = tw.w
GROUP BY source
"""


def _hilbert_cells_sql() -> str:
    """15-layer single-reference CTE chain of the quadrant-rotation
    recurrence — linear in DuckDB (each layer materializes per row);
    the Spark side is the identical recurrence in numpy
    (cells.hilbert_d) because CollapseProject would inline this chain
    exponentially (x' and y' both reference x AND y)."""
    from .harness import PX, PY
    from .sqlgen import grid_index_expr

    layers = [
        f"l15 AS (SELECT o_orderkey AS point_id, "
        f"{grid_index_expr(PX, 15)} AS x, {grid_index_expr(PY, 15)} AS y, "
        f"CAST(0 AS BIGINT) AS d FROM orders)"
    ]
    prev = "l15"
    for k in range(14, -1, -1):
        s = 1 << k
        layers.append(
            f"""l{k} AS (
  SELECT point_id,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - y ELSE y END)
         ELSE x END AS x,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN {s - 1} - x ELSE x END)
         ELSE y END AS y,
    d + {s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0 WHEN rx = 0 THEN 1
                        WHEN ry = 1 THEN 2 ELSE 3 END) AS d
  FROM (SELECT point_id, x, y, d, (x >> {k}) & 1 AS rx, (y >> {k}) & 1 AS ry
        FROM {prev}) t{k})"""
        )
        prev = f"l{k}"
    with_sql = ",\n".join(layers)
    return f"""
WITH {with_sql}
SELECT (d >> 18) AS hbucket, CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(d) AS d_min, MAX(d) AS d_max, CAST(SUM(d) AS BIGINT) AS checksum
FROM l0 GROUP BY 1
"""


# sequential 8-element folds — the kmeans oracle's proven
# list_sum/list_transform twin of Spark's aggregate/zip_with
_PQ_D2_SC = (
    "list_sum(list_transform(generate_series(1, 8), "
    "i -> (s.sub[i] - c.cent[i]) * (s.sub[i] - c.cent[i])))"
)
_PQ_D2_QC = (
    "list_sum(list_transform(generate_series(1, 8), "
    "i -> (q.qsub[i] - c.cent[i]) * (q.qsub[i] - c.cent[i])))"
)

ANN_PQ_TOPK = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
sub AS (
  SELECT vec_id, ms.m AS m, list_slice(emb, ms.m * 8 + 1, ms.m * 8 + 8) AS sub
  FROM emb, UNNEST(generate_series(0, 7)) AS ms(m)
),
cb1 AS (SELECT m, CAST(vec_id AS INT) AS code, sub AS cent
        FROM sub WHERE vec_id < 16),
d1 AS (SELECT s.vec_id, s.m, c.code, {_PQ_D2_SC} AS d2
       FROM sub s JOIN cb1 c ON c.m = s.m),
a1 AS (SELECT vec_id, m, code FROM (
         SELECT vec_id, m, code,
                ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                   ORDER BY d2 ASC, code ASC) AS rn
         FROM d1) r WHERE rn = 1),
upd AS (SELECT a.m, a.code, ks.i AS pos, s.sub[ks.i] AS x
        FROM a1 a JOIN sub s USING (vec_id, m),
             UNNEST(generate_series(1, 8)) AS ks(i)),
cb2d AS (SELECT m, code, pos, ROUND(AVG(x), 6) AS c
         FROM upd GROUP BY 1, 2, 3),
cb2 AS (SELECT m, code, list(c ORDER BY pos) AS cent FROM cb2d GROUP BY 1, 2),
d2i AS (SELECT s.vec_id, s.m, c.code, {_PQ_D2_SC} AS d2
        FROM sub s JOIN cb2 c ON c.m = s.m),
codes AS (SELECT vec_id, m, code FROM (
            SELECT vec_id, m, code,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2 ASC, code ASC) AS rn
            FROM d2i) r WHERE rn = 1),
q AS (SELECT vec_id AS qid, m, sub AS qsub FROM sub WHERE vec_id % 100 = 0),
lut AS (SELECT q.qid, q.m, c.code,
               CAST(FLOOR({_PQ_D2_QC} * 1000000) AS BIGINT) AS d2u
        FROM q JOIN cb2 c ON c.m = q.m),
adc AS (SELECT l.qid, co.vec_id, CAST(SUM(d2u) AS BIGINT) AS ad2_u
        FROM codes co JOIN lut l ON l.m = co.m AND l.code = co.code
        WHERE co.vec_id <> l.qid GROUP BY 1, 2)
SELECT qid, CAST(rnk AS INT) AS rnk, vec_id, ad2_u FROM (
  SELECT qid, vec_id, ad2_u,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY ad2_u ASC, vec_id ASC)
           AS rnk
  FROM adc) r WHERE rnk <= 5
"""


# the pinned 2/10 file counts are deterministic by construction: ten
# 50-wide doc_id ranges, one file each; [120, 180] intersects exactly
# the [100,150) and [150,200) zones
def _cells_kde_sql() -> str:
    """Identical KDE construction: same grid fragments as Moran's I,
    25-row VALUES offsets dim, integer triangle kernel, ranking
    window over the cell-sized table."""
    from .harness import PX, PY
    from .queries_r5 import _KDE_TOPK, _MI_LEVEL
    from .sqlgen import grid_index_expr

    offs = ", ".join(
        f"({dx}, {dy}, {(3 - abs(dx)) * (3 - abs(dy))})"
        for dx in range(-2, 3) for dy in range(-2, 3)
    )
    return f"""
WITH pts AS (
  SELECT {grid_index_expr(PX, _MI_LEVEL)} AS ix,
         {grid_index_expr(PY, _MI_LEVEL)} AS iy
  FROM orders
),
cells AS (SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS c
          FROM pts GROUP BY ix, iy),
contrib AS (
  SELECT ix + o.dx AS ix, iy + o.dy AS iy, c * CAST(o.w AS BIGINT) AS wc
  FROM cells, (VALUES {offs}) AS o(dx, dy, w)
),
kde AS (SELECT ix, iy, CAST(SUM(wc) AS BIGINT) AS kde
        FROM contrib GROUP BY ix, iy)
SELECT ix, iy, kde, rnk FROM (
  SELECT ix, iy, kde,
         CAST(ROW_NUMBER() OVER (ORDER BY kde DESC, ix, iy) AS INT) AS rnk
  FROM kde
) WHERE rnk <= {_KDE_TOPK}
"""


# UDTF word runs: INDEPENDENT gaps-and-islands twin — run starts via
# lag(), island ids via a running sum, runs >= 2 kept; checks the
# UDTF's sequential RLE against pure relational semantics.
UDTF_WORD_RUNS = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
pos AS (
  SELECT doc_id, ws[i] AS word, i
  FROM w, UNNEST(generate_series(1, len(ws))) AS u(i)
),
brk AS (
  SELECT doc_id, word, i,
         CASE WHEN lag(word) OVER (PARTITION BY doc_id ORDER BY i) = word
              THEN 0 ELSE 1 END AS is_start
  FROM pos
),
isl AS (
  SELECT doc_id, word, i,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM brk
),
runs AS (
  SELECT doc_id, word, grp, COUNT(*) AS run_len
  FROM isl GROUP BY doc_id, word, grp HAVING COUNT(*) >= 2
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS INT) AS max_run,
       CAST(SUM(run_len) AS BIGINT) AS sum_len
FROM runs GROUP BY word
"""


def _kcore_sql(roads_pq: str, node: str) -> str:
    """Same fixed peel rounds as the Spark side, each round ONE
    windowed filter referencing the previous CTE exactly once (the
    shortest-path single-reference lesson); the final CTE is read by
    a single aggregate pass."""
    from .queries_r5 import _KCORE_K, _KCORE_ROUNDS

    rounds = "".join(
        f""",
e{k + 1} AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           COUNT(*) OVER (PARTITION BY src) AS ds,
           COUNT(*) OVER (PARTITION BY dst) AS dd
    FROM e{k}
  ) WHERE ds >= {_KCORE_K} AND dd >= {_KCORE_K}
)"""
        for k in range(_KCORE_ROUNDS)
    )
    return f"""
WITH nds AS (SELECT list_transform(coords, c -> {node}) AS nds
             FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
e0 AS (SELECT DISTINCT src, dst FROM (
         SELECT a AS src, b AS dst FROM ab
         UNION ALL SELECT b AS src, a AS dst FROM ab)
       WHERE src <> dst){rounds}
SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_core_nodes,
       CAST(COALESCE(SUM(DISTINCT src), 0) AS BIGINT) AS sum_node,
       CAST(FLOOR(COUNT(*) / 2) AS BIGINT) AS n_core_edges
FROM e{_KCORE_ROUNDS}
"""


def _welch_sql() -> str:
    """Same exact-BIGINT folds, same shared variance fragment, same
    scalar expression order, one FLOOR at the end."""
    from .queries_r5 import _WELCH_V

    v1 = _WELCH_V.format(n="n", s="s", q="q")
    v2 = _WELCH_V.format(n="n2", s="s2", q="q2")
    return f"""
WITH c AS (SELECT event_type,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT) AS s,
               CAST(SUM(c * c) AS BIGINT) AS q
        FROM c GROUP BY event_type),
base AS (SELECT n AS n2, s AS s2, q AS q2 FROM agg
         WHERE event_type = 'view')
SELECT event_type, n,
       CAST(FLOOR(CAST(s AS DOUBLE) * 10.0 / CAST(n AS DOUBLE))
            AS BIGINT) AS mean_mils,
       CAST(FLOOR((CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 10.0
            / SQRT({v1} / CAST(n AS DOUBLE)
            + {v2} / CAST(n2 AS DOUBLE)) * 1000.0) AS BIGINT) AS t_mils
FROM agg, base
WHERE event_type <> 'view'
"""


def _line_density_sql(roads_pq: str) -> str:
    """Identical midpoint-attribution construction: same grid
    fragments, FLOOR-before-fold micro lengths."""
    from .queries_r5 import _MI_LEVEL
    from .sqlgen import grid_index_expr

    mx = grid_index_expr("(x1 + x2) / 2", _MI_LEVEL)
    my = grid_index_expr("(y1 + y2) / 2", _MI_LEVEL)
    return f"""
WITH cs AS (SELECT coords AS cs FROM read_parquet('{roads_pq}')),
seg AS (SELECT (cs[i]).x AS x1, (cs[i]).y AS y1,
               (cs[i + 1]).x AS x2, (cs[i + 1]).y AS y2
        FROM cs, UNNEST(generate_series(1, len(cs) - 1)) AS u(i)),
mid AS (SELECT {mx} AS ix, {my} AS iy,
               CAST(FLOOR(SQRT((x2 - x1) * (x2 - x1)
                    + (y2 - y1) * (y2 - y1)) * 1000000.0) AS BIGINT)
                 AS len_u
        FROM seg)
SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(len_u) AS BIGINT) AS len_micro
FROM mid GROUP BY ix, iy
"""


# bloom point lookups: the probed rows + pinned per-probe scan counts
# (each probe opens exactly its one true file of 10 — zero false
# positives at this key set, deterministic md5 bloom; re-derivable
# with storage._bloom_cells over the doc_id%10 slices and pinned by
# tests/test_r5.py)
def _bloom_index_sql() -> str:
    from .queries_r5 import _BLOOM_PROBES

    keys = ", ".join(str(p) for p in _BLOOM_PROBES)
    return f"""
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(1 AS INT) AS files_scanned, CAST(10 AS INT) AS files_total
FROM documents WHERE doc_id IN ({keys})
"""


# incremental MV maintenance: the oracle IS the from-scratch
# recompute over the final state (append covered all docs; the delete
# tombstoned doc_id % 9 = 0), so incremental == direct is the check;
# delta sizes recomputed relationally
SNAPSHOT_INCREMENTAL_MV = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE doc_id >= 400) AS d_ins,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE doc_id % 9 = 0) AS d_del
FROM documents WHERE doc_id % 9 <> 0
GROUP BY lang
"""


# merge-on-read deletes: content = every doc whose key survived the
# tombstone; pinned sidecar/file counts (1 delete file -> 0 after
# compaction, 2 data files) + pre-delete count via time travel
SNAPSHOT_MOR_DELETES = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_before,
       CAST(1 AS INT) AS delete_files,
       CAST(0 AS INT) AS delete_files_after_compact,
       CAST(2 AS INT) AS data_files_after_compact
FROM documents WHERE doc_id % 7 <> 0
GROUP BY lang
"""

# z-order clustering: the 2-D box aggregate over the SAME quantized
# grid fragments, plus the pinned scan counts — row-order layout
# prunes nothing (4/4), the morton-clustered rewrite opens only the
# two buckets whose (qx, qy) boxes intersect the query (2/8)
SNAPSHOT_ZORDER_CLUSTER = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       '4/4' AS files_scanned_roworder,
       '2/8' AS files_scanned_zorder
FROM documents
WHERE CAST(doc_id % 8 AS INT) BETWEEN 4 AND 7
  AND CAST(CAST(FLOOR(doc_id / 8) AS BIGINT) % 8 AS INT) BETWEEN 4 AND 7
GROUP BY lang
"""

SNAPSHOT_ZONE_MAP = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(2 AS INT) AS files_scanned, CAST(10 AS INT) AS files_total
FROM documents WHERE doc_id BETWEEN 120 AND 180
GROUP BY lang
"""


def _ewma_sql() -> str:
    from .queries_r5 import _EWMA_DEN, _EWMA_W

    terms = " + ".join(
        f"{wt} * x{k}" if k else f"{wt} * x"
        for k, wt in enumerate(_EWMA_W)
    )
    lags = ",\n         ".join(
        f"lag(x, {k}) OVER (ORDER BY h) AS x{k}" for k in range(1, 8)
    )
    return f"""
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
lagged AS (
  SELECT h, x,
         {lags}
  FROM hourly
)
SELECT h, x, CAST({terms} AS BIGINT) AS ewma_scaled,
       CAST(FLOOR(({terms}) * 1000 / {_EWMA_DEN}) AS BIGINT) AS ewma_mils
FROM lagged WHERE x7 IS NOT NULL
"""


EVENTS_SEASONALITY = """
WITH per_day AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
dowagg AS (
  SELECT d % 7 AS dow, CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM per_day GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS n,
         CAST(SUM(n_days) AS BIGINT) AS days_tot
  FROM dowagg
)
SELECT CAST(dow AS INT) AS dow, n_events, n_days,
       CAST(FLOOR(n_events * days_tot * 10000 / (n_days * n)) AS BIGINT)
         AS idx_bp
FROM dowagg, tot
"""


def _rake_sql() -> str:
    from .queries_r5 import _RAKE_STOPS, _RAKE_TOPK

    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id, i AS pos, ws[i] AS w,
         CAST(ws[i] IN {_RAKE_STOPS} AS INT) AS is_stop
  FROM d, UNNEST(generate_series(1, len(ws))) AS u(i)
),
phrased AS (
  SELECT doc_id, pos, w, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pid
  FROM toks
),
plen AS (
  SELECT doc_id, w,
         COUNT(*) OVER (PARTITION BY doc_id, pid) AS plen
  FROM phrased WHERE is_stop = 0
),
words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS deg
  FROM plen GROUP BY 1
),
scored AS (
  SELECT w, freq, deg,
         CAST(FLOOR(deg * 1000 / freq) AS BIGINT) AS score_mils
  FROM words
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_mils DESC, w) AS INT) AS rnk,
       w, freq, deg, score_mils
FROM scored
QUALIFY rnk <= {_RAKE_TOPK}
"""


DOC_WORD_DIVERSITY = """
WITH wc AS (
  SELECT doc_id, u.w AS w, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
  GROUP BY 1, 2
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(FLOOR((SUM(c) * SUM(c) - SUM(c * c)) * 1000
            / (SUM(c) * SUM(c))) AS BIGINT) AS simpson_mils
FROM wc GROUP BY 1
"""


# position deletes: the tombstoned set is exactly the predicate rows
# in the first two appends (positions were located BY the predicate),
# the third append re-inserts the sub-50 portion (sequence semantics);
# tombstone count recovered relationally; file counts pinned
SNAPSHOT_POSITION_DELETES = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_before,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE doc_id % 5 = 2) AS n_tombstones,
       CAST(1 AS INT) AS pos_delete_files,
       CAST(3 AS INT) AS data_files
FROM (
  SELECT lang, n_chars FROM documents WHERE doc_id % 5 <> 2
  UNION ALL
  SELECT lang, n_chars FROM documents
  WHERE doc_id % 5 = 2 AND doc_id < 50
)
GROUP BY lang
"""

# metadata tables: footer row counts per commit vs relational counts
# over the same doc_id split; file counts pinned by the repartition
# layout (3 then 2); history accounting pinned (3 commits, delete
# head, 1 delete file)
SNAPSHOT_METADATA_TABLES = """
SELECT commit_pos, n_files, n_rows,
       CAST(3 AS INT) AS n_commits,
       'delete' AS head_mode,
       CAST(1 AS INT) AS sum_delete_files
FROM (
  SELECT CAST(1 AS INT) AS commit_pos, CAST(3 AS INT) AS n_files,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
          WHERE doc_id < 250) AS n_rows
  UNION ALL
  SELECT CAST(2 AS INT), CAST(2 AS INT),
         (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
          WHERE doc_id >= 250)
)
"""

# batch sessionization: identical gaps-and-islands windows (lag +
# running sum) in DuckDB; epoch_us ties out with unix_micros under
# the UTC session pin; ties break on event_id in both engines
EVENTS_SESSIONIZE_BATCH = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
),
l AS (
  SELECT user_id, event_id, us,
         us - LAG(us) OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS gap
  FROM e
),
s AS (
  SELECT user_id, us,
         SUM(CASE WHEN gap IS NULL OR gap > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM l
),
p AS (
  SELECT user_id, sess, CAST(COUNT(*) AS BIGINT) AS session_len,
         MAX(us) - MIN(us) AS dur_us
  FROM s GROUP BY 1, 2
)
SELECT session_len, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(dur_us) AS BIGINT) AS sum_dur_us
FROM p GROUP BY 1
"""


# exact tie-midrank AUC via the score-group recurrence; DuckDB //
# and Spark DIV are both exact integer floor division (doubles lose
# exactness past 2^53 — gotcha 7/8 territory)
EVENTS_AUC = """
WITH e AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
g AS (
  SELECT s, CAST(SUM(y) AS BIGINT) AS np_s,
         CAST(SUM(1 - y) AS BIGINT) AS nn_s
  FROM e GROUP BY 1
),
c AS (
  SELECT np_s, nn_s,
         CAST(COALESCE(SUM(nn_s) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS BIGINT) AS cum_neg
  FROM g
),
t AS (
  SELECT CAST(SUM(np_s) AS BIGINT) AS n_pos,
         CAST(SUM(nn_s) AS BIGINT) AS n_neg,
         CAST(SUM(np_s * (2 * cum_neg + nn_s)) AS BIGINT) AS u2
  FROM c
)
SELECT n_pos, n_neg, u2,
       CAST((1000000 * u2) // (2 * n_pos * n_neg) AS BIGINT) AS auc_micros
FROM t
"""

# identical bigram pipeline: ordinal word positions, LEAD, frequency
# rank with the same (cnt DESC, bg) total order, per-doc mean rank
DOC_BIGRAM_RARITY = """
WITH bg AS (
  SELECT doc_id, parts[i] || ' ' || parts[i + 1] AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS parts
        FROM documents) t,
       UNNEST(range(1, len(parts))) AS r(i)
),
cnt AS (
  SELECT bg, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg GROUP BY 1
),
rk AS (
  SELECT bg, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, bg) AS BIGINT)
           AS rnk
  FROM cnt
)
SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(r.rnk) AS BIGINT) AS sum_rank,
       CAST((1000 * SUM(r.rnk)) // COUNT(*) AS BIGINT) AS rarity_mils
FROM bg b JOIN rk r USING (bg)
GROUP BY 1
"""

# rollback: the head serves snapshot-1 content; the bad doubled
# append is only visible via time travel (count recovered
# relationally); commit count + head mode pinned
SNAPSHOT_ROLLBACK = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (
          SELECT doc_id FROM documents WHERE doc_id < 300
          UNION ALL
          SELECT doc_id FROM documents WHERE doc_id >= 300
          UNION ALL
          SELECT doc_id FROM documents WHERE doc_id >= 300
       )) AS n_at_bad,
       CAST(3 AS INT) AS n_commits,
       'rollback' AS head_mode
FROM documents WHERE doc_id < 300
GROUP BY lang
"""


# stream-static enrich: tier is a pure function of user_id, so the
# relational twin recomputes it straight from events — the streaming
# sink only matches if the broadcast join dropped/duplicated nothing
STREAMING_STATIC_ENRICH = """
SELECT CASE CAST(user_id % 4 AS INT) WHEN 0 THEN 'bronze'
            WHEN 1 THEN 'silver' WHEN 2 THEN 'gold'
            ELSE 'platinum' END AS tier,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY 1, 2
"""


EVENTS_KS_TEST = """
WITH ev AS (
  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS s,
         CAST(event_type = 'view' AS INT) AS a
  FROM events WHERE event_type IN ('view', 'click')
),
g AS (
  SELECT s, CAST(SUM(a) AS BIGINT) AS na_s,
         CAST(SUM(1 - a) AS BIGINT) AS nb_s
  FROM ev GROUP BY s
),
cum AS (
  SELECT CAST(SUM(na_s) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS ca,
         CAST(SUM(nb_s) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS BIGINT) AS cb
  FROM g
),
tots AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(1 - a) AS BIGINT) AS n_b
  FROM ev
)
SELECT n_a, n_b, CAST(MAX(ABS(ca * n_b - cb * n_a)) AS BIGINT) AS d_num,
       (1000000 * CAST(MAX(ABS(ca * n_b - cb * n_a)) AS BIGINT))
         // (n_a * n_b) AS ks_micros
FROM cum, tots GROUP BY n_a, n_b
"""


EVENTS_MANN_KENDALL = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
pairs AS (
  SELECT a.x AS x1, b.x AS x2
  FROM hourly a JOIN hourly b ON b.h > a.h
),
s AS (
  SELECT COUNT(*) AS n_pairs,
         CAST(SUM(CAST(x2 > x1 AS BIGINT)
              - CAST(x2 < x1 AS BIGINT)) AS BIGINT) AS s
  FROM pairs
),
n AS (SELECT COUNT(*) AS n_hours FROM hourly)
SELECT CAST(n_hours AS BIGINT) AS n_hours, CAST(n_pairs AS BIGINT) AS n_pairs,
       s,
       CAST(FLOOR(1000000.0 * CAST(s AS DOUBLE)
            / CAST(n_pairs AS DOUBLE)) AS BIGINT) AS tau_micros
FROM n, s
"""


DOC_NORMALIZED_DEDUP = """
WITH docs AS (
  SELECT doc_id,
         md5(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS nkey
  FROM documents
),
grp AS (
  SELECT nkey, CAST(COUNT(*) AS BIGINT) AS sz,
         MIN(doc_id) AS keeper
  FROM docs GROUP BY nkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CAST(sz > 1 AS BIGINT)) AS BIGINT) AS n_dup_groups,
       CAST(SUM(sz - 1) AS BIGINT) AS n_redundant,
       MAX(sz) AS max_group,
       CAST(SUM(keeper % 1000003) AS BIGINT) AS keeper_checksum
FROM grp
"""


EVENTS_SEQ_TRIGRAMS = """
WITH tri AS (
  SELECT concat(event_type, '>',
                lead(event_type, 1) OVER u, '>',
                lead(event_type, 2) OVER u) AS tri,
         lead(event_type, 2) OVER u AS e3
  FROM events
  WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id)
),
cnt AS (
  SELECT tri, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tri WHERE e3 IS NOT NULL GROUP BY tri
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tri) AS INT) AS rk,
       tri, cnt
FROM cnt
QUALIFY rk <= 10
"""


_REG_DET = (
    "(CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE) "
    "- CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE))"
)

EVENTS_REGRESSION = f"""
WITH ev AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS x1,
         CAST(FLOOR(CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT)
           / 24) AS BIGINT) AS d,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
),
mind AS (SELECT MIN(d) AS d0 FROM ev),
base AS (SELECT x1, d - d0 AS x2, y FROM ev, mind),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x1 * x1) AS BIGINT) AS s11,
         CAST(SUM(x2 * x2) AS BIGINT) AS s22,
         CAST(SUM(x1 * x2) AS BIGINT) AS s12,
         CAST(SUM(x1 * y) AS BIGINT) AS s1y,
         CAST(SUM(x2 * y) AS BIGINT) AS s2y
  FROM base
),
c AS (
  SELECT n,
         n * s11 - s1 * s1 AS c11,
         n * s22 - s2 * s2 AS c22,
         n * s12 - s1 * s2 AS c12,
         n * s1y - s1 * sy AS c1y,
         n * s2y - s2 * sy AS c2y
  FROM m
)
SELECT n, c11, c22, c12,
       CAST(FLOOR(1000000.0 * (CAST(c22 AS DOUBLE) * CAST(c1y AS DOUBLE)
         - CAST(c12 AS DOUBLE) * CAST(c2y AS DOUBLE)) / {_REG_DET})
         AS BIGINT) AS b1_micros,
       CAST(FLOOR(1000000.0 * (CAST(c11 AS DOUBLE) * CAST(c2y AS DOUBLE)
         - CAST(c12 AS DOUBLE) * CAST(c1y AS DOUBLE)) / {_REG_DET})
         AS BIGINT) AS b2_micros
FROM c
"""


def _getis_ord_sql() -> str:
    from .harness import PX, PY
    from .queries_r5 import _MI_LEVEL
    from .sqlgen import grid_index_expr

    z_expr = (
        "CAST(n * wsum - s * w AS DOUBLE) "
        "/ (SQRT(CAST(n * s2 - s * s AS DOUBLE)) "
        "* SQRT(CAST(n * w - w * w AS DOUBLE) / CAST(n - 1 AS DOUBLE)))"
    )
    return f"""
WITH pts AS (
  SELECT {grid_index_expr(PX, _MI_LEVEL)} AS ix,
         {grid_index_expr(PY, _MI_LEVEL)} AS iy
  FROM orders
),
cells AS (SELECT ix, iy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY ix, iy),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM cells
),
nb AS (
  SELECT ix + (k.k % 3) - 1 AS ix,
         iy + CAST(FLOOR(k.k / 3) AS BIGINT) - 1 AS iy,
         c AS c_j
  FROM cells, (SELECT unnest(range(0, 9)) AS k) k
),
g AS (
  SELECT cells.ix, cells.iy, CAST(COUNT(*) AS BIGINT) AS w,
         CAST(SUM(c_j) AS BIGINT) AS wsum
  FROM cells JOIN nb ON nb.ix = cells.ix AND nb.iy = cells.iy
  GROUP BY cells.ix, cells.iy
),
zs AS (
  SELECT ix, iy, w, wsum,
         n * wsum - s * w AS znum,
         CAST(FLOOR(1000.0 * {z_expr}) AS BIGINT) AS z_mils
  FROM g, tot
)
SELECT CAST(row_number() OVER (ORDER BY z_mils DESC, ix, iy) AS INT) AS rk,
       ix, iy, w, wsum, znum, z_mils
FROM zs
QUALIFY rk <= 10
"""


ORC_ROUNDTRIP_EVENTS = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_mils,
       MIN(event_id) AS min_event,
       MAX(user_id) AS max_user
FROM events GROUP BY event_type
"""


ORACLES_R5 = {
    "events_ks_test": EVENTS_KS_TEST,
    "events_mann_kendall": EVENTS_MANN_KENDALL,
    "doc_normalized_dedup": DOC_NORMALIZED_DEDUP,
    "events_seq_trigrams": EVENTS_SEQ_TRIGRAMS,
    "events_regression": EVENTS_REGRESSION,
    "cells_getis_ord": _getis_ord_sql(),
    "orc_roundtrip_events": ORC_ROUNDTRIP_EVENTS,
    "streaming_static_enrich": STREAMING_STATIC_ENRICH,
    "events_auc": EVENTS_AUC,
    "doc_bigram_rarity": DOC_BIGRAM_RARITY,
    "snapshot_rollback": SNAPSHOT_ROLLBACK,
    "snapshot_position_deletes": SNAPSHOT_POSITION_DELETES,
    "snapshot_metadata_tables": SNAPSHOT_METADATA_TABLES,
    "events_sessionize_batch": EVENTS_SESSIONIZE_BATCH,
    "events_seasonality": EVENTS_SEASONALITY,
    "doc_word_diversity": DOC_WORD_DIVERSITY,
    "snapshot_zone_map": SNAPSHOT_ZONE_MAP,
    "snapshot_mor_deletes": SNAPSHOT_MOR_DELETES,
    "snapshot_bloom_index": _bloom_index_sql(),
    "events_welch_ttest": _welch_sql(),
    "snapshot_wap_publish": SNAPSHOT_WAP_PUBLISH,
    "textrank_keywords": _textrank_sql(),
    "snapshot_incremental_mv": SNAPSHOT_INCREMENTAL_MV,
    "cells_kde": _cells_kde_sql(),
    "udtf_word_runs": UDTF_WORD_RUNS,
    "snapshot_zorder_cluster": SNAPSHOT_ZORDER_CLUSTER,
    "ann_pq_topk": ANN_PQ_TOPK,
    "contamination_check": CONTAMINATION_CHECK,
    "dataset_mix_weights": DATASET_MIX_WEIGHTS,
    "vocab_oov_rate": VOCAB_OOV_RATE,
    "hilbert_cells": _hilbert_cells_sql(),
    "market_basket_brands": MARKET_BASKET_BRANDS,
    "customer_rfm": CUSTOMER_RFM,
    "bpe_merge_candidates": BPE_MERGE_CANDIDATES,
    "geohash_cells": _geohash_cells_sql(),
    "cusum_changepoint": CUSUM_CHANGEPOINT,
    "phrase_search": _phrase_search_sql(),
    "events_trend": EVENTS_TREND,
    "drift_chisq": DRIFT_CHISQ,
    "events_acf": EVENTS_ACF,
    "events_gapfill": EVENTS_GAPFILL,
    "orders_skyline": ORDERS_SKYLINE,
    "bloom_filter_join": _bloom_filter_join_sql(),
    "cms_heavy_hitters": _cms_heavy_hitters_sql(),
    "kmv_set_similarity": _kmv_set_similarity_sql(),
    "hist_quantiles": HIST_QUANTILES,
    "events_asof_join": EVENTS_ASOF_JOIN,
    "events_funnel": EVENTS_FUNNEL,
    "hll_distinct": HLL_DISTINCT,
    "pagerank_roads": _pagerank_roads_sql(),
    "bm25_top_docs": BM25_TOP_DOCS,
    "sample_weighted": SAMPLE_WEIGHTED,
    "events_retention": EVENTS_RETENTION,
    "pivot_orders_status": PIVOT_ORDERS_STATUS,
    "pmi_bigrams": PMI_BIGRAMS,
    "events_outliers": EVENTS_OUTLIERS,
    # compaction: content aggregate over the appended range + pinned
    # before/after file counts (5 appends x repartition(4) = 20 -> 2)
    # + snapshot-3 time-travel row count (the first 300 docs)
    "streaming_left_join": STREAMING_LEFT_JOIN,
    "snapshot_diff": SNAPSHOT_DIFF,
    "grid_idw": _grid_idw_sql(),
    "fuzzy_name_pairs": FUZZY_NAME_PAIRS,
    "event_transitions": EVENT_TRANSITIONS,
    "customer_gini": CUSTOMER_GINI,
    "cells_morans_i": _morans_i_sql(),
    "snapshot_compaction": """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(20 AS INT) AS n_files_before, CAST(2 AS INT) AS n_files_after,
       CAST(300 AS BIGINT) AS snap3_rows
FROM documents WHERE doc_id < 500 GROUP BY lang
""",
}

ORACLES_R5["events_ewma"] = _ewma_sql()
ORACLES_R5["rake_keywords"] = _rake_sql()

ORACLES_R5["groupingsets_orders"] = """
WITH o AS (
  SELECT o_orderstatus AS status, o_orderpriority AS priority,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT COALESCE(status, 'ALL') AS status,
       COALESCE(priority, 'ALL') AS priority,
       CAST(GROUPING(status) * 2 + GROUPING(priority) AS INT) AS gflags,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM o
GROUP BY GROUPING SETS ((status, priority), (status), (priority))
"""

ORACLES_R5["events_rolling_range"] = """
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
)
SELECT h, x,
       CAST(SUM(x) OVER w AS BIGINT) AS roll24,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_obs
FROM hourly
WINDOW w AS (ORDER BY h RANGE BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


def _containment_sql() -> str:
    from .oracles_ext import _SH_DUCK
    from .queries_r5 import _CONT_MILS_MIN

    return f"""
WITH sets AS (SELECT doc_id, {_SH_DUCK} AS sh FROM documents),
inv AS (SELECT doc_id, UNNEST(sh) AS s FROM sets),
rare AS (SELECT s FROM (SELECT s, COUNT(*) AS nf FROM inv GROUP BY s) f
         WHERE nf >= 2 AND nf <= 10),
postings AS (SELECT i.doc_id, i.s FROM inv i JOIN rare r ON i.s = r.s),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM postings a JOIN postings b ON a.s = b.s AND a.doc_id <> b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS n_int,
         CAST(len(sa.sh) AS BIGINT) AS n_a
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b
)
SELECT doc_a, doc_b, n_int, n_a,
       CAST(FLOOR(n_int * 1000 / n_a) AS BIGINT) AS cont_mils
FROM scored WHERE FLOOR(n_int * 1000 / n_a) >= {_CONT_MILS_MIN}
"""


ORACLES_R5["dedup_containment"] = _containment_sql()

def _qatile_source_sql() -> str:
    """osm_qatile_source: per-zoom rollup of the SAME bbox-cover + SAT
    twin that certifies osm_qatile_roads — the DataSource-API read must
    produce the identical feature multiset."""
    from .oracles_ext import _qatile_roads_sql

    return f"""
SELECT z, CAST(COUNT(*) AS INT) AS n_tiles,
       CAST(SUM(n_features) AS BIGINT) AS n_features,
       CAST(SUM(sum_road_id) AS BIGINT) AS sum_road_id
FROM ({_qatile_roads_sql(4)}) GROUP BY z
"""


ORACLES_R5["osm_qatile_source"] = _qatile_source_sql()


def _ann_recall_sql() -> str:
    """ann_recall_eval: recall@3 composed from the SAME two certified
    ANN twins (exact baseline + IVF), so the approximation cost the
    engine reports is pinned exactly."""
    from .oracles import ANN_COSINE_TOPK
    from .oracles_ext import ANN_IVF_TOPK

    return f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM ({ANN_COSINE_TOPK}) WHERE rnk <= 3
),
ivf AS (
  SELECT query_id, neighbor_id FROM ({ANN_IVF_TOPK})
  WHERE query_id < 10 AND rnk <= 3
),
q AS (SELECT DISTINCT query_id FROM exact),
h AS (
  SELECT e.query_id, COUNT(*) AS n_hit
  FROM exact e JOIN ivf i
    ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT q.query_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(FLOOR(COALESCE(h.n_hit, 0) * 1000 / 3) AS BIGINT) AS recall_mils
FROM q LEFT JOIN h USING (query_id)
"""


ORACLES_R5["ann_recall_eval"] = _ann_recall_sql()


def _ann_sq8_sql() -> str:
    """ann_sq8_recall: the same per-tensor SQ8 quantization chain
    (shared FLOOR text — IEEE-identical), integer quantized dots, and
    recall@3 against the SAME certified exact baseline."""
    from .oracles import ANN_COSINE_TOPK
    from .queries_r5 import _SQ8_Q

    qexpr = _SQ8_Q.format(col="embedding").replace(
        "transform(", "list_transform(", 1
    )
    return f"""
WITH rng AS (
  SELECT MIN(v) AS mn, MAX(v) AS mx
  FROM (SELECT unnest(embedding) AS v FROM embeddings)
),
q AS (SELECT vec_id, {qexpr} AS qv FROM embeddings, rng),
qn AS (
  SELECT vec_id, qv,
         CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q2
  FROM q
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(generate_series(1, len(a.qv)),
              i -> a.qv[i] * b.qv[i])) AS BIGINT) AS qdot,
         a.q2 AS qa2, b.q2 AS qb2
  FROM qn a CROSS JOIN qn b
  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
    AND a.q2 > 0 AND b.q2 > 0
),
approx AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
             CAST(qdot AS DOUBLE) / (SQRT(CAST(qa2 AS DOUBLE))
               * SQRT(CAST(qb2 AS DOUBLE))) DESC,
             neighbor_id ASC) AS INT) AS rnk
    FROM pairs
  ) WHERE rnk <= 3
),
exact AS (
  SELECT query_id, neighbor_id FROM ({ANN_COSINE_TOPK}) WHERE rnk <= 3
),
qs AS (SELECT DISTINCT query_id FROM exact),
h AS (
  SELECT e.query_id, COUNT(*) AS n_hit
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY 1
)
SELECT qs.query_id, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(FLOOR(COALESCE(h.n_hit, 0) * 1000 / 3) AS BIGINT) AS recall_mils
FROM qs LEFT JOIN h USING (query_id)
"""


ORACLES_R5["ann_sq8_recall"] = _ann_sq8_sql()


EVENTS_BENFORD = """
WITH ev AS (
  SELECT CAST(substring(CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
           AS STRING), 1, 1) AS INT) AS d
  FROM events
),
pos AS (SELECT d FROM ev WHERE d > 0),
cnt AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM pos GROUP BY d),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pos),
exp AS (
  SELECT d, micros FROM (VALUES (1, 301030), (2, 176091), (3, 124939),
    (4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153),
    (9, 45757)) AS t(d, micros)
)
SELECT cnt.d, cnt.cnt, tot.n,
       (1000000 * cnt.cnt) // tot.n AS obs_micros,
       CAST(exp.micros AS BIGINT) AS exp_micros,
       CAST(abs(1000000 * cnt.cnt - exp.micros * tot.n) AS BIGINT)
         AS dev_scaled
FROM cnt JOIN exp USING (d), tot
ORDER BY cnt.d
"""


BITMAP_DISTINCT_USERS = """
WITH ev AS (
  SELECT event_type, user_id,
         user_id // 63 AS word,
         (CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS bit
  FROM events
),
words AS (
  SELECT event_type, word, bit_or(bit) AS m
  FROM ev GROUP BY event_type, word
),
bm AS (
  SELECT event_type, CAST(SUM(bit_count(m)) AS BIGINT) AS n_distinct_bitmap,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM words GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
           AS n_distinct_exact
  FROM events GROUP BY event_type
)
SELECT bm.event_type, bm.n_distinct_bitmap, bm.n_words, ex.n_distinct_exact
FROM bm JOIN ex USING (event_type)
"""


EVENTS_TWAP = """
WITH ev AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS v_mils
  FROM events
),
seg AS (
  SELECT event_type, v_mils,
         CAST(FLOOR((lead(us) OVER (PARTITION BY event_type
           ORDER BY us, event_id) - us) / 1000000) AS BIGINT) AS dur_s
  FROM ev
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_holds,
         CAST(SUM(dur_s) AS BIGINT) AS sum_dur_s,
         CAST(SUM(v_mils * dur_s) AS BIGINT) AS sum_wv
  FROM seg WHERE dur_s IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_holds, sum_dur_s, sum_wv,
       sum_wv // sum_dur_s AS twap_mils
FROM agg
"""

ORACLES_R5["events_benford"] = EVENTS_BENFORD
ORACLES_R5["bitmap_distinct_users"] = BITMAP_DISTINCT_USERS
ORACLES_R5["events_twap"] = EVENTS_TWAP


# snapshot_expire: head content relationally (the overwrite holds
# doc_id < 500) + pinned maintenance counts — 4 expired manifests, 1
# kept, exactly the 4 orphaned append dirs vacuumed, the expired as-of
# read failing loudly, and the 2-file overwrite layout.
SNAPSHOT_EXPIRE = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(4 AS INT) AS expired, CAST(1 AS INT) AS kept,
       CAST(4 AS INT) AS orphans_removed, CAST(1 AS INT) AS asof_fails,
       CAST(2 AS INT) AS n_files_head
FROM documents WHERE doc_id < 500 GROUP BY lang
"""

ORACLES_R5["snapshot_expire"] = SNAPSHOT_EXPIRE


def _dedup_lsh_recall_sql() -> str:
    """dedup_lsh_recall: composed from the SAME two certified dedup
    twins (exact shingle Jaccard baseline + MinHash-LSH band pairs),
    so the banding recall/precision the engine reports is pinned."""
    from .oracles import MINHASH_LSH_PAIRS
    from .oracles_ext import NGRAM_JACCARD_PAIRS

    return f"""
WITH truth AS (
  SELECT doc_a, doc_b FROM (
    SELECT doc_a, doc_b,
           ROW_NUMBER() OVER (ORDER BY jaccard DESC, doc_a, doc_b) AS rk
    FROM ({NGRAM_JACCARD_PAIRS})
  ) WHERE rk <= 10
),
cand AS (
  SELECT doc_a, doc_b FROM ({MINHASH_LSH_PAIRS})
  WHERE doc_a < 60 AND doc_b < 60
),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand),
h AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM truth JOIN cand USING (doc_a, doc_b)
)
SELECT n_truth, n_cand, n_hit,
       CASE WHEN n_truth = 0 THEN -1
         ELSE CAST(FLOOR(n_hit * 1000 / n_truth) AS BIGINT) END AS recall_mils,
       CASE WHEN n_cand = 0 THEN -1
         ELSE CAST(FLOOR(n_hit * 1000 / n_cand) AS BIGINT) END AS precision_mils
FROM t, c, h
"""


ORACLES_R5["dedup_lsh_recall"] = _dedup_lsh_recall_sql()


# streaming_session_window: batch gaps-and-islands twin of the NATIVE
# session_window drain.  Boundary semantics pinned empirically: events
# exactly `gap` apart MERGE (break is strictly > gap); append emission
# is end <= watermark with the watermark tracked in WHOLE MILLISECONDS
# (Spark's EventTimeStats), i.e. floor-to-ms of the max event time
# minus the delay.
STREAMING_SESSION_WINDOW = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
mx AS (SELECT (MAX(us) // 1000) * 1000 AS m FROM ev),
lagd AS (
  SELECT user_id, us, cents,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
sess AS (
  SELECT user_id, us, cents,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM lagd
),
per AS (
  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         MIN(us) AS s0, MAX(us) AS s1
  FROM sess GROUP BY 1, 2
),
closed AS (
  SELECT per.* FROM per, mx
  WHERE s1 + 1800000000 <= m - 7200000000
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(n_events) AS BIGINT) AS sum_events,
       CAST(SUM(sum_cents) AS BIGINT) AS sum_cents,
       CAST(SUM(CAST(n_events = 1 AS BIGINT)) AS BIGINT) AS n_single,
       CAST(MAX(s1 + 1800000000 - s0) AS BIGINT) AS max_dur_us
FROM closed
"""

ORACLES_R5["streaming_session_window"] = STREAMING_SESSION_WINDOW


Q17_SMALL_QUANTITY_REVENUE = """
SELECT COUNT(*) AS n_lines,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
         AS BIGINT) AS revenue_cents
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#4' AND p_size < 20
  AND l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""

ORACLES_R5["q17_small_quantity_revenue"] = Q17_SMALL_QUANTITY_REVENUE

# events_variant_json: the oracle bypasses the JSON/variant round trip
# entirely — same aggregate from the base columns, so Spark's variant
# encode/extract path is what's under test.
ORACLES_R5["events_variant_json"] = """
SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
         AS sum_k,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_v_mils
FROM events GROUP BY 1
"""

# snapshot_partition_prune: 2 hash tasks x 5 langs = 10 hive files,
# lang='en' keeps exactly the 2 'lang=en' ones (both counts pinned)
ORACLES_R5["snapshot_partition_prune"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id,
       CAST(2 AS INT) AS files_scanned, CAST(10 AS INT) AS files_total
FROM documents WHERE lang = 'en'
"""

# streaming_snapshot_sink: 4 input files x maxFilesPerTrigger=1 ->
# exactly 4 snapshot commits (pinned); the aggregate over the latest
# snapshot must equal the relational aggregate over the source events.
ORACLES_R5["streaming_snapshot_sink"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_v_mils,
       CAST(4 AS INT) AS n_snapshots
FROM events GROUP BY 1
"""


def _pyr_simp_leg_sql(z: int, golden: str) -> str:
    """One zoom of the simplified-pyramid oracle: the same bbox-cover +
    division-free SAT tile stats as oracles_ext._mvt_tile_stats_sql,
    with the segment source swapped from `supplier` to the committed
    recursive-DP golden's z-slice."""
    from .sqlgen import grid_index_expr

    size = repr(10.0 / (1 << z))
    return f"""
WITH segs AS (SELECT ax, ay, bx, byy
              FROM read_parquet('{golden}') WHERE z = {z}),
idx AS (
  SELECT *, {grid_index_expr("LEAST(ax, bx)", z)} AS ix0,
         {grid_index_expr("LEAST(ay, byy)", z)} AS iy0,
         {grid_index_expr("GREATEST(ax, bx)", z)} AS ix1,
         {grid_index_expr("GREATEST(ay, byy)", z)} AS iy1
  FROM segs
),
expd AS (
  SELECT ax, ay, bx, byy,
         CAST(u1.cix AS INT) AS tx, CAST(u2.ciy AS INT) AS ty,
         (CAST(0 AS DOUBLE) + u1.cix * CAST({size} AS DOUBLE)) AS x0,
         (CAST(0 AS DOUBLE) + u2.ciy * CAST({size} AS DOUBLE)) AS y0
  FROM idx, UNNEST(generate_series(ix0, ix1)) AS u1(cix),
       UNNEST(generate_series(iy0, iy1)) AS u2(ciy)
),
d1 AS (
  SELECT tx, ty, ax, ay, x0, y0,
         (x0 + CAST({size} AS DOUBLE)) AS x1, (y0 + CAST({size} AS DOUBLE)) AS y1,
         (bx - ax) AS dx, (byy - ay) AS dy,
         LEAST(ax, bx) AS sxmin, GREATEST(ax, bx) AS sxmax,
         LEAST(ay, byy) AS symin, GREATEST(ay, byy) AS symax
  FROM expd
),
d2 AS (
  SELECT tx, ty,
         (sxmin <= x1 AND sxmax >= x0 AND symin <= y1 AND symax >= y0) AS bbox,
         (dx * (y0 - ay) - dy * (x0 - ax)) AS s1,
         (dx * (y0 - ay) - dy * (x1 - ax)) AS s2,
         (dx * (y1 - ay) - dy * (x0 - ax)) AS s3,
         (dx * (y1 - ay) - dy * (x1 - ax)) AS s4
  FROM d1
)
SELECT CAST({z} AS INT) AS z, tx, ty,
       CAST(SUM(CASE WHEN bbox
                      AND LEAST(s1, s2, s3, s4) <= CAST(0 AS DOUBLE)
                      AND GREATEST(s1, s2, s3, s4) >= CAST(0 AS DOUBLE)
                     THEN 1 ELSE 0 END) AS INT) AS n_features
FROM d2 GROUP BY tx, ty
"""


def _buffer_cells_sql(roads_pq: str) -> str:
    from .queries_r5 import _BUF_CELL, _BUF_DEG, _BUF_LEVEL, _BUF_M
    from .sqlgen import chain_select, grid_index_expr, point_seg_dist_steps

    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "byy", "dist_m")
    base = f"""
WITH segs AS (
  SELECT kind, c[i].x AS ax, c[i].y AS ay,
         c[i + 1].x AS bx, c[i + 1].y AS byy
  FROM (SELECT kind, coords AS c FROM read_parquet('{roads_pq}')),
       UNNEST(generate_series(1, len(c) - 1)) AS u(i)
),
g AS (
  SELECT kind, ax, ay, bx, byy,
         {grid_index_expr(f"LEAST(ax, bx) - {_BUF_DEG}", _BUF_LEVEL)} AS ix0,
         {grid_index_expr(f"GREATEST(ax, bx) + {_BUF_DEG}", _BUF_LEVEL)} AS ix1,
         {grid_index_expr(f"LEAST(ay, byy) - {_BUF_DEG}", _BUF_LEVEL)} AS iy0,
         {grid_index_expr(f"GREATEST(ay, byy) + {_BUF_DEG}", _BUF_LEVEL)} AS iy1
  FROM segs
),
cand AS (
  SELECT kind, ax, ay, bx, byy, u1.ix AS ix, u2.iy AS iy,
         (CAST(0 AS DOUBLE) + (CAST(u1.ix AS DOUBLE) + 0.5)
          * CAST({_BUF_CELL} AS DOUBLE)) AS lon,
         (CAST(0 AS DOUBLE) + (CAST(u2.iy AS DOUBLE) + 0.5)
          * CAST({_BUF_CELL} AS DOUBLE)) AS lat
  FROM g, UNNEST(generate_series(ix0, ix1)) AS u1(ix),
       UNNEST(generate_series(iy0, iy1)) AS u2(iy)
),
d AS ({chain_select("SELECT * FROM cand", steps, ["kind", "ix", "iy", "dist_m"])}),
cells AS (
  SELECT DISTINCT kind, ix, iy FROM d
  WHERE dist_m <= CAST({_BUF_M!r} AS DOUBLE)
)
SELECT kind, COUNT(*) AS n_cells,
       CAST(SUM(ix * 1000 + iy) AS BIGINT) AS sum_cell
FROM cells GROUP BY kind
"""
    return base


def _road_intersections_sql(roads_pq: str) -> str:
    from .queries_r5 import _X_LEVEL, _X_TEST
    from .sqlgen import grid_index_expr

    return f"""
WITH segs AS (
  SELECT road_id, kind, i AS seg_id, c[i].x AS ax, c[i].y AS ay,
         c[i + 1].x AS bx, c[i + 1].y AS by
  FROM (SELECT road_id, kind, coords AS c FROM read_parquet('{roads_pq}')),
       UNNEST(generate_series(1, len(c) - 1)) AS u(i)
),
cov AS (
  SELECT road_id, kind, seg_id, ax, ay, bx, by,
         u1.cix AS cix, u2.ciy AS ciy
  FROM (
    SELECT *, {grid_index_expr("LEAST(ax, bx)", _X_LEVEL)} AS ix0,
           {grid_index_expr("GREATEST(ax, bx)", _X_LEVEL)} AS ix1,
           {grid_index_expr("LEAST(ay, by)", _X_LEVEL)} AS iy0,
           {grid_index_expr("GREATEST(ay, by)", _X_LEVEL)} AS iy1
    FROM segs
  ), UNNEST(generate_series(ix0, ix1)) AS u1(cix),
     UNNEST(generate_series(iy0, iy1)) AS u2(ciy)
),
cand AS (
  SELECT DISTINCT
         a.road_id AS a_rid, a.kind AS a_kind, a.seg_id AS a_sid,
         a.ax AS a_ax, a.ay AS a_ay, a.bx AS a_bx, a.by AS a_by,
         b.road_id AS b_rid, b.kind AS b_kind, b.seg_id AS b_sid,
         b.ax AS b_ax, b.ay AS b_ay, b.bx AS b_bx, b.by AS b_by
  FROM cov a JOIN cov b
    ON a.cix = b.cix AND a.ciy = b.ciy AND a.road_id < b.road_id
),
hits AS (SELECT * FROM cand WHERE {_X_TEST})
SELECT LEAST(a_kind, b_kind) AS kind_lo,
       GREATEST(a_kind, b_kind) AS kind_hi,
       COUNT(*) AS n_crossings
FROM hits GROUP BY kind_lo, kind_hi
"""


def _dissolve_sql(roads_pq: str) -> str:
    """roads_dissolve: identical kind-scoped endpoint keys (shared
    _BFS_NODE quantization); component labels via the pruned
    recursive-CTE reachability min (labels only propagate downhill —
    the component min survives every check, so MIN(lab) is exact)."""
    from .queries_r5 import _BFS_NODE

    na = _BFS_NODE.format(x="coords[1].x", y="coords[1].y")
    nb = _BFS_NODE.format(x="coords[len(coords)].x",
                          y="coords[len(coords)].y")
    return f"""
WITH ends AS (
  SELECT road_id, kind,
         concat(kind, '|', CAST({na} AS STRING)) AS ka,
         concat(kind, '|', CAST({nb} AS STRING)) AS kb
  FROM read_parquet('{roads_pq}')
),
verts AS (
  SELECT DISTINCT k FROM (
    SELECT ka AS k FROM ends UNION ALL SELECT kb AS k FROM ends
  )
),
adj AS (
  SELECT ka AS a, kb AS b FROM ends WHERE ka <> kb
  UNION ALL
  SELECT kb AS a, ka AS b FROM ends WHERE ka <> kb
),
w AS (
  WITH RECURSIVE t(v, lab) AS (
    SELECT k, k FROM verts
    UNION
    SELECT adj.b, t.lab FROM t JOIN adj ON adj.a = t.v
    WHERE t.lab < adj.b
  ) SELECT v, MIN(lab) AS label FROM t GROUP BY v
),
rl AS (SELECT e.kind, e.road_id, w.label FROM ends e JOIN w ON w.v = e.ka),
per AS (SELECT kind, label, CAST(COUNT(*) AS BIGINT) AS n
        FROM rl GROUP BY 1, 2)
SELECT kind, CAST(SUM(n) AS BIGINT) AS n_roads,
       CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(MAX(n) AS BIGINT) AS largest_comp
FROM per GROUP BY kind
"""


def _supercover_sql(roads_pq: str) -> str:
    """roads_supercover_cells: the SAME column-sweep supercover SPEC
    (shared grid_index_expr + interpolation text, so FLOOR boundary
    cells agree bit-for-bit); plumbing is unnest/generate_series vs
    explode/sequence."""
    from .queries_r5 import _SC_LEVEL
    from .sqlgen import grid_index_expr

    n = 1 << _SC_LEVEL
    bnd = "(CAST({k} AS DOUBLE) * (CAST(10 AS DOUBLE) / CAST(%d AS DOUBLE)))" % n
    gi = grid_index_expr
    return f"""
WITH raw AS (
  SELECT kind, coords AS cs FROM read_parquet('{roads_pq}')
),
segp AS (
  SELECT kind, cs[i].x AS ax, cs[i].y AS ay,
         cs[i + 1].x AS bx, cs[i + 1].y AS by
  FROM (SELECT kind, cs,
               unnest(generate_series(1, len(cs) - 1)) AS i FROM raw)
),
segs AS (
  SELECT kind,
         CASE WHEN bx < ax THEN bx ELSE ax END AS x1,
         CASE WHEN bx < ax THEN by ELSE ay END AS y1,
         CASE WHEN bx < ax THEN ax ELSE bx END AS x2,
         CASE WHEN bx < ax THEN ay ELSE by END AS y2
  FROM segp
),
cols0 AS (
  SELECT kind, x1, y1, x2, y2,
         unnest(generate_series({gi('x1', _SC_LEVEL)},
                                {gi('x2', _SC_LEVEL)})) AS k
  FROM segs
),
colsx AS (
  SELECT kind, k,
         GREATEST(x1, {bnd.format(k='k')}) AS xa,
         LEAST(x2, {bnd.format(k='k + 1')}) AS xb,
         x1, y1, x2, y2
  FROM cols0
),
cols AS (
  SELECT kind, k,
         CASE WHEN x2 = x1 THEN LEAST(y1, y2)
           ELSE y1 + (y2 - y1) * (xa - x1) / (x2 - x1) END AS ya,
         CASE WHEN x2 = x1 THEN GREATEST(y1, y2)
           ELSE y1 + (y2 - y1) * (xb - x1) / (x2 - x1) END AS yb
  FROM colsx
),
cells AS (
  SELECT kind, k AS ix,
         unnest(generate_series(
           LEAST({gi('ya', _SC_LEVEL)}, {gi('yb', _SC_LEVEL)}),
           GREATEST({gi('ya', _SC_LEVEL)}, {gi('yb', _SC_LEVEL)}))) AS iy
  FROM cols
),
per_cell AS (
  SELECT kind, ix, iy, CAST(COUNT(*) AS BIGINT) AS visits
  FROM cells GROUP BY 1, 2, 3
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(visits) AS BIGINT) AS n_visits,
       CAST(SUM(ix * {n} + iy) AS BIGINT) AS cell_chk
FROM per_cell GROUP BY kind
"""


def image_oracles_r5() -> dict[str, str]:
    """Lazily-built golden-backed oracles (absolute fixture/golden
    paths, fixture ensured on build — same mechanics as
    oracles_ext.image_oracles)."""
    import os

    from .jobs.rai import fixture_dir

    roads_pq = os.path.join(fixture_dir(0.01), "roads.parquet").replace("'", "''")
    img = os.path.join(fixture_dir(0.01), "images.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    # roads_simplify_dp: counts/bitmask from the committed recursive-DP
    # golden; kind joins from the fixture parquet so the roads read is
    # load-bearing on BOTH sides.
    dp = f"""
SELECT g.road_id, r.kind, g.n_pts, g.n_kept, g.kept_mask
FROM read_parquet('{gdir}/dp_simplify_sf0.01.parquet') g
JOIN read_parquet('{roads_pq}') r USING (road_id)
"""
    # image_hillshade: checksums from the committed clamp-indexed Horn
    # golden, restricted to the same harness subset/fmt filter as the
    # Spark side (fixture join keeps the filter load-bearing).
    hill = f"""
SELECT g.image_id, g.n_px, g.sum_shade, g.min_shade, g.max_shade
FROM read_parquet('{gdir}/hillshade_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    # image_sobel_edges: same policy/filter as hillshade, golden from
    # the clamp-indexed integer Sobel twin (all int64 — exact parity).
    sob = f"""
SELECT g.image_id, g.n_px, g.n_edges, g.sum_mag, g.max_mag
FROM read_parquet('{gdir}/sobel_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    # image_flow_d8: same policy/filter; golden from the stacked-argmax
    # + postorder-DFS accumulation twin (all int64 — exact parity).
    d8 = f"""
SELECT g.image_id, g.n_px, g.n_sinks, g.sum_acc, g.max_acc, g.chk
FROM read_parquet('{gdir}/flow_d8_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    # image_watershed / image_viewshed / image_pit_fill: same
    # policy/filter; goldens from algorithm-independent twins (chain
    # walking / max-slope rationals / Bellman fixpoint — see
    # scripts/make_goldens.py).  All int64 — exact parity.
    wsh = f"""
SELECT g.image_id, g.n_px, g.n_basins, g.largest_px, g.sum_sq, g.chk
FROM read_parquet('{gdir}/watershed_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    vsh = f"""
SELECT g.image_id, g.n_px, g.n_visible, g.sum_vis_lum, g.chk
FROM read_parquet('{gdir}/viewshed_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    pit = f"""
SELECT g.image_id, g.n_px, g.n_raised, g.sum_delta, g.chk
FROM read_parquet('{gdir}/pitfill_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    glcm = f"""
SELECT g.image_id, g.n_pairs, g.contrast, g.energy, g.homog_mils
FROM read_parquet('{gdir}/glcm_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    qt = f"""
SELECT g.image_id, g.n_px, g.n_leaves, g.max_depth, g.sum_range,
       g.sum_depth_px
FROM read_parquet('{gdir}/quadtree_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""
    # image_zonal_stats: per-country luminance stats from the decode
    # golden (pixels) x the rai golden (country assignment) — both
    # INDEPENDENT generator-side twins; mils snap before SUM makes the
    # per-zone fold integer-exact on both engines.
    zonal = f"""
WITH m AS (
  SELECT r.country_code,
         CAST(FLOOR(g.mean_lum * 1000.0 + 0.5) AS BIGINT) AS lum_mils
  FROM read_parquet('{gdir}/decode_stats_sf0.01.parquet') g
  JOIN read_parquet('{gdir}/rai_per_image_sf0.01.parquet') r USING (image_id)
  JOIN read_parquet('{img}') f USING (image_id)
  WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
)
SELECT country_code, COUNT(*) AS n_images,
       CAST(SUM(lum_mils) AS BIGINT) AS sum_lum_mils,
       MIN(lum_mils) AS min_lum_mils, MAX(lum_mils) AS max_lum_mils
FROM m GROUP BY country_code
"""
    from .queries_r5 import PYR_SIMPLIFY_EPS

    pyr_golden = f"{gdir}/pyramid_simplified_sf0.01.parquet"
    legs = "\nUNION ALL\n".join(
        f"SELECT z, COUNT(*) AS n_tiles, "
        f"CAST(SUM(n_features) AS BIGINT) AS sum_features "
        f"FROM ({_pyr_simp_leg_sql(z, pyr_golden)}) GROUP BY z"
        for z in sorted(PYR_SIMPLIFY_EPS)
    )
    from .queries_r5 import _BFS_NODE

    node = _BFS_NODE.format(x="c.x", y="c.y")
    bfs = f"""
WITH RECURSIVE
nds AS (SELECT list_transform(coords, c -> {node}) AS nds
        FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
e AS (SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM ab
        UNION ALL SELECT b AS src, a AS dst FROM ab)
      WHERE src <> dst),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
seed AS (SELECT src AS node FROM deg ORDER BY deg DESC, src ASC LIMIT 1),
walk(node, hops) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < 16
),
lab AS (SELECT node, MIN(hops) AS hops FROM walk GROUP BY node)
SELECT CAST(hops AS INT) AS hops, COUNT(*) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_node
FROM lab GROUP BY hops
"""
    # closeness_roads: the BFS recursive walk generalized to a labeled
    # (seed, node) pair walk over the SAME quantized graph.
    closeness = f"""
WITH RECURSIVE
nds AS (SELECT list_transform(coords, c -> {node}) AS nds
        FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
e AS (SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM ab
        UNION ALL SELECT b AS src, a AS dst FROM ab)
      WHERE src <> dst),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
seeds AS (SELECT src AS seed FROM deg ORDER BY deg DESC, src ASC LIMIT 5),
walk(seed, node, hops) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION
  SELECT w.seed, e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < 16
),
lab AS (SELECT seed, node, MIN(hops) AS hops FROM walk GROUP BY seed, node)
SELECT seed, CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       CAST(SUM(hops) AS BIGINT) AS sum_hops,
       CAST(FLOOR(1000000.0 * (COUNT(*) - 1) / SUM(hops)) AS BIGINT)
         AS closeness_micros
FROM lab GROUP BY seed
"""

    # triangle_count_roads: identical degree-ordered orientation over
    # the same quantized road graph (shared _BFS_NODE fragment).
    tri = f"""
WITH nds AS (SELECT list_transform(coords, c -> {node}) AS nds
             FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM ab WHERE a <> b),
deg AS (SELECT nd, COUNT(*) AS deg FROM (
          SELECT u AS nd FROM und UNION ALL SELECT v AS nd FROM und)
        GROUP BY nd),
o AS (SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
                  THEN u ELSE v END AS s,
             CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
                  THEN v ELSE u END AS d
      FROM und JOIN deg du ON du.nd = und.u JOIN deg dv ON dv.nd = und.v),
tri AS (SELECT e1.s AS x, e1.d AS y, e2.d AS z
        FROM o e1 JOIN o e2 ON e2.s = e1.d
        JOIN o e3 ON e3.s = e1.s AND e3.d = e2.d)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST(COALESCE(SUM(x + y + z), 0) AS BIGINT) AS sum_nodes
FROM tri
"""
    # country_convex_hull: hull size/area from the committed scalar
    # monotone-chain golden; n_points (distinct vertices) recomputed
    # relationally from the same roads parquet (load-bearing explode).
    hull = f"""
WITH v AS (SELECT country_code, u.c.x AS x, u.c.y AS y
           FROM read_parquet('{roads_pq}'), UNNEST(coords) AS u(c)),
d AS (SELECT DISTINCT country_code, x, y FROM v),
n AS (SELECT country_code, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM d GROUP BY country_code)
SELECT g.country_code, n.n_points, g.n_hull, g.area_mils
FROM read_parquet('{gdir}/hull_sf0.01.parquet') g
JOIN n USING (country_code)
"""
    # link_prediction_roads: identical und/deg/wedge construction with
    # the same deg<=32 hub bound and FLOOR(1e6/deg) BIGINT RA terms.
    lp = f"""
WITH nds AS (SELECT list_transform(coords, c -> {node}) AS nds
             FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM ab WHERE a <> b),
deg AS (SELECT nd, COUNT(*) AS deg FROM (
          SELECT u AS nd FROM und UNION ALL SELECT v AS nd FROM und)
        GROUP BY nd),
nbr AS (SELECT u AS z, v AS nb FROM und
        UNION ALL SELECT v AS z, u AS nb FROM und),
nbrs AS (SELECT nbr.z, nbr.nb, deg.deg AS degz
         FROM nbr JOIN deg ON deg.nd = nbr.z WHERE deg.deg <= 32),
pairs AS (SELECT x.z, x.degz, x.nb AS a, y.nb AS b
          FROM nbrs x JOIN nbrs y ON y.z = x.z AND x.nb < y.nb),
cand AS (SELECT pairs.* FROM pairs
         WHERE NOT EXISTS (SELECT 1 FROM und
                           WHERE und.u = pairs.a AND und.v = pairs.b))
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_common,
       CAST(SUM(CAST(FLOOR(1000000 / degz) AS BIGINT)) AS BIGINT) AS ra_u
FROM cand GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""
    # spatial_dbscan: identical quantization fragments; reachability
    # min via a pruned recursive CTE (labels only propagate downhill —
    # the component min passes every check, so MIN(lab) is exact).
    from .queries_r5 import _DB_IX, _DB_IY, _DB_MINPTS

    dbscan = f"""
WITH v AS (SELECT u.c.x AS x, u.c.y AS y
           FROM read_parquet('{roads_pq}'), UNNEST(coords) AS u(c)),
g AS (SELECT {_DB_IX} AS ix, {_DB_IY} AS iy FROM v),
cells AS (SELECT ix, iy, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
ncn AS (SELECT c.ix, c.iy, c.cnt, SUM(o.cnt) AS nc
        FROM cells c JOIN cells o
          ON ABS(o.ix - c.ix) <= 1 AND ABS(o.iy - c.iy) <= 1
        GROUP BY 1, 2, 3),
core AS (SELECT ix, iy, ix * 4096 + iy AS k, cnt
         FROM ncn WHERE nc >= {_DB_MINPTS}),
adj AS (SELECT a.k AS ka, b.k AS kb FROM core a JOIN core b
        ON ABS(a.ix - b.ix) <= 1 AND ABS(a.iy - b.iy) <= 1 AND a.k <> b.k),
w AS (
  WITH RECURSIVE t(cell, lab) AS (
    SELECT k, k FROM core
    UNION
    SELECT adj.kb, t.lab FROM t JOIN adj ON adj.ka = t.cell
    WHERE t.lab < adj.kb
  ) SELECT cell, MIN(lab) AS label FROM t GROUP BY cell
),
core_lab AS (SELECT w.label, core.cnt, core.k, CAST(1 AS BIGINT) AS is_core
             FROM core JOIN w ON w.cell = core.k),
noncore AS (SELECT c.ix, c.iy, c.cnt FROM cells c
            WHERE NOT EXISTS (SELECT 1 FROM core
                              WHERE core.ix = c.ix AND core.iy = c.iy)),
battach AS (
  SELECT n.ix * 4096 + n.iy AS k, MAX(n.cnt) AS cnt,
         MIN(w.label) AS label, CAST(0 AS BIGINT) AS is_core
  FROM noncore n JOIN core
    ON ABS(core.ix - n.ix) <= 1 AND ABS(core.iy - n.iy) <= 1
  JOIN w ON w.cell = core.k
  GROUP BY 1
),
allc AS (SELECT label, cnt, k, is_core FROM core_lab
         UNION ALL SELECT label, cnt, k, is_core FROM battach)
SELECT label AS cluster_id, CAST(SUM(is_core) AS BIGINT) AS n_core,
       CAST(SUM(1 - is_core) AS BIGINT) AS n_border,
       CAST(SUM(cnt) AS BIGINT) AS n_points,
       CAST(SUM(k) AS BIGINT) AS checksum
FROM allc GROUP BY 1
"""
    # label_propagation_roads: the identical 4 fixed rounds as a LINEAR
    # chain (each l_i references l_{i-1} exactly once — no 2^rounds
    # re-inline; dirs is constant-depth and safe to reference per round).
    from .queries_r5 import _LPA_ROUNDS, _VOR_Q, _VOR_SEEDS

    rounds_sql = []
    for i in range(1, _LPA_ROUNDS + 1):
        rounds_sql.append(
            f"c{i} AS (SELECT d.dst AS v2, l.label, COUNT(*) AS cnt\n"
            f"  FROM dirs d JOIN l{i - 1} l ON l.v = d.src GROUP BY 1, 2),\n"
            f"l{i} AS (SELECT v2 AS v, label FROM c{i}\n"
            f"  QUALIFY ROW_NUMBER() OVER (PARTITION BY v2"
            f" ORDER BY cnt DESC, label) = 1)"
        )
    lpa = f"""
WITH nds AS (SELECT list_transform(coords, c -> {node}) AS nds
             FROM read_parquet('{roads_pq}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM ab WHERE a <> b),
dirs AS (SELECT u AS src, v AS dst FROM und
         UNION ALL SELECT v AS src, u AS dst FROM und),
l0 AS (SELECT DISTINCT src AS v, src AS label FROM dirs),
{",".join(rounds_sql)}
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(v) AS BIGINT) AS checksum
FROM l{_LPA_ROUNDS} GROUP BY 1
"""
    vx = _VOR_Q.format(c="coords[i].x")
    vy = _VOR_Q.format(c="coords[i].y")
    s1x = _VOR_Q.format(c="coords[1].x")
    s1y = _VOR_Q.format(c="coords[1].y")
    vor = f"""
WITH pts AS (SELECT road_id, i, {vx} AS px, {vy} AS py
             FROM read_parquet('{roads_pq}'),
                  UNNEST(generate_series(1, len(coords))) AS u(i)),
seeds AS (SELECT road_id AS seed, {s1x} AS sx, {s1y} AS sy
          FROM read_parquet('{roads_pq}') WHERE road_id < {_VOR_SEEDS}),
cand AS (SELECT road_id, i, seed,
                (px - sx) * (px - sx) + (py - sy) * (py - sy) AS d2
         FROM pts, seeds),
best AS (SELECT road_id, i, seed, d2 FROM cand
         QUALIFY ROW_NUMBER() OVER (PARTITION BY road_id, i
                                    ORDER BY d2, seed) = 1)
SELECT seed, CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(d2) AS BIGINT) AS sum_d2
FROM best GROUP BY 1
"""
    # source_binaryfile_images: DuckDB fingerprints the SAME blobs
    # straight from the source parquet (hex -> md5 -> 48-bit fold, the
    # shared conv()-free fragment); Spark fingerprints the exported
    # files read back via binaryFile — any export/scan corruption
    # flips a sum.
    from .queries_r5 import _b12_cells as _b12

    bf_cells = _b12("h", 4)
    bf_fp = " + ".join(
        f"({c} * {4096 ** (3 - j)})" for j, c in enumerate(bf_cells)
    )
    binf = f"""
WITH f AS (
  SELECT fmt, CAST(octet_length(bytes) AS BIGINT) AS len,
         md5(hex(bytes)) AS h
  FROM read_parquet('{img}')
  WHERE image_id < 'img000000000200'
)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(len) AS BIGINT) AS sum_len,
       CAST(SUM({bf_fp}) AS BIGINT) AS sum_fp
FROM f GROUP BY 1
"""
    return {"link_prediction_roads": lp,
            "source_binaryfile_images": binf,
            "label_propagation_roads": lpa,
            "voronoi_assign": vor,
            "spatial_dbscan": dbscan,
            "image_sobel_edges": sob,
            "image_flow_d8": d8,
            "image_watershed": wsh,
            "image_viewshed": vsh,
            "image_pit_fill": pit,
            "image_texture_glcm": glcm,
            "image_quadtree": qt,
            "roads_supercover_cells": _supercover_sql(roads_pq),
            "roads_dissolve": _dissolve_sql(roads_pq),
            "image_slope_aspect": f"""
SELECT g.image_id, g.n_px, g.n_flat, g.hist_chk, g.n_steep, g.sum_s2
FROM read_parquet('{gdir}/slope_aspect_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
            "image_strahler": f"""
SELECT g.image_id, g.n_px, g.max_order, g.sum_order, g.n_ge2, g.chk
FROM read_parquet('{gdir}/strahler_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
            "image_hist_equalize": f"""
SELECT g.image_id, g.n_px, g.sum_eq, g.n_levels_out, g.max_eq, g.chk
FROM read_parquet('{gdir}/hist_equalize_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
            "image_morphology": f"""
SELECT g.image_id, g.n_px, g.sum_erode, g.sum_dilate, g.n_edge, g.chk
FROM read_parquet('{gdir}/morphology_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
            "roads_simplify_dp": dp, "image_hillshade": hill,
            "image_zonal_stats": zonal,
            "mvt_pyramid_simplified": legs,
            "road_graph_bfs": bfs,
            "closeness_roads": closeness,
            "triangle_count_roads": tri,
            "kcore_roads": _kcore_sql(roads_pq, node),
            "cells_line_density": _line_density_sql(roads_pq),
            "shortest_path_weighted": _spw_sql(roads_pq, node),
            "route_interpolate": _route_interp_sql(roads_pq),
            "roads_sinuosity": _sinuosity_sql(roads_pq),
            "roads_buffer_cells": _buffer_cells_sql(roads_pq),
            "road_intersections": _road_intersections_sql(roads_pq),
            "country_convex_hull": hull,
            "image_regions": f"""
SELECT g.image_id, g.n_regions, g.largest_px, g.n_fg
FROM read_parquet('{gdir}/regions_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
            "multimodal_audio_stft": f"""
SELECT media_id, frame_idx, energy, centroid_hz
FROM read_parquet('{gdir}/audio_stft.parquet')
""",
            "image_contours": f"""
SELECT g.image_id, g.n_cells, g.n_crossed, g.n_segments, g.sum_case
FROM read_parquet('{gdir}/contours_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
"""}
