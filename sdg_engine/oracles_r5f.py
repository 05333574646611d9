"""DuckDB oracle twins for queries_r5f (wave 26)."""

from __future__ import annotations

import os

from .queries_r5f import _DAY_US

ORACLES_R5F: dict[str, str] = {}

# COW delete: relational content aggregate + pinned maintenance counts
# (3 of 5 dirs held victims; the pre-delete head reads all 500 rows).
ORACLES_R5F["snapshot_cow_delete"] = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(3 AS INT) AS n_dirs_rewritten,
       CAST(2 AS INT) AS n_dirs_carried,
       CAST(500 AS BIGINT) AS pre_delete_rows
FROM documents
WHERE doc_id < 500 AND NOT (doc_id >= 150 AND doc_id < 350)
GROUP BY lang
"""

ORACLES_R5F["brand_affinity_cf"] = """
WITH cb AS (
  SELECT DISTINCT o.o_custkey AS cust, p.p_brand AS brand
  FROM lineitem li
  JOIN part p ON li.l_partkey = p.p_partkey
  JOIN orders o ON li.l_orderkey = o.o_orderkey
),
nb AS (SELECT brand, COUNT(*) AS n_cust FROM cb GROUP BY brand),
pairs AS (
  SELECT x.brand AS a, y.brand AS b, COUNT(*) AS n_both
  FROM cb x JOIN cb y ON x.cust = y.cust AND x.brand < y.brand
  GROUP BY 1, 2
),
scored AS (
  SELECT a, b, n_both,
         n_both * n_both * 1000000 // (na.n_cust * nbb.n_cust)
           AS cos2_micros
  FROM pairs
  JOIN nb na ON na.brand = pairs.a
  JOIN nb nbb ON nbb.brand = pairs.b
),
sym AS (
  SELECT a AS brand, b AS rec_brand, n_both, cos2_micros FROM scored
  UNION ALL
  SELECT b AS brand, a AS rec_brand, n_both, cos2_micros FROM scored
)
SELECT brand, rec_brand, n_both, CAST(cos2_micros AS BIGINT) AS cos2_micros,
       rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY brand
            ORDER BY cos2_micros DESC, rec_brand ASC) AS rnk
  FROM sym
)
WHERE rnk <= 3
"""

ORACLES_R5F["events_wilcoxon"] = f"""
WITH daily AS (
  SELECT epoch_us(ts) // {_DAY_US} AS d,
         CAST(SUM(CASE WHEN event_type = 'view'
              THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END)
           AS BIGINT) AS x,
         CAST(SUM(CASE WHEN event_type = 'click'
              THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END)
           AS BIGINT) AS y
  FROM events GROUP BY 1
),
diffs AS (
  SELECT d, x - y AS diff, ABS(x - y) AS a
  FROM daily WHERE x IS NOT NULL AND y IS NOT NULL AND x <> y
),
dist AS (
  SELECT a, COUNT(*) AS c_eq,
         CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos
  FROM diffs GROUP BY a
),
ranked AS (
  SELECT c_eq, n_pos,
         COALESCE(2 * (SUM(c_eq) OVER (ORDER BY a
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), 0)
           + c_eq + 1 AS r2
  FROM dist
)
SELECT CAST(SUM(c_eq) AS BIGINT) AS n_pairs,
       CAST(SUM(r2 * n_pos) AS BIGINT) AS w2_plus,
       CAST(SUM(r2 * (c_eq - n_pos)) AS BIGINT) AS w2_minus
FROM ranked
"""

ORACLES_R5F["observe_scan_metrics"] = """
WITH base AS (
  SELECT o_orderstatus AS status,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents,
       CAST(COUNT(DISTINCT status) AS BIGINT) AS n_groups,
       CAST(COUNT(*) AS BIGINT) AS group_rows,
       CAST(SUM(cents) AS BIGINT) AS group_cents
FROM base
"""


# Streaming python-datasource drain: the same counter arithmetic over
# DuckDB range() — the SPEC fragments are shared module constants.
def _tick_sql() -> str:
    from .queries_r5f import _TICK_CENTS, _TICK_HR, _TICK_N

    hr = _TICK_HR.replace(" DIV ", " // ")
    return f"""
WITH t AS (
  SELECT {hr} AS hr, {_TICK_CENTS} AS cents
  FROM range(0, {_TICK_N}) r(i)
)
SELECT hr, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM t GROUP BY hr
"""


ORACLES_R5F["streaming_pysource_windows"] = _tick_sql()


def _anova_sql() -> str:
    from .queries_r5f import _EV_TYPES, _anova_f_expr

    per = ",\n         ".join(
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{t},\n         "
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN cents ELSE 0 END)"
        f" AS BIGINT) AS s_{t},\n         "
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN cents * cents"
        f" ELSE 0 END) AS BIGINT) AS q_{t}"
        for t in _EV_TYPES
    )
    cols = ", ".join(f"n_{t}" for t in _EV_TYPES)
    return f"""
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
piv AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
         CAST(SUM(cents) AS BIGINT) AS s_all,
         {per}
  FROM ev
)
SELECT n_all, {cols}, {_anova_f_expr()} AS f_micros FROM piv
"""


ORACLES_R5F["events_anova"] = _anova_sql()


def _circ_sql() -> str:
    from .queries_r5f import _circ_luts

    cos_e, sin_e = _circ_luts()
    return f"""
WITH ev AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS h FROM events
),
fp AS (SELECT event_type, {cos_e} AS c1, {sin_e} AS s1 FROM ev),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c1) AS BIGINT) AS c_fp, CAST(SUM(s1) AS BIGINT) AS s_fp
  FROM fp GROUP BY event_type
)
SELECT event_type, n, c_fp, s_fp,
       CAST((c_fp * c_fp + s_fp * s_fp) // (n * n) * 1000000
            // 1048576 AS BIGINT) AS r2_ppm
FROM agg
"""


ORACLES_R5F["events_hour_circular"] = _circ_sql()

ORACLES_R5F["pipe_syntax_revenue"] = """
WITH base AS (
  SELECT l_returnflag AS rf,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_quantity >= 10
),
agg AS (
  SELECT rf, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS sum_cents,
         CAST(SUM(qty) AS BIGINT) AS sum_qty
  FROM base GROUP BY rf
)
SELECT rf, n, sum_cents, sum_qty, sum_cents // n AS avg_cents
FROM agg WHERE n > 0
"""

ORACLES_R5F["orders_cohort_ltv"] = """
WITH o AS (
  SELECT o_custkey AS cust,
         CAST(EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
first AS (SELECT cust, MIN(m) AS cm FROM o GROUP BY cust),
aged AS (
  SELECT o.cust, f.cm, o.m - f.cm AS age, o.cents
  FROM o JOIN first f ON o.cust = f.cust
),
sz AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS n_cohort FROM first
       GROUP BY cm),
cell AS (
  SELECT cm, age, CAST(SUM(cents) AS BIGINT) AS cents,
         CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_active
  FROM aged GROUP BY cm, age
),
cum AS (
  SELECT cm, age, n_active,
         CAST(SUM(cents) OVER (PARTITION BY cm ORDER BY age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM cell
)
SELECT cum.cm, age, n_active, sz.n_cohort,
       cum_cents // sz.n_cohort AS ltv_cents
FROM cum JOIN sz ON cum.cm = sz.cm
"""


ORACLES_R5F["events_pinball_eval"] = """
WITH ev AS (
  SELECT event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
gd AS (SELECT cents, COUNT(*) AS c FROM ev GROUP BY cents),
gq AS (
  SELECT CAST(MIN(cents) AS BIGINT) AS pred_global FROM (
    SELECT cents,
           SUM(c) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW) AS cum,
           SUM(c) OVER () AS n
    FROM gd
  ) WHERE cum >= (3 * n + 3) // 4
),
td AS (SELECT event_type, cents, COUNT(*) AS c FROM ev GROUP BY 1, 2),
tq AS (
  SELECT event_type, CAST(MIN(cents) AS BIGINT) AS pred_type FROM (
    SELECT event_type, cents,
           SUM(c) OVER (PARTITION BY event_type ORDER BY cents ROWS
             BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(c) OVER (PARTITION BY event_type) AS n
    FROM td
  ) WHERE cum >= (3 * n + 3) // 4
  GROUP BY event_type
)
SELECT ev.event_type, gq.pred_global, tq.pred_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN cents >= pred_global
            THEN 3 * (cents - pred_global)
            ELSE pred_global - cents END) AS BIGINT) AS loss4_global,
       CAST(SUM(CASE WHEN cents >= pred_type
            THEN 3 * (cents - pred_type)
            ELSE pred_type - cents END) AS BIGINT) AS loss4_type
FROM ev
JOIN tq ON ev.event_type = tq.event_type
CROSS JOIN gq
GROUP BY 1, 2, 3
"""


def _simhash_pairs_sql() -> str:
    """Reuses the certified SIMHASH60 signature CTE verbatim, then the
    band explode + dedup-before-verify pair join."""
    from .oracles_ext import SIMHASH60

    body = SIMHASH60.strip()
    assert body.startswith("WITH")
    inner = body[len("WITH"):].rsplit("SELECT", 1)
    # re-wrap: the final SELECT of SIMHASH60 becomes a CTE `sigs`
    return f"""
WITH{inner[0]},
sigs AS (SELECT{inner[1]}),
bands AS (
  SELECT doc_id, simhash, k, (simhash >> (12 * k)) & 4095 AS bv
  FROM sigs, UNNEST(generate_series(0, 4)) AS u(k)
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, x.simhash AS sa,
         y.doc_id AS b, y.simhash AS sb
  FROM bands x JOIN bands y ON x.k = y.k AND x.bv = y.bv
  WHERE x.doc_id < y.doc_id
)
SELECT a AS doc_a, b AS doc_b,
       CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= 6
"""


ORACLES_R5F["simhash_neardup_pairs"] = _simhash_pairs_sql()


_ZTEST_Z = (
    "(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    " - CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
    " / sqrt((CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    " * (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))"
    " * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))"
)

ORACLES_R5F["events_conversion_ztest"] = f"""
WITH ev AS (
  SELECT epoch_us(ts) AS us,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
  FROM events
),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
halves AS (
  SELECT CASE WHEN us < mid THEN 0 ELSE 1 END AS half, hit
  FROM ev CROSS JOIN mid
),
piv AS (
  SELECT CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN half = 0 THEN hit ELSE 0 END) AS BIGINT) AS x1,
         CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN half = 1 THEN hit ELSE 0 END) AS BIGINT) AS x2
  FROM halves
)
SELECT n1, x1, n2, x2,
       x1 * 1000000 // n1 AS rate1_ppm,
       x2 * 1000000 // n2 AS rate2_ppm,
       CAST(FLOOR(1000000.0 * ({_ZTEST_Z})) AS BIGINT) AS z_micros
FROM piv
"""

ORACLES_R5F["events_hhi_concentration"] = """
WITH per AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS s
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(s) AS BIGINT) AS total_cents,
       CAST(CAST(SUM(s * s) AS BIGINT)
            // (CAST(SUM(s) AS BIGINT) * CAST(SUM(s) AS BIGINT)
                // 1000000) AS BIGINT) AS hhi_ppm
FROM per GROUP BY event_type
"""


def _tfidf_topk_sql() -> str:
    from .queries_r5f import _TFIDF_QUERY_DOC, _TFIDF_TOPK, _TFIDF_W

    w = _TFIDF_W.replace(" DIV ", " // ")
    return f"""
WITH tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        FROM documents)
  WHERE length(tok) > 0
  GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       FROM documents),
w AS (
  SELECT doc_id, tf.tok, CAST({w} AS BIGINT) AS w
  FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN nd
),
norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS nrm2 FROM w
          GROUP BY doc_id),
qv AS (SELECT tok, w AS wq FROM w WHERE doc_id = {_TFIDF_QUERY_DOC}),
dots AS (
  SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(w.w * qv.wq) AS BIGINT) AS dot
  FROM w JOIN qv ON w.tok = qv.tok
  WHERE w.doc_id <> {_TFIDF_QUERY_DOC}
  GROUP BY w.doc_id
),
qn AS (SELECT nrm2 AS nq FROM norms WHERE doc_id = {_TFIDF_QUERY_DOC}),
scored AS (
  SELECT dots.doc_id, n_shared,
         CAST(FLOOR(1000000.0 * CAST(dot AS DOUBLE)
              / (sqrt(CAST(norms.nrm2 AS DOUBLE))
                 * sqrt(CAST(qn.nq AS DOUBLE)))) AS BIGINT) AS cos_micros
  FROM dots JOIN norms ON norms.doc_id = dots.doc_id CROSS JOIN qn
)
SELECT doc_id, n_shared, cos_micros, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cos_micros DESC, doc_id ASC)
    AS rnk
  FROM scored
) WHERE rnk <= {_TFIDF_TOPK}
"""


ORACLES_R5F["tfidf_cosine_topk"] = _tfidf_topk_sql()


def fixture_oracles_r5f() -> dict[str, str]:
    """Lazily-built oracles embedding absolute fixture/golden paths."""
    from .jobs.rai import fixture_dir
    from .queries_r5 import _BFS_NODE
    from .queries_r5e import _DIAM_MAX_HOPS

    fdir = fixture_dir(0.01)
    img = os.path.join(fdir, "images.parquet").replace("'", "''")
    roads = os.path.join(fdir, "roads.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    node = _BFS_NODE.format(x="c.x", y="c.y")
    bipartite = f"""
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
walk(node, hops) AS (
  SELECT node, 0 FROM hub
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {_DIAM_MAX_HOPS}
),
lab AS (SELECT node, MIN(hops) % 2 AS par FROM walk GROUP BY node),
conf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_comp,
         CAST(SUM(CASE WHEN pa.par = pb.par THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conflicts
  FROM e
  JOIN lab pa ON pa.node = e.src
  JOIN lab pb ON pb.node = e.dst
  WHERE e.src < e.dst
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lab) AS n_visited,
       n_edges_comp, n_conflicts,
       CAST(CASE WHEN n_conflicts = 0 THEN 1 ELSE 0 END AS INT)
         AS is_bipartite
FROM conf
"""
    return {
        "roads_bipartite_check": bipartite,
        "image_harris_corners": f"""
SELECT g.image_id, g.n_interior, g.n_corners, g.sum_rq, g.max_r, g.chk
FROM read_parquet('{gdir}/harris_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_skeleton_zs": f"""
SELECT g.image_id, g.n_fg, g.n_skel, g.n_iters, g.chk
FROM read_parquet('{gdir}/skeleton_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "bpe_encode_docs": f"""
SELECT lang, n_docs, sum_words, sum_tokens, sum_chars
FROM read_parquet('{gdir}/bpe_encode_sf0.01.parquet')
""",
        "doc_zlib_ratio": f"""
SELECT lang, n_docs, sum_raw, sum_comp,
       sum_comp * 1000 // sum_raw AS ratio_mils
FROM read_parquet('{gdir}/zlib_sf0.01.parquet')
""",
        "image_lbp_texture": f"""
SELECT g.image_id, g.n_interior, g.n_uniform, g.sum_code, g.chk
FROM read_parquet('{gdir}/lbp_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_canny_nms": f"""
SELECT g.image_id, g.n_raw, g.n_thin, g.chk
FROM read_parquet('{gdir}/canny_nms_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_dither_fs": f"""
SELECT g.image_id, g.n_px, g.n_on, g.chk
FROM read_parquet('{gdir}/dither_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "multimodal_audio_decimate": f"""
SELECT media_id, n_in, n_out, sum_abs, max_abs, chk
FROM read_parquet('{gdir}/audio_decimate.parquet')
""",
        "image_dog_blobs": f"""
SELECT g.image_id, g.n_core, g.n_bright, g.n_dark, g.sum_absdog, g.chk
FROM read_parquet('{gdir}/dog_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
    }
