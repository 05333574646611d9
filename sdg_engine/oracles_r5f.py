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


def fixture_oracles_r5f() -> dict[str, str]:
    """Lazily-built oracles embedding absolute fixture/golden paths."""
    from .jobs.rai import fixture_dir

    fdir = fixture_dir(0.01)
    img = os.path.join(fdir, "images.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    return {
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
    }
