"""DuckDB oracle SQL for every query in queries.py (SURVEY.md §5.1).

The driver runs these on the same parquet (views pre-registered) and
compares row count + schema + order-insensitive value hash against the
Spark result.  Spatial oracles are *generated from the same sqlgen
fragments* the Spark plans execute, so doubles are bit-identical; they
also deliberately use an INDEPENDENT formulation where possible (e.g.
kNN is brute-force cross-join here vs cell-pruned join in Spark) so
the check validates semantics, not just plumbing.
"""

from __future__ import annotations

from .harness import (
    AX,
    AY,
    BX,
    BY,
    KNN_CUTOFF_M,
    NODE_X,
    NODE_Y,
    PX,
    PY,
    edges_values_sql,
    edges_values_sql_indexed,
)
from .sqlgen import (
    chain_select,
    grid_index_expr,
    hex_cell_steps,
    point_cell_steps,
    point_seg_dist_steps,
)

# note: column "by" is reserved-ish in SQL; oracles use "byy"
_PTS = f"SELECT o_orderkey AS point_id, {PX} AS lon, {PY} AS lat FROM orders"
_SEGS = (
    f"SELECT s_suppkey AS road_id, {AX} AS ax, {AY} AS ay, "
    f"{BX} AS bx, {BY} AS byy FROM supplier"
)

_DIST_STEPS = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "byy", "dist_m")

_KNN_RANKED = f"""
WITH pts AS ({_PTS}),
segs AS ({_SEGS}),
cand AS (SELECT * FROM pts CROSS JOIN segs),
d AS ({chain_select("SELECT * FROM cand", _DIST_STEPS, ["point_id", "road_id", "dist_m"])}),
hit AS (SELECT * FROM d WHERE dist_m <= CAST({int(KNN_CUTOFF_M)} AS DOUBLE)),
ranked AS (
  SELECT point_id, road_id, dist_m,
         ROW_NUMBER() OVER (PARTITION BY point_id ORDER BY dist_m ASC, road_id ASC) AS rn
  FROM hit
)
"""

SPATIAL_KNN_NEAREST = (
    _KNN_RANKED
    + "SELECT point_id, road_id, ROUND(dist_m, 6) AS dist_m FROM ranked WHERE rn = 1"
)

# J4b top-k: the harness roads are single-segment, so the per-segment
# rank IS the per-road rank; the Spark side's per-road MIN is exercised
# generically and degenerates to identity here.
SPATIAL_KNN_TOPK = (
    _KNN_RANKED
    + "SELECT point_id, road_id, ROUND(dist_m, 6) AS dist_m, "
      "CAST(rn AS INT) AS rnk FROM ranked WHERE rn <= 3"
)

_PIP_CC = f"""
cc AS (
  SELECT point_id, country_code
  FROM (
    SELECT p.point_id, e.country_code,
           SUM(CASE WHEN ((e.y0 <= p.lat) <> (e.y1 <= p.lat))
                     AND ((e.x0 + ((p.lat - e.y0) * (e.x1 - e.x0) / (e.y1 - e.y0))) > p.lon)
                    THEN 1 ELSE 0 END) AS n_cross
    FROM pts p CROSS JOIN {edges_values_sql().replace("AS edges", "AS e")}
    GROUP BY p.point_id, e.country_code
  ) q WHERE n_cross % 2 = 1
)
"""

SPATIAL_PIP_COUNTRY = f"""
WITH pts AS ({_PTS}),
{_PIP_CC.strip().lstrip()}
SELECT point_id, country_code FROM cc
"""

FLAGSHIP_RAI = f"""
WITH pts AS ({_PTS}),
segs AS ({_SEGS}),
cand AS (SELECT * FROM pts CROSS JOIN segs),
d AS ({chain_select("SELECT * FROM cand", _DIST_STEPS, ["point_id", "dist_m"])}),
near AS (SELECT point_id FROM d GROUP BY point_id
         HAVING MIN(dist_m) <= CAST({int(KNN_CUTOFF_M)} AS DOUBLE)),
{_PIP_CC.strip()}
SELECT cc.country_code,
       COUNT(*) AS n_points,
       CAST(SUM(CASE WHEN near.point_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
       ROUND(CAST(SUM(CASE WHEN near.point_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS rai
FROM cc LEFT JOIN near ON cc.point_id = near.point_id
GROUP BY cc.country_code
"""

_CELL12_STEPS = point_cell_steps("lon", "lat", 12, "cell_id")

SPATIAL_CELL_COVER = f"""
WITH pts AS ({_PTS}),
cells AS ({chain_select("SELECT * FROM pts", _CELL12_STEPS, ["point_id", "cell_id"])})
SELECT cell_id, COUNT(*) AS n_points FROM cells GROUP BY cell_id
"""

# J2b ad-hoc region query (r04): ray-cast over the SAME pentagon edge
# literals the Spark query embeds (queries.AOI_RING)


def _aoi_edges_sql() -> str:
    from .queries import AOI_RING

    rows = ", ".join(
        f"({AOI_RING[k][0]!r}, {AOI_RING[k][1]!r}, "
        f"{AOI_RING[k + 1][0]!r}, {AOI_RING[k + 1][1]!r})"
        for k in range(len(AOI_RING) - 1)
    )
    return f"(VALUES {rows}) AS e(x0, y0, x1, y1)"


def _spatial_region_query_sql() -> str:
    return f"""
WITH pts AS ({_PTS}),
cross_counts AS (
  SELECT p.point_id,
         SUM(CASE WHEN ((e.y0 <= p.lat) <> (e.y1 <= p.lat))
                   AND ((e.x0 + ((p.lat - e.y0) * (e.x1 - e.x0) / (e.y1 - e.y0))) > p.lon)
                  THEN 1 ELSE 0 END) AS n_cross
  FROM pts p CROSS JOIN {_aoi_edges_sql()}
  GROUP BY p.point_id
)
SELECT point_id FROM cross_counts WHERE n_cross % 2 = 1
"""


# C1b pyramid rollup (r04): packed-id parent truncation, bit ops only
SPATIAL_PYRAMID = f"""
WITH pts AS ({_PTS}),
cells AS ({chain_select("SELECT * FROM pts", _CELL12_STEPS, ["point_id", "cell_id"])}),
ex AS (SELECT cell_id, UNNEST([0, 1, 2, 3]) AS s FROM cells),
p AS (
  SELECT CAST(12 - s AS INT) AS level,
         (CAST(12 - s AS BIGINT) << 54)
           | ((cell_id & {(1 << 54) - 1}) >> (2 * s)) AS cell
  FROM ex
)
SELECT level, cell, COUNT(*) AS n_points FROM p GROUP BY 1, 2
"""

# --- C2: distributed compact cover (same ancestor-count formulation the
# Spark op runs: full node = descendant count 4^(L-lvl); compacted =
# full nodes whose parent is not full) --------------------------------------

_CELL7_STEPS = point_cell_steps("lon", "lat", 7, "cell_id")
_CODE_MASK = (1 << 54) - 1

SPATIAL_COMPACT_COVER = f"""
WITH pts AS ({_PTS}),
cells AS ({chain_select("SELECT * FROM pts", _CELL7_STEPS, ["cell_id"])}),
dense AS (SELECT DISTINCT cell_id FROM cells),
anc AS (
  SELECT ((CAST(7 - ks.k AS BIGINT) << 54)
          | ((cell_id & {_CODE_MASK}) >> (2 * ks.k))) AS anc
  FROM dense CROSS JOIN (SELECT UNNEST(range(0, 8)) AS k) ks
),
cnt AS (SELECT anc, COUNT(*) AS n FROM anc GROUP BY anc),
fullset AS (
  SELECT anc FROM cnt
  WHERE n = (CAST(1 AS BIGINT) << (2 * (7 - CAST(anc >> 54 AS INT))))
)
SELECT f.anc AS cell_id, CAST(f.anc >> 54 AS INT) AS level
FROM fullset f
WHERE ((CAST((f.anc >> 54) - 1 AS BIGINT) << 54) | ((f.anc & {_CODE_MASK}) >> 2))
      NOT IN (SELECT anc FROM fullset)
"""

# --- J6: Z-order range join (bin equi-join + range residual) ---------------
# Same compact-cover CTE as SPATIAL_COMPACT_COVER, then the identical
# shift arithmetic the Spark op runs (range_join_compacted): ranges of
# level-12 descendants per cover cell, bins at level 3 on both sides.

_CELL12R_STEPS = point_cell_steps("lon", "lat", 12, "cell_id")

SPATIAL_RANGE_JOIN = f"""
WITH pts AS ({_PTS}),
cells AS ({chain_select("SELECT * FROM pts", _CELL7_STEPS, ["cell_id"])}),
dense AS (SELECT DISTINCT cell_id FROM cells),
anc AS (
  SELECT ((CAST(7 - ks.k AS BIGINT) << 54)
          | ((cell_id & {_CODE_MASK}) >> (2 * ks.k))) AS anc
  FROM dense CROSS JOIN (SELECT UNNEST(range(0, 8)) AS k) ks
),
cnt AS (SELECT anc, COUNT(*) AS n FROM anc GROUP BY anc),
fullset AS (
  SELECT anc FROM cnt
  WHERE n = (CAST(1 AS BIGINT) << (2 * (7 - CAST(anc >> 54 AS INT))))
),
cover AS (
  SELECT f.anc AS cell_id, CAST(f.anc >> 54 AS INT) AS level
  FROM fullset f
  WHERE ((CAST((f.anc >> 54) - 1 AS BIGINT) << 54) | ((f.anc & {_CODE_MASK}) >> 2))
        NOT IN (SELECT anc FROM fullset)
),
bins AS (
  SELECT cell_id, level,
         ((CAST(12 AS BIGINT) << 54)
          | ((cell_id & {_CODE_MASK}) << (2 * (12 - level)))) AS lo,
         ((CAST(12 AS BIGINT) << 54)
          | (((cell_id & {_CODE_MASK}) + 1) << (2 * (12 - level)))) AS hi,
         CASE WHEN level >= 3 THEN ((cell_id & {_CODE_MASK}) >> (2 * (level - 3)))
              ELSE ((cell_id & {_CODE_MASK}) << (2 * (3 - level))) END AS bin_base,
         CASE WHEN level >= 3 THEN CAST(1 AS BIGINT)
              ELSE (CAST(1 AS BIGINT) << (2 * (3 - level))) END AS n_bins
  FROM cover
),
binned AS (
  SELECT cell_id, level, lo, hi, bin_base + ks.i AS bin
  FROM bins, UNNEST(range(0, n_bins)) AS ks(i)
),
p12 AS ({chain_select("SELECT * FROM pts", _CELL12R_STEPS, ["point_id", "cell_id"])}),
probe AS (
  SELECT point_id, cell_id,
         ((cell_id & {_CODE_MASK}) >> (2 * (12 - 3))) AS bin
  FROM p12
)
SELECT b.cell_id AS cell_id, b.level AS level, COUNT(*) AS n_points
FROM probe p JOIN binned b
  ON p.bin = b.bin AND p.cell_id >= b.lo AND p.cell_id < b.hi
GROUP BY b.cell_id, b.level
"""

SPATIAL_HEX_COVER = f"""
WITH pts AS ({_PTS}),
hx AS ({chain_select("SELECT * FROM pts", hex_cell_steps("lon", "lat", 0.05, "hex_id"), ["point_id", "hex_id"])})
SELECT hex_id, COUNT(*) AS n_points, MIN(point_id) AS min_point
FROM hx GROUP BY hex_id
"""

# --- C3 hex variant: ring-1 neighborhood density (axial offsets as
# packed-id integer deltas — same arithmetic as the Spark op) ---------------

SPATIAL_HEX_KRING = f"""
WITH pts AS ({_PTS}),
hx AS ({chain_select("SELECT * FROM pts", hex_cell_steps("lon", "lat", 0.05, "hex_id"), ["point_id", "hex_id"])}),
hist AS (SELECT hex_id, COUNT(*) AS n FROM hx GROUP BY hex_id),
neigh AS (
  SELECT point_id, hex_id + ks.d AS nhex
  FROM hx, UNNEST([0, 16384, -16384, 1, -1, 16383, -16383]) AS ks(d)
)
SELECT ne.point_id, CAST(COALESCE(SUM(h.n), 0) AS BIGINT) AS n_points_r1
FROM neigh ne LEFT JOIN hist h ON ne.nhex = h.hex_id
GROUP BY ne.point_id
"""


# --- S3: way assembly length (independent formulation: window LEAD +
# RUNNING sum in ref order — the running window reproduces Spark's
# left-fold order exactly, so the doubles are bit-identical) ------------------

COUNTRY_AREAS = f"""
WITH e AS (SELECT * FROM {edges_values_sql_indexed()}),
t AS (
  SELECT country_code, i,
         (x0 * y1 - x1 * y0) / CAST(2 AS DOUBLE) AS a_term,
         SQRT((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS len_deg
  FROM e
),
run AS (
  SELECT country_code, i,
         SUM(a_term) OVER (PARTITION BY country_code ORDER BY i
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ra,
         SUM(len_deg) OVER (PARTITION BY country_code ORDER BY i
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rl,
         ROW_NUMBER() OVER (PARTITION BY country_code ORDER BY i DESC) AS rn
  FROM t
)
SELECT country_code,
       ABS(ra) AS area_deg2,
       rl * CAST(111320 AS DOUBLE) AS perimeter_m
FROM run WHERE rn = 1
"""

OSM_WAY_ASSEMBLY = f"""
WITH n AS (
  SELECT s_suppkey AS way_id, ks.i AS pos, {NODE_X} AS x, {NODE_Y} AS y
  FROM supplier CROSS JOIN (SELECT UNNEST(range(0, 4)) AS i) ks
),
seg AS (
  SELECT way_id, pos, x, y,
         LEAD(x) OVER (PARTITION BY way_id ORDER BY pos) AS x2,
         LEAD(y) OVER (PARTITION BY way_id ORDER BY pos) AS y2
  FROM n
),
d AS (
  SELECT way_id, pos,
         SQRT((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)) AS dist
  FROM seg WHERE x2 IS NOT NULL
),
run AS (
  SELECT way_id, pos,
         SUM(dist) OVER (PARTITION BY way_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs,
         ROW_NUMBER() OVER (PARTITION BY way_id ORDER BY pos DESC) AS rn
  FROM d
)
SELECT way_id, 4 AS n_nodes,
       ROUND(rs * CAST(111320 AS DOUBLE), 6) AS length_m
FROM run WHERE rn = 1
"""

# --- J1 at level 5: segment bbox cover × point cells -----------------------

_CELL5_STEPS = point_cell_steps("lon", "lat", 5, "cell_id")


def _pack_steps_from_idx(ix: str, iy: str, level: int, out: str):
    from .sqlgen import pack_cell_expr

    return [(out, pack_cell_expr(ix, iy, level))]


_SEG_COVER5 = f"""
segidx AS (
  SELECT road_id,
         {grid_index_expr("LEAST(ax, bx)", 5)} AS ix0,
         {grid_index_expr("LEAST(ay, byy)", 5)} AS iy0,
         {grid_index_expr("GREATEST(ax, bx)", 5)} AS ix1,
         {grid_index_expr("GREATEST(ay, byy)", 5)} AS iy1
  FROM segs
),
segexp AS (
  SELECT road_id, u1.cix AS cix, u2.ciy AS ciy
  FROM segidx, UNNEST(generate_series(ix0, ix1)) AS u1(cix),
       UNNEST(generate_series(iy0, iy1)) AS u2(ciy)
),
segcells AS ({chain_select("SELECT * FROM segexp", _pack_steps_from_idx("cix", "ciy", 5, "cell_id"), ["road_id", "cell_id"])})
"""

SPATIAL_JOIN_CELLS = f"""
WITH pts AS ({_PTS}),
segs AS ({_SEGS}),
{_SEG_COVER5.strip()},
ptcells AS ({chain_select("SELECT * FROM pts", _CELL5_STEPS, ["point_id", "cell_id"])})
SELECT p.cell_id AS cell_id, COUNT(*) AS n_pairs
FROM ptcells p JOIN segcells s ON p.cell_id = s.cell_id
GROUP BY p.cell_id
"""

# --- C3 kring at level 10 ---------------------------------------------------

_PT_IDX10 = f"""
ptidx AS (
  SELECT point_id,
         {grid_index_expr("lon", 10)} AS ix,
         {grid_index_expr("lat", 10)} AS iy
  FROM pts
),
ringexp AS (
  SELECT point_id, ix + u1.dx AS nx, iy + u2.dy AS ny
  FROM ptidx, UNNEST(generate_series(-1, 1)) AS u1(dx),
       UNNEST(generate_series(-1, 1)) AS u2(dy)
  WHERE ix + u1.dx >= 0 AND iy + u2.dy >= 0
    AND ix + u1.dx < 1024 AND iy + u2.dy < 1024
),
ringcells AS ({chain_select("SELECT * FROM ringexp", _pack_steps_from_idx("nx", "ny", 10, "ring_cell_id"), ["point_id", "ring_cell_id"])})
"""

SPATIAL_KRING_CELLS = f"""
WITH pts AS ({_PTS}),
{_PT_IDX10.strip()}
SELECT point_id, COUNT(*) AS n_neighbors, MIN(ring_cell_id) AS min_cell
FROM ringcells GROUP BY point_id
"""

# ---------------------------------------------------------------------------
# Relational
# ---------------------------------------------------------------------------

Q1_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 0) AS sum_qty,
       ROUND(SUM(l_extendedprice), -2) AS sum_base,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

Q3_BIG_BUILDING_ORDERS = """
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       ROUND(SUM(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)), -2) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING' AND o_totalprice > 400000
GROUP BY o_orderkey, order_year
"""

Q5_NATION_REVENUE = """
SELECT r_name, n_name,
       ROUND(SUM(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)), -2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY r_name, n_name
"""

WINDOW_TOP3_ORDERS = """
SELECT o_custkey, o_orderkey, rnk, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) t WHERE rnk <= 3
"""

ROLLUP_STATUS_PRIORITY = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), -2) AS total
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""

SETOPS_BRANDS = """
SELECT DISTINCT p_brand FROM (
  (SELECT p_brand FROM part WHERE p_size > 40
   INTERSECT
   SELECT p_brand FROM part WHERE p_size < 5)
  UNION
  (SELECT p_brand FROM part WHERE p_size > 40
   EXCEPT
   SELECT p_brand FROM part WHERE p_retailprice < 1200)
) u
"""

AGG_STATS_ORDERS = """
SELECT o_orderstatus,
       COUNT(*) AS n,
       COUNT(DISTINCT o_custkey) AS n_cust,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders GROUP BY o_orderstatus
"""

EVENTS_HOURLY = """
SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hour,
       COUNT(*) AS n, CAST(FLOOR(SUM(value)) AS BIGINT) AS sum_value_floor
FROM events GROUP BY event_type, hour
"""

SESSIONIZE_USERS = """
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_session) AS BIGINT) AS n_sessions
FROM (
  SELECT user_id,
         CASE WHEN prev_ts IS NULL
                   OR (EXTRACT(EPOCH FROM ts) - EXTRACT(EPOCH FROM prev_ts)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM (
    SELECT user_id, ts,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
  ) w
) s GROUP BY user_id
"""

JSON_EXTRACT_PROPS = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""

# ---------------------------------------------------------------------------
# Documents / embeddings
# ---------------------------------------------------------------------------

DEDUP_FINGERPRINT = """
SELECT md5(array_to_string((string_split(text, ' '))[1:8], ' ')) AS fp,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY fp
"""

DOC_TOKEN_STATS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
       ROUND(CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS avg_token_len
FROM documents
"""

LANG_STOPWORD_SCORE = """
SELECT doc_id, lang,
       CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'in', 'and'))) AS INT) AS n_stop,
       ROUND(CAST(len(list_filter(string_split(text, ' '),
                 x -> x IN ('the', 'a', 'of', 'in', 'and'))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE), 6) AS stop_ratio
FROM documents
"""

_SHINGLES = (
    "list_transform(generate_series(1, greatest(length(text) - 11, 1), 4), "
    "i -> substring(text, i, 12))"
)


def _mh(seed: str) -> str:
    return f"list_min(list_transform({_SHINGLES}, s -> md5(concat(s, '{seed}'))))"


MINHASH_SIGNATURES = f"""
SELECT doc_id, {_mh("s1")} AS mh1, {_mh("s2")} AS mh2,
       {_mh("s3")} AS mh3, {_mh("s4")} AS mh4
FROM documents
"""

MINHASH_LSH_PAIRS = f"""
WITH sig AS (
  SELECT doc_id, {_mh("s1")} AS mh1, {_mh("s2")} AS mh2,
         {_mh("s3")} AS mh3, {_mh("s4")} AS mh4
  FROM documents
),
bands AS (
  SELECT doc_id, 1 AS band, mh1 AS mh FROM sig UNION ALL
  SELECT doc_id, 2, mh2 FROM sig UNION ALL
  SELECT doc_id, 3, mh3 FROM sig UNION ALL
  SELECT doc_id, 4, mh4 FROM sig
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.mh = b.mh
WHERE a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
"""


DEDUP_CLUSTERS = f"""
WITH RECURSIVE sig AS (
  SELECT doc_id, {_mh("s1")} AS mh1, {_mh("s2")} AS mh2,
         {_mh("s3")} AS mh3, {_mh("s4")} AS mh4
  FROM documents
),
bands AS (
  SELECT doc_id, 1 AS band, mh1 AS mh FROM sig UNION ALL
  SELECT doc_id, 2, mh2 FROM sig UNION ALL
  SELECT doc_id, 3, mh3 FROM sig UNION ALL
  SELECT doc_id, 4, mh4 FROM sig
),
edges AS (
  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
  FROM bands a JOIN bands b ON a.band = b.band AND a.mh = b.mh
  WHERE a.doc_id <> b.doc_id AND a.doc_id < 300 AND b.doc_id < 300
),
reach(v, label) AS (
  SELECT doc_id, doc_id FROM documents WHERE doc_id < 300
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.v
)
SELECT label AS keep_doc_id, COUNT(*) AS n_docs
FROM (SELECT v, MIN(label) AS label FROM reach GROUP BY v) comp
GROUP BY label HAVING COUNT(*) > 1
"""

EMBEDDING_NORMS = """
SELECT vec_id,
       ROUND(SQRT(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
       label
FROM embeddings
"""

_DOT_DUCK = (
    "list_sum(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)

ANN_COSINE_TOPK = f"""
WITH nrm AS (
  SELECT vec_id, embedding,
         SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DOT_DUCK} / (a.nrm * b.nrm) AS cos_sim
  FROM nrm a CROSS JOIN nrm b
  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, rnk, ROUND(cos_sim, 4) AS cos_sim
FROM ranked WHERE rnk <= 5
"""

ORACLES = {
    "flagship_rai": FLAGSHIP_RAI,
    "spatial_cell_cover": SPATIAL_CELL_COVER,
    "spatial_pyramid": SPATIAL_PYRAMID,
    "spatial_region_query": _spatial_region_query_sql(),
    "spatial_knn_nearest": SPATIAL_KNN_NEAREST,
    "spatial_knn_topk": SPATIAL_KNN_TOPK,
    "spatial_pip_country": SPATIAL_PIP_COUNTRY,
    "spatial_compact_cover": SPATIAL_COMPACT_COVER,
    "spatial_range_join": SPATIAL_RANGE_JOIN,
    "osm_way_assembly": OSM_WAY_ASSEMBLY,
    "country_areas": COUNTRY_AREAS,
    "spatial_hex_cover": SPATIAL_HEX_COVER,
    "spatial_hex_kring": SPATIAL_HEX_KRING,
    "spatial_join_cells": SPATIAL_JOIN_CELLS,
    "spatial_kring_cells": SPATIAL_KRING_CELLS,
    # spatial_compact_cover: rows-only (compaction is quadtree-recursive,
    # not ANSI-SQL-expressible; property-tested in tests/test_cells.py)
    "q1_pricing_summary": Q1_PRICING_SUMMARY,
    "q3_big_building_orders": Q3_BIG_BUILDING_ORDERS,
    "q5_nation_revenue": Q5_NATION_REVENUE,
    "window_top3_orders": WINDOW_TOP3_ORDERS,
    "rollup_status_priority": ROLLUP_STATUS_PRIORITY,
    "setops_brands": SETOPS_BRANDS,
    "agg_stats_orders": AGG_STATS_ORDERS,
    "events_hourly": EVENTS_HOURLY,
    "sessionize_users": SESSIONIZE_USERS,
    "json_extract_props": JSON_EXTRACT_PROPS,
    "dedup_fingerprint": DEDUP_FINGERPRINT,
    "doc_token_stats": DOC_TOKEN_STATS,
    "lang_stopword_score": LANG_STOPWORD_SCORE,
    "minhash_signatures": MINHASH_SIGNATURES,
    "minhash_lsh_pairs": MINHASH_LSH_PAIRS,
    "dedup_clusters": DEDUP_CLUSTERS,
    "embedding_norms": EMBEDDING_NORMS,
    "ann_cosine_topk": ANN_COSINE_TOPK,
}

from .oracles_ext import ORACLES_EXT  # noqa: E402 — M5 breadth

ORACLES.update(ORACLES_EXT)

from .oracles_r5 import ORACLES_R5  # noqa: E402 — round-5 breadth

ORACLES.update(ORACLES_R5)

from .oracles_tpch import ORACLES_TPCH  # noqa: E402 — TPC-H-adapted suite

ORACLES.update(ORACLES_TPCH)

from .oracles_r5b import ORACLES_R5B  # noqa: E402 — round-5 wave 5

ORACLES.update(ORACLES_R5B)

from .oracles_r5c import ORACLES_R5C  # noqa: E402 — round-5 wave 6

ORACLES.update(ORACLES_R5C)

from .oracles_r5d import ORACLES_R5D  # noqa: E402 — round-5 wave 9

ORACLES.update(ORACLES_R5D)

from .oracles_r5e import ORACLES_R5E  # noqa: E402 — round-5 wave 21

ORACLES.update(ORACLES_R5E)

from .oracles_r5f import ORACLES_R5F  # noqa: E402 — round-5 wave 26

ORACLES.update(ORACLES_R5F)

from .oracles_r5g import ORACLES_R5G  # noqa: E402 — round-5 wave 34

ORACLES.update(ORACLES_R5G)


def all_oracles() -> dict[str, str]:
    """ORACLES plus the lazily-built image-fixture oracles (they embed
    the absolute sf0.01 fixture path and ensure it exists — building
    them at import time would trigger fixture generation on every
    import)."""
    from .oracles_ext import image_oracles
    from .oracles_r5 import image_oracles_r5
    from .oracles_r5c import fixture_oracles_r5c
    from .oracles_r5d import fixture_oracles_r5d
    from .oracles_r5e import fixture_oracles_r5e
    from .oracles_r5f import fixture_oracles_r5f
    from .oracles_r5g import fixture_oracles_r5g

    out = dict(ORACLES)
    out.update(image_oracles())
    out.update(image_oracles_r5())
    out.update(fixture_oracles_r5c())
    out.update(fixture_oracles_r5d())
    out.update(fixture_oracles_r5e())
    out.update(fixture_oracles_r5f())
    out.update(fixture_oracles_r5g())
    return out
