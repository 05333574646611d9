"""DuckDB oracle twins for queries_r5d (wave 9).

Dialect adaptations per CLAUDE.md gotcha 7: epoch_us(ts) for
unix_micros(CAST(ts AS TIMESTAMP)), DIV -> // (both truncate toward
zero, negatives included — verified), SUM(int) -> HUGEINT -> CAST
BIGINT, explode -> UNNEST, 1-indexed lists, listagg WITHIN GROUP ->
string_agg(expr, sep ORDER BY ...).  The octant CASE and segment
length are the ENGINE'S OWN text imported from queries_r5d so both
engines evaluate identical expressions; the concurrency oracle derives
boundaries via UNION ALL (vs the engine's single explode) and the
octant oracle by direct list indexing (vs the engine's lead window),
so the plumbing is independently checked.
"""

from __future__ import annotations

import os

from .queries_r5d import (
    _DAY_US,
    _HOLD_US,
    _MIN_US,
    _SEG_LEN,
    LATERAL_TOPK_TEMPLATE,
    OCTANT_SQL,
)

ORACLES_R5D: dict[str, str] = {}

ORACLES_R5D["events_concurrency"] = f"""
WITH iv AS (
  SELECT epoch_us(ts) AS s, epoch_us(ts) + {_HOLD_US} AS e,
         (epoch_us(ts) // {_DAY_US} + 1) * {_DAY_US} AS dayend
  FROM events
),
bnd0 AS (
  SELECT s // {_DAY_US} AS day, s AS t, 1 AS delta FROM iv
  UNION ALL
  SELECT s // {_DAY_US} AS day, LEAST(e, dayend) AS t, -1 AS delta FROM iv
  UNION ALL
  SELECT s // {_DAY_US} + 1 AS day, dayend AS t, 1 AS delta
  FROM iv WHERE e > dayend
  UNION ALL
  SELECT s // {_DAY_US} + 1 AS day, e AS t, -1 AS delta
  FROM iv WHERE e > dayend
),
bnd AS (SELECT day, t, delta, t // {_MIN_US} AS bk FROM bnd0),
bsum AS (
  SELECT day, bk, CAST(SUM(delta) AS BIGINT) AS sb FROM bnd GROUP BY 1, 2
),
boff AS (
  SELECT day, bk,
         CAST(SUM(sb) OVER (PARTITION BY day ORDER BY bk) - sb
              AS BIGINT) AS off
  FROM bsum
),
run AS (
  SELECT day, t, delta,
         off + SUM(delta) OVER (PARTITION BY day, bk ORDER BY t, delta)
           AS run
  FROM bnd JOIN boff USING (day, bk)
),
w AS (
  SELECT day, t, delta, run, MAX(run) OVER (PARTITION BY day) AS mx
  FROM run
)
SELECT day, CAST(MAX(mx) AS BIGINT) AS peak,
       CAST(MIN(CASE WHEN run = mx THEN t END) AS BIGINT) AS first_peak_us,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opens
FROM w GROUP BY 1
"""

ORACLES_R5D["orders_listagg"] = """
WITH pairs AS (SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders),
agg AS (
  SELECT o_orderstatus,
         string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
           AS priorities_csv,
         CAST(COUNT(*) AS BIGINT) AS n_priorities
  FROM pairs GROUP BY 1
),
counts AS (
  SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1
)
SELECT o_orderstatus, n_priorities, priorities_csv, n_orders
FROM agg JOIN counts USING (o_orderstatus)
"""

ORACLES_R5D["streaming_chained_aggs"] = """
WITH mx AS (SELECT MAX(epoch(ts)) AS m FROM events),
q AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         epoch_us(ts) // 900000000 AS qtr, event_type,
         CAST(COUNT(*) AS BIGINT) AS n15
  FROM events GROUP BY 1, 2, 3
),
h AS (
  SELECT hour_epoch, event_type, CAST(SUM(n15) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_quarters,
         CAST(MAX(n15) AS BIGINT) AS max_quarter
  FROM q GROUP BY 1, 2
)
SELECT h.hour_epoch, h.event_type, h.n, h.n_quarters, h.max_quarter
FROM h, mx WHERE h.hour_epoch + 3600 <= mx.m - 7200
"""

# file counts pinned at sf0.01: commit1 = 2 tasks x 5 langs = 10 files
# (2 match lang=en), commit2 = 2 tasks x 10 odd-half sources = 20 files,
# all kept fail-open under the lang key they never recorded
ORACLES_R5D["snapshot_partition_evolution"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_from_new_spec,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
       CAST(22 AS INT) AS files_scanned, CAST(30 AS INT) AS files_total
FROM documents WHERE lang = 'en'
"""

# identical LATERAL template text (q17 precedent) with the bare table
# names DuckDB pre-registers
ORACLES_R5D["lateral_topk_orders"] = LATERAL_TOPK_TEMPLATE.format(
    customer="customer", orders="orders"
)

ORACLES_R5D["xml_roundtrip_events"] = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       MIN(epoch_us(ts)) AS min_ts_us, MAX(epoch_us(ts)) AS max_ts_us,
       CAST(SUM(event_id) AS BIGINT) AS chk_ids
FROM events GROUP BY 1
"""

ORACLES_R5D["orders_decision_stump"] = """
WITH o AS (
  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) // 10000 AS b,
         o_orderstatus AS s
  FROM orders
),
per AS (SELECT b, s, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1, 2),
wide AS (
  SELECT b,
         CAST(SUM(CASE WHEN s = 'O' THEN c ELSE 0 END) AS BIGINT) AS co,
         CAST(SUM(CASE WHEN s = 'P' THEN c ELSE 0 END) AS BIGINT) AS cp,
         CAST(SUM(CASE WHEN s = 'F' THEN c ELSE 0 END) AS BIGINT) AS cf
  FROM per GROUP BY 1
),
cum AS (
  SELECT b,
         CAST(SUM(co) OVER (ORDER BY b) AS BIGINT) AS lo,
         CAST(SUM(cp) OVER (ORDER BY b) AS BIGINT) AS lp,
         CAST(SUM(cf) OVER (ORDER BY b) AS BIGINT) AS lf,
         CAST(SUM(co) OVER () AS BIGINT) AS tot_o,
         CAST(SUM(cp) OVER () AS BIGINT) AS tot_p,
         CAST(SUM(cf) OVER () AS BIGINT) AS tot_f
  FROM wide
),
scored0 AS (
  SELECT b AS thr,
         lo + lp + lf AS n_left,
         (tot_o - lo) + (tot_p - lp) + (tot_f - lf) AS n_right,
         (lo * lo + lp * lp + lf * lf) * ((tot_o - lo) + (tot_p - lp)
           + (tot_f - lf)) + ((tot_o - lo) * (tot_o - lo)
           + (tot_p - lp) * (tot_p - lp) + (tot_f - lf) * (tot_f - lf))
           * (lo + lp + lf) AS s_num
  FROM cum
),
scored AS (
  SELECT thr, n_left, n_right, s_num, n_left * n_right AS s_den,
         CAST(FLOOR(CAST(s_num AS DOUBLE) / CAST(n_left * n_right
           AS DOUBLE) * 1000000.0) AS BIGINT) AS score_micros
  FROM scored0 WHERE n_right > 0
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY CAST(s_num AS DOUBLE)
           / CAST(s_den AS DOUBLE) DESC, thr ASC) AS rk
  FROM scored
)
SELECT thr, n_left, n_right, s_num, s_den, score_micros
FROM ranked WHERE rk = 1
"""

ORACLES_R5D["events_rolling_wau"] = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
wau AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS wau
  FROM (SELECT DISTINCT user_id, day + k AS w
        FROM ud, UNNEST(range(0, 7)) AS r(k))
  GROUP BY 1
),
dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1)
SELECT day, dau, wau,
       CAST(FLOOR(CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE)
         * 1000000.0) AS BIGINT) AS stickiness_micros
FROM dau JOIN wau ON day = w, span
WHERE day BETWEEN d0 AND d1
"""

ORACLES_R5D["supplier_winsorized_mean"] = """
WITH s AS (
  SELECT CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM supplier
),
per AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY 1),
cum AS (
  SELECT cents,
         CAST(SUM(cnt) OVER (ORDER BY cents) AS BIGINT) AS cume,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM per
),
cuts AS (
  SELECT MIN(CASE WHEN cume >= (n - 1) // 10 + 1 THEN cents END) AS lo,
         MIN(CASE WHEN cume >= (9 * (n - 1)) // 10 + 1 THEN cents END)
           AS hi
  FROM cum
),
w AS (SELECT LEAST(GREATEST(cents, lo), hi) AS w, lo, hi
      FROM s, cuts)
SELECT lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(w) AS BIGINT) AS sum_w,
       CAST(FLOOR(CAST(SUM(w) AS DOUBLE) / COUNT(*) * 1000.0) AS BIGINT)
         AS wmean_millicents
FROM w GROUP BY 1, 2
"""

ORACLES_R5D["snapshot_constraint_check"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(n_chars) AS min_chars,
       CAST(2 AS INT) AS n_commits, CAST(1 AS INT) AS n_rejected
FROM documents
"""

ORACLES_R5D["events_hourly_peaks"] = f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {3_600_000_000} AS h,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS v
  FROM events GROUP BY 1
),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hourly),
dense AS (
  SELECT g.h, COALESCE(hourly.v, 0) AS v
  FROM (SELECT UNNEST(range(h0, h1 + 1)) AS h FROM span) g
  LEFT JOIN hourly ON hourly.h = g.h
),
per AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM dense GROUP BY 1),
cum AS (
  SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cume,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM per
),
p90 AS (
  SELECT MIN(CASE WHEN cume >= (9 * (n - 1)) // 10 + 1 THEN v END) AS p90
  FROM cum
),
nb AS (
  SELECT h, v,
         LAG(v, 1) OVER (ORDER BY h) AS lag1,
         LAG(v, 2) OVER (ORDER BY h) AS lag2,
         LAG(v, 3) OVER (ORDER BY h) AS lag3,
         LEAD(v, 1) OVER (ORDER BY h) AS lead1,
         LEAD(v, 2) OVER (ORDER BY h) AS lead2,
         LEAD(v, 3) OVER (ORDER BY h) AS lead3
  FROM dense
)
SELECT h, v, GREATEST(lag1, lag2, lag3, lead1, lead2, lead3) AS nbr_max,
       p90
FROM nb, p90
WHERE lag3 IS NOT NULL AND lead3 IS NOT NULL
  AND v > GREATEST(lag1, lag2, lag3)
  AND v > GREATEST(lead1, lead2, lead3)
  AND v >= p90
"""

ORACLES_R5D["embeddings_silhouette"] = """
WITH comp AS (
  SELECT vec_id, label, u.j - 1 AS j,
         CAST(FLOOR(CAST(embedding[u.j] AS DOUBLE) * 1000.0 + 0.5)
              AS BIGINT) AS qx
  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS u(j)
),
cent AS (
  SELECT label AS clabel, j,
         CAST(CAST(SUM(qx) AS BIGINT) // COUNT(*) AS BIGINT) AS c
  FROM comp GROUP BY 1, 2
),
dists AS (
  SELECT vec_id, label, clabel,
         CAST(FLOOR(SQRT(CAST(CAST(SUM((qx - c) * (qx - c)) AS BIGINT)
              AS DOUBLE))) AS BIGINT) AS dist
  FROM comp JOIN cent USING (j)
  GROUP BY 1, 2, 3
),
ab AS (
  SELECT vec_id, label,
         MIN(CASE WHEN clabel = label THEN dist END) AS a,
         MIN(CASE WHEN clabel <> label THEN dist END) AS b
  FROM dists GROUP BY 1, 2
),
s AS (
  SELECT label, (1000 * (b - a)) // GREATEST(a, b) AS s_mils
  FROM ab WHERE GREATEST(a, b) > 0
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(s_mils) AS BIGINT) AS sum_s_mils,
       CAST(CAST(SUM(s_mils) AS BIGINT) // COUNT(*) AS BIGINT)
         AS mean_s_mils
FROM s GROUP BY 1
"""


def _snap_sql() -> str:
    """Brute-force map-matching twin: cross join + the SAME sqlgen
    distance steps (keeping the projection intermediates), rank-1 by
    (dist, road_id) — single-segment harness roads make that the full
    (dist, road, seg) tie-break — then the identical t/snap double
    chain (every term already has a DOUBLE operand; gotcha 17)."""
    from .harness import AX, AY, BX, BY, KNN_CUTOFF_M, PX, PY
    from .sqlgen import chain_select, point_seg_dist_steps

    pts = f"SELECT o_orderkey AS point_id, {PX} AS lon, {PY} AS lat FROM orders"
    segs = (
        f"SELECT s_suppkey AS road_id, CAST(0 AS INT) AS seg_id, "
        f"{AX} AS ax, {AY} AS ay, {BX} AS bx, {BY} AS byy FROM supplier"
    )
    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "byy",
                                 "dist_m")
    d = chain_select(
        "SELECT * FROM cand", steps,
        ["point_id", "road_id", "seg_id", "ax", "ay",
         "dist_m_dx", "dist_m_dy", "dist_m_t", "dist_m"],
    )
    return f"""
WITH pts AS ({pts}),
segs AS ({segs}),
cand AS (SELECT * FROM pts CROSS JOIN segs),
d AS ({d}),
hit AS (SELECT * FROM d WHERE dist_m <= CAST({int(KNN_CUTOFF_M)} AS DOUBLE)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY point_id
            ORDER BY dist_m ASC, road_id ASC) AS rn
  FROM hit
)
SELECT point_id, road_id, seg_id, ROUND(dist_m, 6) AS dist_m,
       CAST(FLOOR(dist_m_t * 1000000.0) AS BIGINT) AS t_micros,
       CAST(FLOOR((ax + dist_m_t * dist_m_dx) * 1000000.0) AS BIGINT)
         AS snap_x_micro,
       CAST(FLOOR((ay + dist_m_t * dist_m_dy) * 1000000.0) AS BIGINT)
         AS snap_y_micro
FROM ranked WHERE rn = 1
"""


def _topology_sql(roads: str) -> str:
    """Topology-QA twin: list-indexed endpoints/segments (vs the
    engine's explode + lead window) through the SAME block keys and
    sqlgen distance steps."""
    from .queries_r5d import _EPS_M, _T_HI, _T_LO
    from .sqlgen import chain_select, point_seg_dist_steps

    steps = point_seg_dist_steps("px", "py", "ax", "ay", "bx", "byy",
                                 "dist_m")
    d = chain_select(
        "SELECT * FROM cand", steps,
        ["road_id", "kind", "ei", "dist_m_t", "dist_m"],
    )
    return f"""
WITH ends0 AS (
  SELECT road_id, kind, 0 AS ei, coords[1].x AS px, coords[1].y AS py
  FROM read_parquet('{roads}')
  UNION ALL
  SELECT road_id, kind, 1 AS ei, coords[len(coords)].x,
         coords[len(coords)].y
  FROM read_parquet('{roads}')
),
ekeys AS (
  SELECT road_id, kind, ei, px, py,
         COALESCE((CAST(FLOOR(px * 10) AS BIGINT) + ox.o) * 100000
           + CAST(FLOOR(py * 10) AS BIGINT) + oy.o, -1) AS ck
  FROM ends0, UNNEST([-1, 0, 1]) AS ox(o), UNNEST([-1, 0, 1]) AS oy(o)
),
segs AS (
  SELECT road_id AS rs, coords[i].x AS ax, coords[i].y AS ay,
         coords[i + 1].x AS bx, coords[i + 1].y AS byy,
         COALESCE(CAST(FLOOR(coords[i].x * 10) AS BIGINT) * 100000
           + CAST(FLOOR(coords[i].y * 10) AS BIGINT), -1) AS ck
  FROM read_parquet('{roads}'), UNNEST(range(1, len(coords))) AS r(i)
),
cand AS (SELECT * FROM ekeys JOIN segs USING (ck) WHERE rs <> road_id),
d AS ({d}),
fl AS (
  SELECT road_id, kind, ei,
         MAX(CASE WHEN dist_m <= CAST({_EPS_M} AS DOUBLE)
             AND dist_m_t > CAST({_T_LO} AS DOUBLE)
             AND dist_m_t < CAST({_T_HI} AS DOUBLE)
             THEN 1 ELSE 0 END) AS hit
  FROM d GROUP BY 1, 2, 3
),
ne AS (SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_endpoints
       FROM ends0 GROUP BY 1),
hits AS (
  SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_undershoots,
         CAST(SUM(road_id * 2 + ei) AS BIGINT) AS chk
  FROM fl WHERE hit = 1 GROUP BY 1
)
SELECT ne.kind, n_endpoints, COALESCE(n_undershoots, 0) AS n_undershoots,
       COALESCE(chk, 0) AS chk
FROM ne LEFT JOIN hits ON ne.kind = hits.kind
"""


def _tfrecord_sql() -> str:
    """Per-language twin straight off the source parquet (the engine's
    numbers come back through the TFRecord round trip)."""
    from .queries_r5 import _b12_cells

    fp = " + ".join(
        f"({c} * {4096 ** (3 - j)})"
        for j, c in enumerate(_b12_cells("h", 4))
    )
    return f"""
WITH f AS (
  SELECT lang, doc_id, CAST(length(text) AS BIGINT) AS len,
         md5(text) AS h
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
       CAST(SUM(len) AS BIGINT) AS sum_len,
       CAST(SUM({fp}) AS BIGINT) AS sum_fp
FROM f GROUP BY 1
"""


def _webdataset_sql(img: str) -> str:
    from .queries_r5 import _b12_cells

    fpb = " + ".join(
        f"({c} * {4096 ** (3 - j)})"
        for j, c in enumerate(_b12_cells("hb", 4))
    )
    fpc = " + ".join(
        f"({c} * {4096 ** (3 - j)})"
        for j, c in enumerate(_b12_cells("hc", 4))
    )
    return f"""
WITH f AS (
  SELECT fmt, CAST(octet_length(bytes) AS BIGINT) AS len,
         md5(hex(bytes)) AS hb, md5(caption) AS hc
  FROM read_parquet('{img}')
  WHERE image_id < 'img000000000200'
)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(len) AS BIGINT) AS sum_len,
       CAST(SUM({fpb}) AS BIGINT) AS sum_fp_bytes,
       CAST(SUM({fpc}) AS BIGINT) AS sum_fp_caption
FROM f GROUP BY 1
"""


ORACLES_R5D["tfrecord_roundtrip_docs"] = _tfrecord_sql()


def _aoi_length_sql(roads: str) -> str:
    """Polyline∩AOI twin: list-indexed segments through the IDENTICAL
    half-plane t-interval fragments (live — no golden)."""
    from .queries_r5d import _aoi_halfplane_exprs

    lo, hi, feas = _aoi_halfplane_exprs(by="byy")
    return f"""
WITH seg AS (
  SELECT kind, coords[i].x AS ax, coords[i].y AS ay,
         coords[i + 1].x AS bx, coords[i + 1].y AS byy
  FROM read_parquet('{roads}'), UNNEST(range(1, len(coords))) AS r(i)
),
c0 AS (
  SELECT kind,
         SQRT((bx - ax) * (bx - ax) + (byy - ay) * (byy - ay)) AS seg_len,
         {lo} AS lo, {hi} AS hi, ({feas}) AS feas
  FROM seg
),
c1 AS (
  SELECT kind,
         CAST(FLOOR(seg_len * 1000000.0) AS BIGINT) AS len_micros,
         CASE WHEN feas AND hi > lo THEN
           CAST(FLOOR((hi - lo) * seg_len * 1000000.0) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS in_micros
  FROM c0
)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN in_micros > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_touched,
       CAST(SUM(len_micros) AS BIGINT) AS sum_len_micros,
       CAST(SUM(in_micros) AS BIGINT) AS sum_in_micros
FROM c1 GROUP BY 1
"""


def fixture_oracles_r5d() -> dict[str, str]:
    """Lazily-built oracles that embed the absolute sf0.01 fixture path
    (the fixture_oracles_r5c precedent)."""
    from .jobs.rai import fixture_dir

    fdir = fixture_dir(0.01)
    roads = os.path.join(fdir, "roads.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    return {
        "points_snap_roads": _snap_sql(),
        "bpe_train_merges": f"""
SELECT rank, lhs, rhs, cnt
FROM read_parquet('{gdir}/bpe_merges_sf0.01.parquet')
""",
        # mst golden carries the Kruskal result; the node count is LIVE
        # over the roads parquet with the engine's quantization text
        "mst_roads": f"""
WITH verts AS (
  SELECT road_id, i,
         (CAST(FLOOR(coords[i].x * 10 + 0.5) AS BIGINT) + 100) * 1000
           + (CAST(FLOOR(coords[i].y * 10 + 0.5) AS BIGINT) + 100) AS nd
  FROM read_parquet('{roads}'),
       UNNEST(range(1, len(coords) + 1)) AS r(i)
),
eg AS (
  SELECT LEAST(a.nd, b.nd) AS u, GREATEST(a.nd, b.nd) AS v
  FROM verts a JOIN verts b ON a.road_id = b.road_id AND b.i = a.i + 1
  WHERE a.nd <> b.nd
),
eu AS (SELECT DISTINCT u, v FROM eg),
nodes AS (SELECT u AS nd FROM eu UNION SELECT v FROM eu)
SELECT CAST((SELECT COUNT(*) FROM nodes) AS BIGINT) AS n_nodes,
       g.n_components, g.n_mst_edges, g.total_w, g.chk
FROM read_parquet('{gdir}/mst_sf0.01.parquet') g
""",
        "multimodal_audio_pitch": f"""
SELECT media_id, lag, f0_hz, r_peak, n_lags
FROM read_parquet('{gdir}/audio_pitch.parquet')
""",
        "multimodal_video_motion": f"""
SELECT media_id, n_pairs, n_blocks, n_moving, sum_sad, sum_abs_mv, chk
FROM read_parquet('{gdir}/video_motion.parquet')
""",
        "roads_topology_errors": _topology_sql(roads),
        "roads_in_aoi_length": _aoi_length_sql(roads),
        # the certified near-dup twin at the stricter hamming<=6 tier,
        # joined back to captions — runs verbatim on the same parquet
        "multimodal_caption_consistency": f"""
WITH img AS (SELECT image_id, phash, caption
             FROM read_parquet('{os.path.join(fdir, "images.parquet").replace("'", "''")}')
             WHERE image_id < 'img000000000400'),
bands AS (SELECT image_id, phash, u.band,
                 (phash >> (8 * u.band)) & 255 AS sig
          FROM img, UNNEST(generate_series(0, 7)) AS u(band)),
cand AS (SELECT DISTINCT a.image_id AS id_a, b.image_id AS id_b,
                CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig
          AND a.image_id < b.image_id)
SELECT c.id_a, c.id_b, c.hamming,
       (ca.caption = cb.caption) AS same_caption
FROM cand c
JOIN img ca ON ca.image_id = c.id_a
JOIN img cb ON cb.image_id = c.id_b
WHERE c.hamming <= 6
""",
        "webdataset_roundtrip_images": _webdataset_sql(
            os.path.join(fdir, "images.parquet").replace("'", "''")
        ),
        "country_clip_area": f"""
SELECT country_code, n_in, n_out, inter_area_nano, country_area_nano,
       frac_micros
FROM read_parquet('{gdir}/clip_area.parquet')
""",
        "image_fft_sharpness": f"""
SELECT g.image_id, g.n_px, g.hf_ratio_micros, g.peak_u, g.peak_v
FROM read_parquet('{gdir}/fft_sharpness_sf0.01.parquet') g
JOIN read_parquet('{os.path.join(fdir, "images.parquet").replace("'", "''")}') f3
  USING (image_id)
WHERE f3.image_id < 'img000000000500' AND f3.fmt <> 'jpg'
""",
        "image_ssim_recon": f"""
SELECT g.image_id, g.n_px, g.sum_recon, g.ssim_micros, g.chk
FROM read_parquet('{gdir}/ssim_sf0.01.parquet') g
JOIN read_parquet('{os.path.join(fdir, "images.parquet").replace("'", "''")}') f4
  USING (image_id)
WHERE f4.image_id < 'img000000000500' AND f4.fmt <> 'jpg'
""",
        "image_edt": f"""
SELECT g.image_id, g.n_px, g.n_fg, g.sum_d2, g.max_d2, g.chk
FROM read_parquet('{gdir}/edt_sf0.01.parquet') g
JOIN read_parquet('{os.path.join(fdir, "images.parquet").replace("'", "''")}') f2
  USING (image_id)
WHERE f2.image_id < 'img000000000500' AND f2.fmt <> 'jpg'
""",
        "image_otsu": f"""
SELECT g.image_id, g.thr, g.n_fg, g.sum_fg, g.chk
FROM read_parquet('{gdir}/otsu_sf0.01.parquet') g
JOIN read_parquet('{os.path.join(fdir, "images.parquet").replace("'", "''")}') f
  USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "roads_bearing_octants": f"""
WITH seg0 AS (
  SELECT kind,
         CAST(FLOOR(coords[i].x * 1000000) AS BIGINT) AS x,
         CAST(FLOOR(coords[i].y * 1000000) AS BIGINT) AS y,
         CAST(FLOOR(coords[i + 1].x * 1000000) AS BIGINT) AS x2,
         CAST(FLOOR(coords[i + 1].y * 1000000) AS BIGINT) AS y2
  FROM read_parquet('{roads}'), UNNEST(range(1, len(coords))) AS r(i)
),
seg AS (
  SELECT kind, x2 - x AS dx, y2 - y AS dy
  FROM seg0 WHERE NOT (x2 = x AND y2 = y)
),
o AS (SELECT kind, {OCTANT_SQL} AS octant, {_SEG_LEN} AS seg_len FROM seg)
SELECT kind, octant, CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(seg_len) AS BIGINT) AS len_micros
FROM o GROUP BY 1, 2
""",
    }
