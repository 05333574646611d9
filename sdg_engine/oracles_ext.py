"""DuckDB oracles for queries_ext.py (M5 breadth).

Image-pipeline queries are deliberately absent (rows-only checks):
their content is binary image payload pinned exactly by
tests/goldens + the pytest invariant gate instead.
"""

from __future__ import annotations

DEDUP_EXACT = """
SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
       COUNT(*) AS n_distinct,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
FROM (SELECT md5(text) AS h, COUNT(*) AS n FROM documents GROUP BY 1) g
"""

SIMHASH60 = """
WITH toks AS (
  SELECT doc_id, md5(tok) AS h
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents) t
),
votes AS (
  SELECT doc_id, i,
         CAST(SUM(CASE WHEN (((strpos('0123456789abcdef',
                    substr(h, CAST(FLOOR(i / 4) AS INT) + 1, 1)) - 1)
                    >> (i % 4)) & 1) = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s
  FROM toks, UNNEST(generate_series(0, 59)) AS u(i)
  GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i)
                ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""

NGRAM_JACCARD_PAIRS = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, GREATEST(len(string_split(text, ' ')) - 2, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[LEAST(i + 1, len(string_split(text, ' ')))] || ' ' ||
                string_split(text, ' ')[LEAST(i + 2, len(string_split(text, ' ')))]
         )) AS sh
  FROM documents WHERE doc_id < 60
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
FROM sh a CROSS JOIN sh b
WHERE a.doc_id < b.doc_id
  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) > 0
"""


def _dot_plane(j: int) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len(embedding)), "
        f"i -> CAST(embedding[i] AS DOUBLE) * "
        f"CAST((i * 31 + {j} * 17) * 2654435761 % 1000 - 500 AS DOUBLE)))"
    )


_BUCKET = " + ".join(
    f"(CASE WHEN {_dot_plane(j)} > CAST(0 AS DOUBLE) THEN {1 << j} ELSE 0 END)"
    for j in range(8)
)

EMBEDDING_LSH_BUCKETS = f"""
SELECT CAST(({_BUCKET}) AS INT) AS bucket, COUNT(*) AS n_vecs
FROM embeddings GROUP BY 1
"""

_DOT_AB = (
    "list_sum(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)

ANN_LSH_TOPK = f"""
WITH base AS (
  SELECT vec_id, embedding,
         CAST(({_BUCKET}) AS INT) AS bucket,
         SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DOT_AB} / (a.nrm * b.nrm) AS cos_sim
  FROM base a JOIN base b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
  WHERE a.vec_id < 20
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, rnk, ROUND(cos_sim, 4) AS cos_sim
FROM ranked WHERE rnk <= 3
"""

# --- embedding-cosine near-dup (banded sign-LSH candidates + exact τ) -------

_BAND0 = " + ".join(
    f"(CASE WHEN {_dot_plane(j)} > CAST(0 AS DOUBLE) THEN {1 << j} ELSE 0 END)"
    for j in range(4)
)
_BAND1 = " + ".join(
    f"(CASE WHEN {_dot_plane(j)} > CAST(0 AS DOUBLE) THEN {1 << (j - 4)} ELSE 0 END)"
    for j in range(4, 8)
)

# stop-bucket rule: buckets larger than queries_ext._NEARDUP_STOP_BUCKET
# (4096) are dropped on BOTH engines — the 100 TB candidate-volume bound
EMBEDDING_COSINE_NEARDUP = f"""
WITH base AS (
  SELECT vec_id, embedding,
         CAST(({_BAND0}) AS INT) AS b0, CAST(({_BAND1}) AS INT) AS b1,
         SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
bands0 AS (
  SELECT vec_id, 0 AS band, b0 AS bval FROM base UNION ALL
  SELECT vec_id, 1, b1 FROM base
),
bsz AS (SELECT band, bval, COUNT(*) AS bn FROM bands0 GROUP BY band, bval),
bands AS (
  SELECT b.vec_id, b.band, b.bval
  FROM bands0 b JOIN bsz USING (band, bval) WHERE bsz.bn <= 4096
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval
  WHERE a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b, ROUND({_DOT_AB} / (a.nrm * b.nrm), 4) AS cos_sim
FROM cand c
JOIN base a ON c.vec_a = a.vec_id
JOIN base b ON c.vec_b = b.vec_id
WHERE {_DOT_AB} / (a.nrm * b.nrm) > CAST(0.40 AS DOUBLE)
"""

# --- deterministic 2-iteration Lloyd k-means (k=8, seeds vec_id 0..7) -------
# Fold parity: list_sum/list_transform here == aggregate/zip_with on the
# Spark side (both sequential); the centroid AVG is rounded to 6dp in
# both engines before iteration 2, so assignments match exactly.

_KM_D2_C1 = (
    "list_sum(list_transform(generate_series(1, len(e.emb)), "
    "i -> (e.emb[i] - c.cent[i]) * (e.emb[i] - c.cent[i])))"
)

KMEANS_EMBEDDINGS = f"""
WITH emb AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
),
c1 AS (SELECT CAST(vec_id AS INT) AS cid, emb AS cent FROM emb WHERE vec_id < 8),
d1 AS (
  SELECT e.vec_id, c.cid, {_KM_D2_C1} AS d2
  FROM emb e CROSS JOIN c1 c
),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM d1
  ) r WHERE rn = 1
),
upd AS (
  SELECT a.cid, ks.i AS pos, e.emb[ks.i] AS x
  FROM a1 a JOIN emb e USING (vec_id), UNNEST(generate_series(1, 64)) AS ks(i)
),
c2dim AS (SELECT cid, pos, ROUND(AVG(x), 6) AS c FROM upd GROUP BY cid, pos),
c2 AS (SELECT cid, list(c ORDER BY pos) AS cent FROM c2dim GROUP BY cid),
d2i AS (
  SELECT e.vec_id, c.cid, {_KM_D2_C1} AS d2
  FROM emb e CROSS JOIN c2 c
),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) AS rn
    FROM d2i
  ) r WHERE rn = 1
)
SELECT a2.cid AS cluster_id, COUNT(*) AS n_members, MIN(a2.vec_id) AS min_vec_id,
       MIN(n.centroid_norm) AS centroid_norm
FROM a2 JOIN (
  SELECT cid, ROUND(SQRT(list_sum(list_transform(cent, c -> c * c))), 4)
         AS centroid_norm
  FROM c2
) n ON a2.cid = n.cid
GROUP BY a2.cid
"""

SAMPLE_STRATIFIED = """
SELECT lang, doc_id, smp_rank FROM (
  SELECT lang, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY md5(CAST(doc_id AS VARCHAR) || ':' || lang) ASC)
              AS INT) AS smp_rank
  FROM documents
) r
WHERE smp_rank <= (CASE WHEN lang = 'en' THEN 20 ELSE 10 END)
"""

STREAMING_INTERVAL_JOIN = """
SELECT a.user_id AS user_id, COUNT(*) AS n_pairs,
       MIN(a.event_id) AS min_click, MAX(b.event_id) AS max_view
FROM events a JOIN events b
  ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'view'
  AND b.ts >= a.ts - INTERVAL 30 MINUTE AND b.ts <= a.ts
GROUP BY a.user_id
"""

JSONL_ROUNDTRIP_DOCS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc
FROM documents GROUP BY lang
"""

CSV_ROUNDTRIP_DOCS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MAX(doc_id) AS max_doc
FROM documents GROUP BY lang
"""

DOC_QUALITY_FILTER = """
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ('the', 'a', 'of', 'in', 'and'))) AS INT) AS n_stop
  FROM documents
),
sh AS (
  SELECT doc_id, UNNEST(list_transform(
           generate_series(1, GREATEST(len(string_split(text, ' ')) - 2, 1)),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[LEAST(i + 1, len(string_split(text, ' ')))] || ' ' ||
                string_split(text, ' ')[LEAST(i + 2, len(string_split(text, ' ')))]
         )) AS sh_raw
  FROM documents
),
freq AS (
  SELECT doc_id, CAST(MAX(f) AS INT) AS max_sh_freq, CAST(SUM(f) AS BIGINT) AS n_sh
  FROM (SELECT doc_id, sh_raw, COUNT(*) AS f FROM sh GROUP BY doc_id, sh_raw) g
  GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, f.max_sh_freq, f.n_sh, b.n_stop,
       (b.n_tokens >= 20 AND b.n_tokens <= 10000
        AND (CAST(f.max_sh_freq AS DOUBLE) / CAST(f.n_sh AS DOUBLE)) < CAST(0.2 AS DOUBLE)
        AND (CAST(b.n_stop AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)) >= CAST(0.02 AS DOUBLE)) AS keep
FROM base b JOIN freq f USING (doc_id)
"""

TFIDF_TOP_TERMS = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
df_ AS (
  SELECT term, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, term FROM toks) d GROUP BY term
),
scored AS (
  SELECT t.doc_id, t.term,
         CAST(t.tf AS BIGINT)
           * CAST(FLOOR((SELECT COUNT(*) FROM documents) * 1000 / f.df) AS BIGINT)
           AS score
  FROM tf t JOIN df_ f USING (term)
)
SELECT doc_id, rnk, term, score FROM (
  SELECT doc_id, term, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term ASC) AS INT) AS rnk
  FROM scored
) r WHERE rnk <= 3
"""

PACK_SEQUENCES = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT CAST(FLOOR((cum - n_tokens) / 2048) AS BIGINT) AS seq_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       MIN(doc_id) AS first_doc
FROM c GROUP BY 1
"""

SUBSTRING_DUP_PAIRS = """
WITH w AS (
  SELECT DISTINCT doc_id,
         UNNEST(list_transform(
           generate_series(1, GREATEST(length(text) - 31, 1), 8),
           i -> substr(text, i, 32))) AS w
  FROM documents
),
freq AS (SELECT w, COUNT(*) AS nf FROM w GROUP BY w),
keep AS (SELECT w.doc_id, w.w FROM w JOIN freq USING (w)
         WHERE nf >= 2 AND nf <= 16)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       COUNT(*) AS n_shared_windows
FROM keep a JOIN keep b ON a.w = b.w AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

DQ_DOCUMENTS = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_text,
       COUNT(DISTINCT doc_id) AS distinct_ids,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
            AS BIGINT) AS chars_mismatch
FROM documents
"""

LANG_NGRAM_ID = """
WITH tri AS (
  SELECT doc_id, lang,
         UNNEST(list_transform(generate_series(1, GREATEST(length(text) - 2, 1)),
                i -> substr(text, i, 3))) AS tri
  FROM documents
),
pc AS (SELECT lang AS cand_lang, tri, COUNT(*) AS cnt FROM tri GROUP BY 1, 2),
prof AS (
  SELECT cand_lang, tri FROM (
    SELECT cand_lang, tri,
           ROW_NUMBER() OVER (PARTITION BY cand_lang
                              ORDER BY cnt DESC, tri ASC) AS rk
    FROM pc
  ) r WHERE rk <= 64
),
dt AS (SELECT DISTINCT doc_id, tri FROM tri),
sc AS (SELECT doc_id, cand_lang, COUNT(*) AS score
       FROM dt JOIN prof USING (tri) GROUP BY 1, 2),
best AS (
  SELECT doc_id, cand_lang AS pred_lang, score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score DESC, cand_lang ASC) AS rk
    FROM sc
  ) r WHERE rk = 1
)
SELECT b.doc_id, d.lang, b.pred_lang, CAST(b.score AS BIGINT) AS score,
       d.lang = b.pred_lang AS correct
FROM best b JOIN documents d USING (doc_id)
"""

# snapshot 1 = overwrite('en'); snapshot 2 = append('de') — the as-of-1
# read must equal the 'en' leg alone, the head read the union.
SNAPSHOT_TIME_TRAVEL = """
SELECT 1 AS snap, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_doc
FROM documents WHERE lang = 'en'
UNION ALL
SELECT 2, COUNT(*), CAST(SUM(n_chars) AS BIGINT), MIN(doc_id)
FROM documents WHERE lang IN ('en', 'de')
"""

# r05 add-column evolution: snap 1 = en docs without lang (reads back
# NULL → '<pre-evolution>' under the merged schema), snap 2 appends de
# docs with lang.  Leg snap=1 is the old-data-under-new-schema read.
SNAPSHOT_SCHEMA_EVOLUTION = """
SELECT 1 AS snap, '<pre-evolution>' AS lang_key, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_doc
FROM documents WHERE lang = 'en'
UNION ALL
SELECT 2, '<pre-evolution>', COUNT(*),
       CAST(SUM(n_chars) AS BIGINT), MIN(doc_id)
FROM documents WHERE lang = 'en'
UNION ALL
SELECT 2, 'de', COUNT(*), CAST(SUM(n_chars) AS BIGINT), MIN(doc_id)
FROM documents WHERE lang = 'de'
"""

# r05 MERGE upsert: snap 1 = en docs; updates bump n_chars by 1000 for
# en doc_id % 7 == 0 and insert the de docs; snap 2 = merged table.
SNAPSHOT_MERGE_UPSERT = """
SELECT 1 AS snap, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = 'en'
UNION ALL
SELECT 2, COUNT(*),
       CAST(SUM(CASE WHEN lang = 'en' AND doc_id % 7 = 0
                     THEN n_chars + 1000 ELSE n_chars END) AS BIGINT)
FROM documents WHERE lang IN ('en', 'de')
"""

DOC_LENGTH_QUANTILES = """
WITH r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       MAX(CASE WHEN rn = CAST(FLOOR((n * 50 + 99) / 100) AS BIGINT)
                THEN n_chars END) AS p50,
       MAX(CASE WHEN rn = CAST(FLOOR((n * 90 + 99) / 100) AS BIGINT)
                THEN n_chars END) AS p90,
       MAX(CASE WHEN rn = CAST(FLOOR((n * 99 + 99) / 100) AS BIGINT)
                THEN n_chars END) AS p99
FROM r GROUP BY lang
"""

STREAMING_DEDUP_DOCS = """
SELECT lang, COUNT(DISTINCT md5(text)) AS n_unique
FROM documents GROUP BY lang
"""

# watermarked variant: with the 7-day horizon >> the fixture doc_id
# span, dropDuplicatesWithinWatermark provably equals first-occurrence
# dedup (no state eviction during the drain), so the oracle is the
# same relational COUNT(DISTINCT).
STREAMING_DEDUP_WATERMARKED = STREAMING_DEDUP_DOCS

WINDOWS_SUITE = """
SELECT o_custkey, o_orderkey,
       CAST(RANK() OVER w AS INT) AS rnk,
       CAST(DENSE_RANK() OVER w AS INT) AS drnk,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       COALESCE(LAG(o_orderkey) OVER w, -1) AS prev_order,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
"""

CUBE_LINEITEM = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 0) AS sum_qty
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""

STRINGS_PARTS = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_u,
       CAST(regexp_extract(p_brand, '[0-9]+') AS INT) AS brand_num,
       substring(p_type, 1, 5) AS type_prefix,
       CAST(length(p_name) AS INT) AS name_len
FROM part WHERE p_name LIKE '%a%'
"""

DATES_ORDERS = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
       COUNT(*) AS n,
       CAST(datediff('day', MIN(CAST(o_orderdate AS DATE)),
                     MAX(CAST(o_orderdate AS DATE))) AS INT) AS span_days
FROM orders GROUP BY yr, qtr
"""

ANTI_JOIN_CUSTOMERS = """
SELECT c_mktsegment, COUNT(*) AS n_inactive
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
GROUP BY c_mktsegment
"""

SEMI_JOIN_PARTS = """
SELECT p_brand, COUNT(*) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
GROUP BY p_brand
"""

DOC_ROLLING_FINGERPRINT = """
SELECT doc_id,
       CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, length(text)),
                          i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
         (a, b) -> (a * 31 + b) % 1000000007) AS BIGINT) AS fingerprint
FROM documents
"""

TOKEN_BPE_COUNTS = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens
FROM documents
"""

def _knn_unbounded_sql() -> str:
    from .harness import AX, AY, BX, BY, PX, PY
    from .sqlgen import chain_select, point_seg_dist_steps

    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "byy", "dist_m")
    return f"""
WITH pts AS (SELECT o_orderkey AS point_id, {PX} AS lon, {PY} AS lat FROM orders),
segs AS (SELECT s_suppkey AS road_id, {AX} AS ax, {AY} AS ay, {BX} AS bx, {BY} AS byy FROM supplier),
cand AS (SELECT * FROM pts CROSS JOIN segs),
d AS ({chain_select("SELECT * FROM cand", steps, ["point_id", "road_id", "dist_m"])}),
ranked AS (
  SELECT point_id, road_id, dist_m,
         ROW_NUMBER() OVER (PARTITION BY point_id ORDER BY dist_m ASC, road_id ASC) AS rn
  FROM d
)
SELECT point_id, road_id, ROUND(dist_m, 6) AS dist_m FROM ranked WHERE rn = 1
"""



STREAMING_HOURLY_CLOSED = """
WITH mx AS (SELECT MAX(epoch(ts)) AS m FROM events),
agg AS (
  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         event_type,
         COUNT(*) AS n,
         CAST(FLOOR(SUM(value)) AS BIGINT) AS sum_value_floor
  FROM events GROUP BY 1, 2
)
SELECT a.hour_epoch, a.event_type, a.n, a.sum_value_floor
FROM agg a, mx
WHERE a.hour_epoch + 3600 <= mx.m - 7200
"""


def _ivf_d2(j: int) -> str:
    return (
        "list_sum(list_transform(generate_series(1, len(embedding)), "
        f"i -> (CAST(embedding[i] AS DOUBLE) - (CAST((i * 11 + {j} * 37) % 16 - 8 AS DOUBLE) "
        "/ CAST(4 AS DOUBLE))) * (CAST(embedding[i] AS DOUBLE) - "
        f"(CAST((i * 11 + {j} * 37) % 16 - 8 AS DOUBLE) / CAST(4 AS DOUBLE)))))"
    )


_IVF_DS = ", ".join(f"{_ivf_d2(j)} AS _d{j}" for j in range(8))
_IVF_BEST = "LEAST(" + ", ".join(f"_d{j}" for j in range(8)) + ")"
_IVF_CID = "CASE " + " ".join(f"WHEN _d{j} = _best THEN {j}" for j in range(8)) + " END"

ANN_IVF_TOPK = f"""
WITH d AS (
  SELECT vec_id, embedding, {_IVF_DS},
         SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
base AS (
  SELECT vec_id, embedding, nrm, CAST({_IVF_CID.replace("_best", _IVF_BEST)} AS INT) AS ivf_cell
  FROM d
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DOT_AB} / (a.nrm * b.nrm) AS cos_sim
  FROM base a JOIN base b ON a.ivf_cell = b.ivf_cell AND a.vec_id <> b.vec_id
  WHERE a.vec_id < 20
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, rnk, ROUND(cos_sim, 4) AS cos_sim
FROM ranked WHERE rnk <= 3
"""

_IVF_MASKED = [
    f"CASE WHEN {j} = ivf_cell THEN CAST(1e308 AS DOUBLE) ELSE _d{j} END"
    for j in range(8)
]
_IVF_CELL2 = "CASE " + " ".join(
    f"WHEN ({m}) = _b2 THEN {j}" for j, m in enumerate(_IVF_MASKED)
) + " END"

ANN_IVF_MULTIPROBE = f"""
WITH d AS (
  SELECT vec_id, embedding, {_IVF_DS},
         SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
base AS (
  SELECT vec_id, embedding, nrm,
         CAST({_IVF_CID.replace("_best", _IVF_BEST)} AS INT) AS ivf_cell
  FROM d
),
q AS (
  SELECT vec_id, embedding, nrm, ivf_cell, {_IVF_DS}
  FROM base WHERE vec_id < 20
),
q2 AS (
  SELECT *, LEAST({", ".join(_IVF_MASKED)}) AS _b2 FROM q
),
probes AS (
  SELECT vec_id, embedding, nrm,
         UNNEST([ivf_cell, CAST({_IVF_CELL2} AS INT)]) AS pcell
  FROM q2
),
pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_DOT_AB} / (a.nrm * b.nrm) AS cos_sim
  FROM probes a JOIN base b ON a.pcell = b.ivf_cell AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos_sim DESC, neighbor_id ASC) AS INT) AS rnk
  FROM pairs
)
SELECT query_id, neighbor_id, rnk, ROUND(cos_sim, 4) AS cos_sim
FROM ranked WHERE rnk <= 3
"""

_SH_DUCK = (
    "list_distinct(list_transform("
    "generate_series(1, GREATEST(len(string_split(text, ' ')) - 2, 1)), "
    "i -> string_split(text, ' ')[i] || ' ' || "
    "string_split(text, ' ')[LEAST(i + 1, len(string_split(text, ' ')))] || ' ' || "
    "string_split(text, ' ')[LEAST(i + 2, len(string_split(text, ' ')))]))"
)

NGRAM_JACCARD_INDEXED = f"""
WITH sets AS (SELECT doc_id, {_SH_DUCK} AS sh FROM documents),
inv AS (SELECT doc_id, UNNEST(sh) AS s FROM sets),
rare AS (SELECT s FROM (SELECT s, COUNT(*) AS nf FROM inv GROUP BY s) f
         WHERE nf >= 2 AND nf <= 10),
postings AS (SELECT i.doc_id, i.s FROM inv i JOIN rare r ON i.s = r.s),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM postings a JOIN postings b ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
             / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN sets sa ON sa.doc_id = c.doc_a
JOIN sets sb ON sb.doc_id = c.doc_b
WHERE ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6) >= 0.2
"""

# --- S7 MVT tile stats: bbox cover + division-free SAT membership (the
# byte-identical twin of geom.segments_intersect_rect — only * - <= on
# doubles, so booleans match bit-for-bit) ------------------------------------


def _mvt_tile_stats_sql(level: int = 4) -> str:
    from .harness import AX, AY, BX, BY
    from .sqlgen import grid_index_expr

    s = repr(10.0 / (1 << level))  # tile size (exact binary at level 4)
    return f"""
WITH segs AS (SELECT {AX} AS ax, {AY} AS ay, {BX} AS bx, {BY} AS byy FROM supplier),
idx AS (
  SELECT *, {grid_index_expr("LEAST(ax, bx)", level)} AS ix0,
         {grid_index_expr("LEAST(ay, byy)", level)} AS iy0,
         {grid_index_expr("GREATEST(ax, bx)", level)} AS ix1,
         {grid_index_expr("GREATEST(ay, byy)", level)} AS iy1
  FROM segs
),
expd AS (
  SELECT ax, ay, bx, byy,
         CAST(u1.cix AS INT) AS tx, CAST(u2.ciy AS INT) AS ty,
         (CAST(0 AS DOUBLE) + u1.cix * CAST({s} AS DOUBLE)) AS x0,
         (CAST(0 AS DOUBLE) + u2.ciy * CAST({s} AS DOUBLE)) AS y0
  FROM idx, UNNEST(generate_series(ix0, ix1)) AS u1(cix),
       UNNEST(generate_series(iy0, iy1)) AS u2(ciy)
),
d1 AS (
  SELECT tx, ty, ax, ay, x0, y0,
         (x0 + CAST({s} AS DOUBLE)) AS x1, (y0 + CAST({s} AS DOUBLE)) AS y1,
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
SELECT {level} AS z, tx, ty,
       CAST(SUM(CASE WHEN bbox
                      AND LEAST(s1, s2, s3, s4) <= CAST(0 AS DOUBLE)
                      AND GREATEST(s1, s2, s3, s4) >= CAST(0 AS DOUBLE)
                     THEN 1 ELSE 0 END) AS INT) AS n_features
FROM d2 GROUP BY tx, ty
"""


def _render_colormap_sql() -> str:
    """S6b rendered PNG: relational twin of the LUT render — level-6
    cell counts → bin → ramp literals → per-tile channel sums (the
    Spark side's sums come from DECODED png pixels)."""
    from .harness import PX, PY
    from .ops.payload import COLORMAP_RAMP
    from .sqlgen import grid_index_expr

    lut = ", ".join(
        f"({i}, {r}, {g}, {b})" for i, (r, g, b) in enumerate(COLORMAP_RAMP)
    )
    return f"""
WITH pts AS (SELECT {grid_index_expr(PX, 6)} AS ix,
                    {grid_index_expr(PY, 6)} AS iy FROM orders),
cnts AS (SELECT ix, iy, COUNT(*) AS cnt FROM pts GROUP BY ix, iy),
binned AS (
  SELECT CAST(FLOOR(ix / 8) AS INT) AS tx, CAST(FLOOR(iy / 8) AS INT) AS ty,
         CAST(LEAST(FLOOR(cnt / 4), 7) AS INT) AS bin
  FROM cnts
),
lut(bin, r, g, b) AS (VALUES {lut})
SELECT tx, ty, CAST(COUNT(*) AS INT) AS n_covered,
       CAST(SUM(l.r) AS BIGINT) AS sum_r,
       CAST(SUM(l.g) AS BIGINT) AS sum_g,
       CAST(SUM(l.b) AS BIGINT) AS sum_b
FROM binned j JOIN lut l ON j.bin = l.bin
GROUP BY tx, ty
"""


def _mvt_pyramid_sql(z_min: int = 3, z_max: int = 5) -> str:
    """S7b pyramid: per-zoom rollup of the single-zoom tile-stats SQL
    (covered tiles incl. empty layers; SAT-kept feature totals)."""
    legs = [
        f"SELECT z, COUNT(*) AS n_tiles, "
        f"CAST(SUM(n_features) AS BIGINT) AS sum_features "
        f"FROM ({_mvt_tile_stats_sql(z)}) GROUP BY z"
        for z in range(z_min, z_max + 1)
    ]
    return "\nUNION ALL\n".join(legs)


def _qatile_roads_sql(level: int = 4) -> str:
    """S2 QA-tile round trip: same bbox cover + SAT membership as the
    MVT sink oracle, with road ids threaded through; only tiles with a
    kept feature appear (the reader emits FEATURE rows — a tile whose
    cover candidates all SAT-reject holds an empty layer)."""
    from .harness import AX, AY, BX, BY
    from .sqlgen import grid_index_expr

    s = repr(10.0 / (1 << level))
    return f"""
WITH segs AS (SELECT s_suppkey AS road_id, {AX} AS ax, {AY} AS ay,
                     {BX} AS bx, {BY} AS byy FROM supplier),
idx AS (
  SELECT *, {grid_index_expr("LEAST(ax, bx)", level)} AS ix0,
         {grid_index_expr("LEAST(ay, byy)", level)} AS iy0,
         {grid_index_expr("GREATEST(ax, bx)", level)} AS ix1,
         {grid_index_expr("GREATEST(ay, byy)", level)} AS iy1
  FROM segs
),
expd AS (
  SELECT road_id, ax, ay, bx, byy,
         CAST(u1.cix AS INT) AS tx, CAST(u2.ciy AS INT) AS ty,
         (CAST(0 AS DOUBLE) + u1.cix * CAST({s} AS DOUBLE)) AS x0,
         (CAST(0 AS DOUBLE) + u2.ciy * CAST({s} AS DOUBLE)) AS y0
  FROM idx, UNNEST(generate_series(ix0, ix1)) AS u1(cix),
       UNNEST(generate_series(iy0, iy1)) AS u2(ciy)
),
d1 AS (
  SELECT road_id, tx, ty, ax, ay, x0, y0,
         (x0 + CAST({s} AS DOUBLE)) AS x1, (y0 + CAST({s} AS DOUBLE)) AS y1,
         (bx - ax) AS dx, (byy - ay) AS dy,
         LEAST(ax, bx) AS sxmin, GREATEST(ax, bx) AS sxmax,
         LEAST(ay, byy) AS symin, GREATEST(ay, byy) AS symax
  FROM expd
),
d2 AS (
  SELECT road_id, tx, ty,
         (sxmin <= x1 AND sxmax >= x0 AND symin <= y1 AND symax >= y0) AS bbox,
         (dx * (y0 - ay) - dy * (x0 - ax)) AS s1,
         (dx * (y0 - ay) - dy * (x1 - ax)) AS s2,
         (dx * (y1 - ay) - dy * (x0 - ax)) AS s3,
         (dx * (y1 - ay) - dy * (x1 - ax)) AS s4
  FROM d1
),
kept AS (
  SELECT road_id, tx, ty FROM d2
  WHERE bbox AND LEAST(s1, s2, s3, s4) <= CAST(0 AS DOUBLE)
            AND GREATEST(s1, s2, s3, s4) >= CAST(0 AS DOUBLE)
)
SELECT {level} AS z, tx, ty,
       CAST(COUNT(*) AS INT) AS n_features,
       CAST(SUM(road_id) AS BIGINT) AS sum_road_id
FROM kept GROUP BY tx, ty
"""


def image_oracles() -> dict[str, str]:
    """Oracles over the IMAGE FIXTURE parquet (BASELINE.json input_hint
    shape) — built lazily because they embed the absolute fixture path
    for the driver's sf0.01 correctness run (and ensure the fixture
    exists before DuckDB reads it; generation is cached/idempotent).

    * image_near_dup_pairs — the stored-phash LSH band join, rerun
      VERBATIM in DuckDB (bit_count/xor/shift semantics verified
      identical between engines).
    * image_decode_stats — fmt/byte metadata straight from the fixture
      parquet + mean_lum from the committed INDEPENDENT-numpy golden
      (scripts/make_goldens.py) + ok=TRUE asserted for every row: a
      decode failure or pixel regression on the Spark side flips
      ok/mean_lum and fails the value hash.
    """
    import os

    from .jobs.rai import fixture_dir

    img = os.path.join(fixture_dir(0.01), "images.parquet").replace("'", "''")
    golden = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "decode_stats_sf0.01.parquet",
    ).replace("'", "''")
    near_dup = f"""
WITH img AS (SELECT image_id, phash FROM read_parquet('{img}')
             WHERE image_id < 'img000000000400'),
bands AS (SELECT image_id, phash, u.band, (phash >> (8 * u.band)) & 255 AS sig
          FROM img, UNNEST(generate_series(0, 7)) AS u(band)),
cand AS (SELECT DISTINCT a.image_id AS id_a, b.image_id AS id_b,
                CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.sig = b.sig AND a.image_id < b.image_id)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 12
"""
    decode_stats = f"""
SELECT f.image_id, f.fmt, CAST(octet_length(f.bytes) AS INT) AS n_bytes,
       TRUE AS ok, g.mean_lum
FROM read_parquet('{img}') f
JOIN read_parquet('{golden}') g USING (image_id)
WHERE f.image_id < 'img000000000500'
"""
    thumb_golden = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens", "thumb_stats_sf0.01.parquet",
    ).replace("'", "''")
    # image_thumbnails: fmt metadata from the fixture parquet, thumb
    # mean_lum from the committed independent reshape-block-mean golden,
    # ok=TRUE asserted — a resize/decode regression flips the hash.
    thumbnails = f"""
SELECT f.image_id, f.fmt, 16 AS tw, 16 AS th, TRUE AS ok, g.mean_lum
FROM read_parquet('{img}') f
JOIN read_parquet('{thumb_golden}') g USING (image_id)
WHERE f.image_id < 'img000000000500'
"""
    goldens_dir = os.path.dirname(golden).replace("'", "''")
    roads_pq = os.path.join(fixture_dir(0.01), "roads.parquet").replace("'", "''")
    countries_pq = os.path.join(
        fixture_dir(0.01), "countries.parquet"
    ).replace("'", "''")
    # osm_relation_rings (r04): recompute the stitched-ring invariants
    # from the ORIGINAL country rings (relation_id = dense code order;
    # micro-rounding absorbs the summation-order float delta between
    # the stitched rotation/orientation and the original sequence).
    relation_rings = f"""
WITH c AS (
  SELECT ring,
         CAST(ROW_NUMBER() OVER (ORDER BY country_code) - 1 AS INT)
           AS relation_id
  FROM read_parquet('{countries_pq}')
)
SELECT relation_id,
       CAST(3 + relation_id % 3 AS INT) AS n_members,
       CAST(len(ring) AS INT) AS n_points,
       TRUE AS closed,
       CAST(FLOOR(ABS(0.5 * list_sum(list_transform(
            generate_series(1, len(ring) - 1),
            i -> ring[i].x * ring[i+1].y - ring[i+1].x * ring[i].y)))
            * 1000000 + 0.5) AS BIGINT) AS area_mic,
       CAST(FLOOR(list_sum(list_transform(
            generate_series(1, len(ring) - 1),
            i -> SQRT((ring[i+1].x - ring[i].x) * (ring[i+1].x - ring[i].x)
                    + (ring[i+1].y - ring[i].y) * (ring[i+1].y - ring[i].y))))
            * 1000000 + 0.5) AS BIGINT) AS perim_mic
FROM c
"""
    # geojson_roundtrip_roads (r04): aggregate the ORIGINAL roads
    # parquet — the Spark side aggregates the GeoJSON round-trip.
    geojson_roads = f"""
SELECT kind, COUNT(*) AS n_roads,
       CAST(SUM(len(coords)) AS BIGINT) AS sum_pts,
       CAST(SUM(CAST(FLOOR(coords[1].x * 1000) AS BIGINT)) AS BIGINT)
         AS sum_x_mils
FROM read_parquet('{roads_pq}') GROUP BY kind
"""
    # image_rai_summary (r04; was rows-only): aggregate the committed
    # INDEPENDENT per-image golden (generator pixels + scalar clip/burn
    # twins + transposed-scan chamfer + generator-side countries —
    # scripts/make_goldens.py) per country.  Integer-mils sums are exact
    # bigints on both engines; the only float ops are / and FLOOR on
    # identical inputs (gotcha-8-approved).
    rai_summary = f"""
SELECT country_code,
       COUNT(*) AS n_images,
       CAST(SUM(CASE WHEN pop_near_mils > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_near,
       CAST(SUM(pop_total_mils) AS BIGINT) / 1000.0 AS pop_total,
       CAST(SUM(pop_near_mils) AS BIGINT) / 1000.0 AS pop_near,
       FLOOR((CAST(SUM(pop_near_mils) AS BIGINT) / 1000.0)
             / (CAST(SUM(pop_total_mils) AS BIGINT) / 1000.0)
             * 1000000.0 + 0.5) / 1000000.0 AS rai
FROM read_parquet('{goldens_dir}/rai_per_image_sf0.01.parquet')
GROUP BY country_code
"""
    # image_cost_distance (r04): the A2 non-uniform-friction surface,
    # certified by the independent per-image golden (Dijkstra-checked
    # recurrence, generator pixels).
    cost_distance = f"""
SELECT image_id, pop_near_mils, CAST(px_near AS INT) AS px_near
FROM read_parquet('{goldens_dir}/cost_distance_sf0.01.parquet')
"""
    # image_warp_utm (r04): general-CRS raster warp, integer checksums
    # vs the generator-pixel golden.
    warp_utm = f"""
SELECT image_id, warp_sum, CAST(n_nonfill AS INT) AS n_nonfill
FROM read_parquet('{goldens_dir}/warp_utm_sf0.01.parquet')
"""
    # multimodal audio/video (r04; was rows-only): the committed goldens
    # regenerate the clip/frame SPEC and reimplement the PCM16 quantize —
    # the engine WAV/rawvid codecs never touch the oracle side.
    audio_features = f"""
SELECT media_id, rms, zcr, peak, CAST(n_samples AS BIGINT) AS n_samples
FROM read_parquet('{goldens_dir}/audio_features.parquet')
"""
    video_frames = f"""
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx, t_sec, mean_luma
FROM read_parquet('{goldens_dir}/video_frames.parquet')
"""
    audio_spectral = f"""
SELECT media_id, centroid_hz, peak_hz, energy, CAST(n_bins AS INT) AS n_bins
FROM read_parquet('{goldens_dir}/audio_spectral.parquet')
"""
    video_cuts = f"""
SELECT media_id, CAST(n_frames AS INT) AS n_frames,
       CAST(n_cuts AS INT) AS n_cuts, CAST(first_cut AS INT) AS first_cut
FROM read_parquet('{goldens_dir}/video_cuts.parquet')
"""
    return {
        "image_near_dup_pairs": near_dup,
        "image_decode_stats": decode_stats,
        "image_thumbnails": thumbnails,
        "image_rai_summary": rai_summary,
        "image_cost_distance": cost_distance,
        "image_warp_utm": warp_utm,
        "geojson_roundtrip_roads": geojson_roads,
        "osm_relation_rings": relation_rings,
        "multimodal_audio_features": audio_features,
        "multimodal_video_frames": video_frames,
        "multimodal_audio_spectral": audio_spectral,
        "multimodal_video_cuts": video_cuts,
    }


ORACLES_EXT = {
    "mvt_tile_stats": _mvt_tile_stats_sql(4),
    "osm_qatile_roads": _qatile_roads_sql(4),
    "mvt_pyramid_stats": _mvt_pyramid_sql(3, 5),
    "image_render_colormap": _render_colormap_sql(),
    "ann_ivf_topk": ANN_IVF_TOPK,
    "ann_ivf_multiprobe": ANN_IVF_MULTIPROBE,
    "ngram_jaccard_indexed": NGRAM_JACCARD_INDEXED,
    "embedding_cosine_neardup": EMBEDDING_COSINE_NEARDUP,
    "kmeans_embeddings": KMEANS_EMBEDDINGS,
    "sample_stratified": SAMPLE_STRATIFIED,
    "streaming_dedup_docs": STREAMING_DEDUP_DOCS,
    "streaming_dedup_watermarked": STREAMING_DEDUP_WATERMARKED,
    "doc_length_quantiles": DOC_LENGTH_QUANTILES,
    "snapshot_time_travel": SNAPSHOT_TIME_TRAVEL,
    "snapshot_schema_evolution": SNAPSHOT_SCHEMA_EVOLUTION,
    "snapshot_merge_upsert": SNAPSHOT_MERGE_UPSERT,
    "lang_ngram_id": LANG_NGRAM_ID,
    "dq_documents": DQ_DOCUMENTS,
    "substring_dup_pairs": SUBSTRING_DUP_PAIRS,
    "streaming_interval_join": STREAMING_INTERVAL_JOIN,
    "jsonl_roundtrip_docs": JSONL_ROUNDTRIP_DOCS,
    "csv_roundtrip_docs": CSV_ROUNDTRIP_DOCS,
    "doc_quality_filter": DOC_QUALITY_FILTER,
    "tfidf_top_terms": TFIDF_TOP_TERMS,
    "pack_sequences": PACK_SEQUENCES,
    "streaming_hourly_closed": STREAMING_HOURLY_CLOSED,
    "spatial_knn_unbounded": _knn_unbounded_sql(),
    "doc_rolling_fingerprint": DOC_ROLLING_FINGERPRINT,
    "token_bpe_counts": TOKEN_BPE_COUNTS,
    "dedup_exact": DEDUP_EXACT,
    "simhash60": SIMHASH60,
    "ngram_jaccard_pairs": NGRAM_JACCARD_PAIRS,
    "embedding_lsh_buckets": EMBEDDING_LSH_BUCKETS,
    "ann_lsh_topk": ANN_LSH_TOPK,
    "windows_suite": WINDOWS_SUITE,
    "cube_lineitem": CUBE_LINEITEM,
    "strings_parts": STRINGS_PARTS,
    "dates_orders": DATES_ORDERS,
    "anti_join_customers": ANTI_JOIN_CUSTOMERS,
    "semi_join_parts": SEMI_JOIN_PARTS,
    # image_decode_stats / image_near_dup_pairs / image_rai_summary /
    # multimodal audio+video: built lazily by image_oracles() (they
    # embed absolute fixture/golden paths).  As of r04 every registered
    # query has an oracle — zero rows-only entries remain.
}
