"""DuckDB oracle twins for queries_r5g (wave 34).

The Spark side routes through SQL UDFs / session variables / Arrow
batches / a grouped-agg pandas UDF; the DuckDB twin states the same
semantics in plain ANSI SQL — per-row FLOOR-to-cents before sums
(gotcha 8), nearest-rank-lower medians (no interpolation).
"""

from __future__ import annotations

ORACLES_R5G: dict[str, str] = {}

ORACLES_R5G["events_nelson_aalen"] = """
WITH per_user AS (
  SELECT user_id,
         MIN(epoch_us(ts)) AS t0,
         MAX(epoch_us(ts)) AS t_last,
         MIN(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) END) AS t_hit
  FROM events GROUP BY user_id
),
subj AS (
  SELECT CASE WHEN t_hit IS NOT NULL
              THEN (t_hit - t0) // 3600000000
              ELSE (t_last - t0) // 3600000000 END AS dur_hr,
         CASE WHEN t_hit IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
),
per_dur AS (
  SELECT dur_hr,
         CAST(SUM(event) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS m
  FROM subj GROUP BY dur_hr
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM subj),
risk AS (
  SELECT dur_hr, d,
         n_total - COALESCE(SUM(m) OVER (ORDER BY dur_hr
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM per_dur CROSS JOIN tot
),
haz AS (
  SELECT dur_hr, d, CAST(n_at_risk AS BIGINT) AS n_at_risk,
         CAST(d * 1000000000 // n_at_risk AS BIGINT) AS hazard_nanos
  FROM risk WHERE d > 0
)
SELECT dur_hr, d, n_at_risk, hazard_nanos,
       CAST(SUM(hazard_nanos) OVER (ORDER BY dur_hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_nanos
FROM haz
ORDER BY dur_hr
"""

ORACLES_R5G["events_permutation_test"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN us < mid THEN -cents ELSE cents END)
              AS BIGINT) AS d
  FROM ev CROSS JOIN mid GROUP BY user_id
),
obs AS (
  SELECT CAST(SUM(d) AS BIGINT) AS t_obs,
         CAST(SUM(abs(d)) AS BIGINT) AS sum_abs_d,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM per_user
),
perms AS (
  SELECT k,
         CAST(SUM((CASE WHEN substring(md5(concat(
                 CAST(user_id AS VARCHAR), ':', CAST(k AS VARCHAR))),
                 1, 1) IN ('0','1','2','3','4','5','6','7')
               THEN 1 ELSE -1 END) * d) AS BIGINT) AS t_k
  FROM per_user
  CROSS JOIN (SELECT CAST(UNNEST(generate_series(0, 199)) AS INT) AS k)
  GROUP BY k
)
SELECT o.t_obs, o.sum_abs_d, o.n_users,
       CAST(SUM(CASE WHEN abs(p.t_k) >= abs(o.t_obs)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST((1 + SUM(CASE WHEN abs(p.t_k) >= abs(o.t_obs)
                     THEN 1 ELSE 0 END)) * 1000 // 201 AS BIGINT)
         AS p_milli
FROM perms p CROSS JOIN obs o
GROUP BY o.t_obs, o.sum_abs_d, o.n_users
"""

ORACLES_R5G["orders_holt_linear"] = """
WITH RECURSIVE days AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) - 1 AS t, y
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS y
    FROM orders GROUP BY 1
  )
),
holt (t, y, level_milli, trend_milli) AS (
  SELECT d0.t, d0.y,
         d0.y * 1000 AS level_milli,
         (d1.y - d0.y) * 1000 AS trend_milli
  FROM days d0 JOIN days d1 ON d1.t = 1
  WHERE d0.t = 0
  UNION ALL
  SELECT d.t, d.y,
         CAST(FLOOR((d.y * 1000
              + 4 * (h.level_milli + h.trend_milli)) / 5) AS BIGINT),
         CAST(FLOOR((CAST(FLOOR((d.y * 1000
                + 4 * (h.level_milli + h.trend_milli)) / 5) AS BIGINT)
              - h.level_milli + 9 * h.trend_milli) / 10) AS BIGINT)
  FROM holt h JOIN days d ON d.t = h.t + 1
)
SELECT t, y, level_milli, trend_milli,
       CAST(level_milli + trend_milli AS BIGINT) AS forecast_next_milli
FROM holt
ORDER BY t
"""

ORACLES_R5G["events_cuped_eval"] = """
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
per_user AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN us < mid THEN cents ELSE 0 END) AS BIGINT)
           AS pre,
         CAST(SUM(CASE WHEN us >= mid THEN cents ELSE 0 END) AS BIGINT)
           AS post
  FROM ev CROSS JOIN mid GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx,
         CAST(SUM(post) AS BIGINT) AS sy,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx,
         CAST(SUM(post * post) AS BIGINT) AS syy,
         CAST(SUM(pre * post) AS BIGINT) AS sxy
  FROM per_user
)
SELECT n, sx, sy, sxx, syy, sxy,
       CAST(FLOOR(1000000.0
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
            AS BIGINT) AS theta_micros,
       CAST(FLOOR(1000000.0
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
            AS BIGINT) AS var_reduction_ppm
FROM m
"""

ORACLES_R5G["events_attribution_linear"] = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         strftime(ts, '%a') AS dow
  FROM events
),
views AS (
  SELECT user_id, event_id AS view_id, us AS v_us, dow
  FROM ev WHERE event_type = 'view'
),
purch AS (
  SELECT user_id, event_id AS purchase_id, us AS p_us
  FROM ev WHERE event_type = 'purchase'
),
pairs AS (
  SELECT v.dow, v.view_id, p.purchase_id
  FROM views v JOIN purch p USING (user_id)
  WHERE v.v_us <= p.p_us AND p.p_us - v.v_us <= 604800000000
),
n_per AS (
  SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_views
  FROM pairs GROUP BY purchase_id
),
credited AS (
  SELECT pr.dow, pr.view_id, pr.purchase_id,
         CAST(1000000 // np.n_views AS BIGINT) AS credit_micros
  FROM pairs pr JOIN n_per np USING (purchase_id)
)
SELECT dow,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT view_id) AS BIGINT) AS n_views,
       CAST(SUM(credit_micros) AS BIGINT) AS credit_micros
FROM credited
GROUP BY dow
ORDER BY dow
"""

_MAT_DOT16 = (
    "list_sum(list_transform(generate_series(1, 16), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)

_MAT_DOT64 = (
    "list_sum(list_transform(generate_series(1, len(a.embedding)), "
    "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
)

ORACLES_R5G["ann_matryoshka_recall"] = f"""
WITH nrm64 AS (
  SELECT vec_id, embedding,
         SQRT(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           {_MAT_DOT64} / (a.nrm * b.nrm) AS cos_sim
    FROM nrm64 a CROSS JOIN nrm64 b
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
  )
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, neighbor_id ASC) <= 3
),
nrm16 AS (
  SELECT vec_id, embedding[1:16] AS embedding,
         SQRT(list_sum(list_transform(embedding[1:16],
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
),
trunc AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           {_MAT_DOT16} / (a.nrm * b.nrm) AS cos_sim
    FROM nrm16 a CROSS JOIN nrm16 b
    WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
  )
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY cos_sim DESC, neighbor_id ASC) <= 3
),
hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM exact e JOIN trunc t USING (query_id, neighbor_id)
  GROUP BY e.query_id
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) * 1000 // 3 AS BIGINT) AS recall_mils
FROM (SELECT DISTINCT query_id FROM exact) q
LEFT JOIN hits h USING (query_id)
ORDER BY q.query_id
"""

ORACLES_R5G["doc_collocation_tscore"] = """
WITH toks AS (
  SELECT w[i] AS x, w[i + 1] AS y
  FROM (SELECT string_split(text, ' ') AS w FROM documents),
       UNNEST(generate_series(1, len(w) - 1)) AS u(i)
),
big AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS f_xy
        FROM toks GROUP BY x, y),
ux AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS f_x FROM toks GROUP BY x),
uy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS f_y FROM toks GROUP BY y),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_big FROM toks),
scored AS (
  SELECT b.x, b.y, b.f_xy,
         CAST(FLOOR(1000000.0 * (CAST(b.f_xy AS DOUBLE)
              - CAST(ux.f_x AS DOUBLE) * CAST(uy.f_y AS DOUBLE)
              / CAST(nb.n_big AS DOUBLE))
              / sqrt(CAST(b.f_xy AS DOUBLE))) AS BIGINT) AS t_micros
  FROM big b JOIN ux USING (x) JOIN uy USING (y) CROSS JOIN nb
  WHERE b.f_xy >= 5
)
SELECT CAST(rnk AS INT) AS rnk, x, y, f_xy, t_micros
FROM (
  SELECT x, y, f_xy, t_micros,
         ROW_NUMBER() OVER (ORDER BY t_micros DESC, x, y) AS rnk
  FROM scored
)
WHERE rnk <= 10
"""

ORACLES_R5G["snapshot_rename_column"] = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(1 AS INT) AS rename_was_metadata_only,
       CAST(1 AS INT) AS pre_snapshot_has_old_name,
       CAST(1 AS INT) AS head_has_new_name
FROM documents
GROUP BY lang
ORDER BY lang
"""

ORACLES_R5G["streaming_full_outer_join"] = """
WITH clicks AS (
  SELECT user_id AS c_user, event_id AS click_id, ts AS c_ts
  FROM events
  WHERE event_type = 'click' AND ts < TIMESTAMP '2024-01-10 00:00:00'
),
views AS (
  SELECT user_id AS v_user, event_id AS view_id, ts AS v_ts
  FROM events
  WHERE event_type = 'view' AND ts < TIMESTAMP '2024-01-11 00:00:00'
),
j AS (
  SELECT COALESCE(c.c_user, v.v_user) AS user_id,
         c.click_id, c.c_ts, v.view_id, v.v_ts
  FROM clicks c
  FULL JOIN views v
    ON c.c_user = v.v_user
   AND v.v_ts >= c.c_ts - INTERVAL 1800 SECOND
   AND v.v_ts <= c.c_ts
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN click_id IS NOT NULL AND view_id IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN view_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click_only,
       CAST(SUM(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_only,
       CAST(SUM(COALESCE(click_id, 0) + COALESCE(view_id, 0)) AS BIGINT)
         AS id_chk
FROM j
WHERE COALESCE(c_ts, v_ts) < TIMESTAMP '2024-01-09 00:00:00'
GROUP BY user_id
ORDER BY user_id
"""

ORACLES_R5G["doc_char_lm_score"] = """
WITH bi AS (
  SELECT doc_id, lang,
         substring(text, i, 1) AS x,
         substring(text, i, 2) AS xy
  FROM documents,
       UNNEST(generate_series(1, length(text) - 1)) AS u(i)
),
c_xy AS (SELECT xy, CAST(COUNT(*) AS BIGINT) AS n_xy FROM bi GROUP BY xy),
c_x AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS n_x FROM bi GROUP BY x),
per_doc AS (
  SELECT doc_id, lang,
         CAST(COUNT(*) AS BIGINT) AS n_trans,
         CAST(SUM(CAST(n_xy * 1000000 // n_x AS BIGINT)) AS BIGINT)
           AS sum_ppm
  FROM bi JOIN c_xy USING (xy) JOIN c_x USING (x)
  GROUP BY doc_id, lang
),
scored AS (
  SELECT doc_id, lang, n_trans,
         CAST(sum_ppm // n_trans AS BIGINT) AS score_ppm
  FROM per_doc
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(score_ppm) // COUNT(*) AS BIGINT) AS mean_score_ppm,
       CAST(MIN(score_ppm) AS BIGINT) AS min_score_ppm,
       CAST(MIN(doc_id) FILTER (WHERE score_ppm = mn) AS BIGINT)
         AS worst_doc
FROM (SELECT *, MIN(score_ppm) OVER (PARTITION BY lang) AS mn
      FROM scored)
GROUP BY lang
ORDER BY lang
"""

ORACLES_R5G["vocab_coverage_curve"] = """
WITH toks AS (
  SELECT t.w
  FROM documents,
       LATERAL (SELECT UNNEST(string_split(text, ' ')) AS w) AS t
  WHERE t.w != ''
),
vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY w),
ranked AS (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rnk
  FROM vocab
),
cum AS (
  SELECT rnk,
         CAST(SUM(n) OVER (ORDER BY rnk
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum
  FROM ranked
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
levels AS (
  SELECT CAST(i AS INT) AS i,
         CAST(POW(2, i) AS BIGINT) AS k
  FROM UNNEST(generate_series(1, 10)) AS u(i)
)
SELECT l.i, l.k,
       CAST(MAX(c.cum) AS BIGINT) AS covered,
       t.total,
       CAST(MAX(c.cum) * 1000000 // t.total AS BIGINT) AS coverage_ppm
FROM cum c JOIN levels l ON c.rnk <= l.k
CROSS JOIN total t
GROUP BY l.i, l.k, t.total
ORDER BY l.i
"""

ORACLES_R5G["doc_ngram_novelty"] = """
WITH sh AS (
  SELECT doc_id, lang,
         array_to_string(w[i + 1:i + 5], ' ') AS shingle
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w
        FROM documents),
       UNNEST(generate_series(0, len(w) - 5)) AS u(i)
),
per_sh AS (
  SELECT doc_id, lang, shingle, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM sh GROUP BY 1, 2, 3
),
owners AS (
  SELECT shingle, CAST(MIN(doc_id) AS BIGINT) AS owner
  FROM per_sh GROUP BY shingle
),
per_doc AS (
  SELECT p.doc_id, p.lang,
         CAST(SUM(p.cnt) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN o.owner = p.doc_id THEN p.cnt ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM per_sh p JOIN owners o USING (shingle)
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_id, lang, n_shingles, n_novel,
         CAST(n_novel * 1000000 // n_shingles AS BIGINT) AS novelty_ppm
  FROM per_doc
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS total_novel,
       CAST(SUM(novelty_ppm) // COUNT(*) AS BIGINT) AS mean_novelty_ppm,
       CAST(MIN(doc_id) FILTER (WHERE novelty_ppm = mn) AS BIGINT)
         AS least_novel_doc
FROM (SELECT *, MIN(novelty_ppm) OVER (PARTITION BY lang) AS mn
      FROM scored)
GROUP BY lang
ORDER BY lang
"""

ORACLES_R5G["dedup_impact_report"] = """
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(text) AS h_exact,
         md5(regexp_replace(lower(text), ' +', ' ', 'g')) AS h_norm
  FROM documents
),
base AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
  FROM d GROUP BY lang
),
ex AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS exact_docs,
         CAST(SUM(tok1) AS BIGINT) AS exact_tokens
  FROM (SELECT lang, h_exact, MAX(n_tokens) AS tok1
        FROM d GROUP BY lang, h_exact)
  GROUP BY lang
),
nm AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS norm_docs,
         CAST(SUM(tok1) AS BIGINT) AS norm_tokens
  FROM (SELECT lang, h_norm, MAX(n_tokens) AS tok1
        FROM d GROUP BY lang, h_norm)
  GROUP BY lang
)
SELECT b.lang, b.n_docs, b.n_tokens,
       ex.exact_docs, ex.exact_tokens, nm.norm_docs, nm.norm_tokens,
       CAST(ex.exact_tokens * 1000000 // b.n_tokens AS BIGINT)
         AS exact_keep_ppm,
       CAST(nm.norm_tokens * 1000000 // b.n_tokens AS BIGINT)
         AS norm_keep_ppm
FROM base b JOIN ex USING (lang) JOIN nm USING (lang)
ORDER BY b.lang
"""

ORACLES_R5G["doc_lang_classifier"] = """
WITH terms AS (
  SELECT DISTINCT doc_id, lang, t.term
  FROM documents,
       LATERAL (SELECT UNNEST(string_split_regex(lower(text),
                '[^a-z]+')) AS term) AS t
  WHERE t.term != ''
),
df_lang AS (
  SELECT term, lang AS wl, CAST(COUNT(*) AS BIGINT) AS a
  FROM terms GROUP BY 1, 2
),
df_all AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM terms GROUP BY term
),
n_lang AS (
  SELECT lang AS wl, CAST(COUNT(*) AS BIGINT) AS nl
  FROM documents GROUP BY 1
),
n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
weights AS (
  SELECT dl.term, dl.wl,
         CAST(dl.a * nt.n * 1000000 // (da.df * nl.nl) AS BIGINT) AS w
  FROM df_lang dl
  JOIN df_all da USING (term)
  JOIN n_lang nl USING (wl)
  CROSS JOIN n_tot nt
),
scores AS (
  SELECT t.doc_id, t.lang, w.wl, CAST(SUM(w.w) AS BIGINT) AS score
  FROM terms t JOIN weights w USING (term)
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, lang AS true_lang, wl AS pred_lang, score AS best_score
  FROM scores
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, wl) = 1
)
SELECT true_lang, pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(best_score) AS BIGINT) AS sum_score
FROM pred
GROUP BY 1, 2
ORDER BY true_lang, pred_lang
"""

ORACLES_R5G["doc_term_chisq"] = """
WITH terms AS (
  SELECT DISTINCT doc_id, lang, t.term
  FROM documents,
       LATERAL (SELECT UNNEST(string_split_regex(lower(text),
                '[^a-z]+')) AS term) AS t
  WHERE t.term != ''
),
df_lang AS (
  SELECT term, lang, CAST(COUNT(*) AS BIGINT) AS a
  FROM terms GROUP BY term, lang
),
df_all AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM terms GROUP BY term
),
n_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS nl
  FROM documents GROUP BY lang
),
n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
cont AS (
  SELECT dl.lang, dl.term, dl.a,
         da.df - dl.a AS b, nl.nl - dl.a AS c,
         nt.n - da.df - (nl.nl - dl.a) AS d, nt.n
  FROM df_lang dl
  JOIN df_all da USING (term)
  JOIN n_lang nl USING (lang)
  CROSS JOIN n_tot nt
),
chi AS (
  SELECT lang, term, a,
         CAST(FLOOR(1000000.0 * CAST(n AS DOUBLE)
              * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
              * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                 - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
              / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                 * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)))
              AS BIGINT) AS chi2_micros
  FROM cont
)
SELECT lang, term, a, chi2_micros,
       CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT lang, term, a, chi2_micros,
         ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY chi2_micros DESC, term) AS rnk
  FROM chi
)
WHERE rnk <= 3
ORDER BY lang, rnk
"""

ORACLES_R5G["avro_roundtrip_events"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(epoch_us(ts) % 997) AS BIGINT) AS ts_chk
FROM events
GROUP BY event_type
ORDER BY event_type
"""

ORACLES_R5G["sql_udf_revenue"] = """
SELECT l_returnflag AS flag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)
                           * (1.0 - l_discount) * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(SUM(CASE WHEN CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)
                                     * l_tax * 100.0 + 0.5) AS BIGINT)
                          * 25
                          > CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)
                                       * (1.0 - l_discount) * 100.0
                                       + 0.5) AS BIGINT)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_tax
FROM lineitem
GROUP BY l_returnflag
ORDER BY flag
"""

ORACLES_R5G["session_variable_segments"] = """
WITH thr AS (
  SELECT AVG(CAST(c_acctbal AS DOUBLE)) AS min_bal FROM customer
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_above,
       CAST(SUM(CAST(FLOOR(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS bal_cents
FROM customer CROSS JOIN thr
WHERE CAST(c_acctbal AS DOUBLE) > min_bal
GROUP BY c_mktsegment
ORDER BY segment
"""

ORACLES_R5G["arrow_doc_stats"] = r"""
WITH per AS (
  SELECT doc_id, lang,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         len(regexp_extract_all(text, '\S+')) AS n_tokens,
         len(regexp_extract_all(text, '[aeiou]')) AS n_vowels
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_vowels) AS BIGINT) AS total_vowels,
       CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
FROM per
GROUP BY lang
ORDER BY lang
"""

ORACLES_R5G["grouped_agg_user_median"] = """
WITH cents AS (
  SELECT event_type, user_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT event_type, user_id, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type, user_id
                            ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, user_id) AS cnt
  FROM cents
),
per_user AS (
  SELECT event_type, user_id,
         MAX(CASE WHEN rn = (cnt + 1) // 2 THEN cents END) AS med_cents,
         MAX(cnt) AS n
  FROM ranked
  GROUP BY event_type, user_id
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(med_cents) AS BIGINT) AS sum_medians,
       CAST(MAX(med_cents) AS BIGINT) AS max_median,
       CAST(SUM(n) AS BIGINT) AS n_events
FROM per_user
GROUP BY event_type
ORDER BY event_type
"""


def fixture_oracles_r5g() -> dict[str, str]:
    """Lazily-built oracles embedding absolute fixture/golden paths
    (the image kernels compare against committed goldens produced by
    the INDEPENDENT scalar twins in scripts/make_goldens.py)."""
    import os

    from .jobs.rai import fixture_dir

    fdir = fixture_dir(0.01)
    img = os.path.join(fdir, "images.parquet").replace("'", "''")
    roads = os.path.join(fdir, "roads.parquet").replace("'", "''")
    gdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "goldens",
    ).replace("'", "''")
    from .queries_r5 import _BFS_NODE, _LPA_ROUNDS

    node = _BFS_NODE.format(x="c.x", y="c.y")
    rounds_sql = []
    for i in range(1, _LPA_ROUNDS + 1):
        rounds_sql.append(
            f"c{i} AS (SELECT d.dst AS v2, l.label, COUNT(*) AS cnt\n"
            f"  FROM dirs d JOIN l{i - 1} l ON l.v = d.src GROUP BY 1, 2),\n"
            f"l{i} AS (SELECT v2 AS v, label FROM c{i}\n"
            f"  QUALIFY ROW_NUMBER() OVER (PARTITION BY v2"
            f" ORDER BY cnt DESC, label) = 1)"
        )
    modularity = f"""
WITH nds AS (SELECT list_transform(coords, c -> {node}) AS nds
             FROM read_parquet('{roads}')),
ab AS (SELECT nds[i] AS a, nds[i + 1] AS b
       FROM nds, UNNEST(generate_series(1, len(nds) - 1)) AS u(i)),
und AS (SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v
        FROM ab WHERE a <> b),
dirs AS (SELECT u AS src, v AS dst FROM und
         UNION ALL SELECT v AS src, u AS dst FROM und),
l0 AS (SELECT DISTINCT src AS v, src AS label FROM dirs),
{",".join(rounds_sql)},
fin AS (SELECT v, label FROM l{_LPA_ROUNDS}),
m_cte AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
        FROM dirs GROUP BY src),
intra AS (
  SELECT fu.label, CAST(COUNT(*) AS BIGINT) AS m_in
  FROM und e
  JOIN fin fu ON fu.v = e.u
  JOIN fin fv ON fv.v = e.v
  WHERE fu.label = fv.label
  GROUP BY fu.label
),
per_c AS (
  SELECT f.label,
         CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d.deg) AS BIGINT) AS deg_sum
  FROM fin f JOIN deg d ON d.src = f.v
  GROUP BY f.label
),
contribs AS (
  SELECT p.label, p.n_nodes,
         CAST(COALESCE(i.m_in, 0) AS BIGINT) AS m_in, p.deg_sum,
         CAST(4 * mc.m * COALESCE(i.m_in, 0)
              - p.deg_sum * p.deg_sum AS BIGINT) AS contrib,
         mc.m
  FROM per_c p
  LEFT JOIN intra i USING (label)
  CROSS JOIN m_cte mc
)
SELECT label, n_nodes, m_in, deg_sum, contrib,
       CAST(FLOOR(1000000.0 * CAST(SUM(contrib) OVER () AS DOUBLE)
            / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)))
            AS BIGINT) AS q_ppm
FROM contribs
ORDER BY label
"""
    return {
        "multimodal_audio_biquad": f"""
SELECT media_id, n, sum_abs_y, max_abs_y, y_last, chk
FROM read_parquet('{gdir}/audio_biquad.parquet')
""",
        "community_modularity": modularity,
        "image_palette_mediancut": f"""
SELECT g.image_id, g.n_distinct, g.n_boxes, g.err, g.chk
FROM read_parquet('{gdir}/palette_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_template_match": f"""
SELECT g.image_id, g.n_pos, g.best_ssd, g.best_row, g.best_col,
       g.ssd_chk
FROM read_parquet('{gdir}/template_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "roads_simplify_vw": f"""
SELECT road_id, kind, n_in, n_kept, keep_mask, removed_a2
FROM read_parquet('{gdir}/vw_sf0.01.parquet')
""",
        "polyline_roundtrip_roads": f"""
WITH pts AS (
  SELECT r.road_id, r.kind,
         CAST(FLOOR(c.x * 100000 + 0.5) AS BIGINT) AS qx,
         CAST(FLOOR(c.y * 100000 + 0.5) AS BIGINT) AS qy
  FROM read_parquet('{roads}') r, UNNEST(r.coords) AS t(c)
),
per_road AS (
  SELECT r.road_id, r.kind,
         CAST(len(r.coords) AS BIGINT) AS n_pts,
         CAST(FLOOR(r.coords[len(r.coords)].x * 100000 + 0.5) AS BIGINT)
           - CAST(FLOOR(r.coords[1].x * 100000 + 0.5) AS BIGINT)
           AS drift_qx
  FROM read_parquet('{roads}') r
),
sums AS (
  SELECT road_id, CAST(SUM(qx) AS BIGINT) AS sum_qx,
         CAST(SUM(qy) AS BIGINT) AS sum_qy
  FROM pts GROUP BY road_id
)
SELECT p.kind,
       CAST(COUNT(*) AS BIGINT) AS n_roads,
       CAST(SUM(p.n_pts) AS BIGINT) AS total_pts,
       CAST(SUM(s.sum_qx) AS BIGINT) AS sum_qx,
       CAST(SUM(s.sum_qy) AS BIGINT) AS sum_qy,
       CAST(SUM(p.drift_qx) AS BIGINT) AS net_drift_qx
FROM per_road p JOIN sums s USING (road_id)
GROUP BY p.kind
ORDER BY p.kind
""",
        "image_haar_energy": f"""
SELECT g.image_id, g.n_px, g.e_ll2, g.e_h1, g.e_v1, g.e_d1,
       g.e_h2, g.e_v2, g.e_d2
FROM read_parquet('{gdir}/haar_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
        "image_seam_carve": f"""
SELECT g.image_id, g.seam_cost, g.top_col, g.bottom_col,
       g.sum_energy, g.chk
FROM read_parquet('{gdir}/seam_sf0.01.parquet') g
JOIN read_parquet('{img}') f USING (image_id)
WHERE f.image_id < 'img000000000500' AND f.fmt <> 'jpg'
""",
    }
