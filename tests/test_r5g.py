"""INDEPENDENT invariant gates for the wave-34 API-surface operators."""

import pandas as pd

SF = "/root/testdata/sf0.001"


def _pdf(df) -> pd.DataFrame:
    return df.toPandas()


def test_sql_udf_matches_inline_expression(spark):
    from pyspark.sql import functions as F

    from sdg_engine.queries_r5g import sql_udf_revenue

    out = _pdf(sql_udf_revenue(spark, SF)).set_index("flag")
    li = spark.read.parquet(SF + "/lineitem.parquet")
    want = _pdf(
        li.groupBy(F.col("l_returnflag").alias("flag")).agg(
            F.sum(
                F.expr(
                    "CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)"
                    " * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)"
                )
            ).alias("revenue_cents")
        )
    ).set_index("flag")
    for flag in want.index:
        assert out.loc[flag, "revenue_cents"] == want.loc[flag, "revenue_cents"]


def test_session_variable_is_live_after_builder(spark):
    from sdg_engine.queries_r5g import session_variable_segments

    session_variable_segments(spark, SF).collect()
    # the threshold variable holds the computed mean balance
    got = spark.sql("SELECT sv_min_bal AS v").collect()[0].v
    bal = pd.read_parquet(SF + "/customer.parquet", columns=["c_acctbal"])
    assert abs(got - float(bal["c_acctbal"].mean())) < 1e-9


def test_arrow_doc_stats_independent_of_batch_size(spark):
    from sdg_engine.queries_r5g import arrow_doc_stats

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    base = _pdf(arrow_doc_stats(spark, SF)).sort_values("lang")
    try:
        spark.conf.set(key, "7")
        tiny = _pdf(arrow_doc_stats(spark, SF)).sort_values("lang")
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), tiny.reset_index(drop=True)
    )
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["lang", "text"])
    # scalar twin on one lang: bytes and whitespace tokens
    g = docs[docs["lang"] == base["lang"].iloc[0]]
    assert int(base["total_bytes"].iloc[0]) == int(
        g["text"].str.encode("utf-8").str.len().sum()
    )
    assert int(base["total_tokens"].iloc[0]) == int(
        g["text"].str.split().str.len().sum()
    )


def test_grouped_agg_median_matches_scalar(spark):
    from sdg_engine.queries_r5g import grouped_agg_user_median

    out = _pdf(grouped_agg_user_median(spark, SF)).set_index("event_type")
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["event_type", "user_id", "value"])
    ev["cents"] = (ev["value"] * 100 + 0.5).apply(int)
    for et, g in ev.groupby("event_type"):
        meds = g.groupby("user_id")["cents"].apply(
            lambda s: int(s.sort_values().iloc[(len(s) + 1) // 2 - 1])
        )
        assert int(out.loc[et, "n_users"]) == meds.size
        assert int(out.loc[et, "sum_medians"]) == int(meds.sum())
        assert int(out.loc[et, "max_median"]) == int(meds.max())
        assert int(out.loc[et, "n_events"]) == len(g)
