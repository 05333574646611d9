"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in sdg_engine/ (queries.py / oracles.py);
SURVEY.md §2 maps each entry to a reference operator.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the RAI pipeline —
    derived points → kNN nearest road (cell-pruned, exact) → two-stage
    PIP country assignment → per-country aggregate (SURVEY.md M1)."""
    from sdg_engine.queries import flagship_rai

    return flagship_rai(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from sdg_engine.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (sdg_engine/oracles.py).

    61/64 queries have a SQL twin (r03 added mvt_tile_stats,
    image_decode_stats, image_near_dup_pairs and image_thumbnails —
    these run DuckDB directly over the image-fixture parquet plus
    committed independent-numpy goldens — and spatial_range_join,
    embedding_cosine_neardup, kmeans_embeddings, sample_stratified,
    streaming_dedup_docs, streaming_interval_join, all oracle-checked).
    The remaining three (image_rai_summary, multimodal audio/video)
    decode binary payloads with no relational twin; each is pinned by
    bit-exact numpy oracles in tests/ instead.
    """
    from sdg_engine.oracles import all_oracles

    return all_oracles()
