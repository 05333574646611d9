"""Skew handling: cell-frequency histogram + salting planner
(SURVEY.md §2.5 A5, §4; north star: "cell-frequency salting,
range-partitioned shuffles, AQE skew-split").

Three layers, used together:
1. AQE skew-join split — config, session.py (free);
2. ``repartitionByRange`` on cell_id for range-local shuffles — the
   Z-order key makes ranges spatially coherent;
3. explicit SALTING for grouped/cogrouped per-cell work (where AQE
   can't split a single group): a driver-side histogram finds hot
   cells (the dense-urban fixture cell), and the group key becomes
   (cell_id, salt) with ``salt = pmod(xxhash64(id), s(cell))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(df: DataFrame, cell_col: str = "cell_id") -> DataFrame:
    """A5: per-cell row counts (drives the salting plan)."""
    return df.groupBy(cell_col).agg(F.count(F.lit(1)).alias("n_rows"))


def plan_salts(
    hist: DataFrame, target_rows_per_group: int, cell_col: str = "cell_id"
) -> DataFrame:
    """Salt factor per hot cell: ceil(n_rows / target); 1 elsewhere.

    Only cells above target are returned (the salt dimension stays a
    tiny broadcast)."""
    return (
        hist.filter(F.col("n_rows") > target_rows_per_group)
        .select(
            F.col(cell_col).alias("_salt_cell"),
            F.ceil(F.col("n_rows") / target_rows_per_group).cast("int").alias("n_salt"),
        )
    )


def with_salt(
    df: DataFrame,
    salts: DataFrame,
    id_col: str,
    cell_col: str = "cell_id",
    out: str = "salt",
) -> DataFrame:
    """Add deterministic salt: pmod(xxhash64(id), s(cell)) (0 if cold).

    Group/cogroup on (cell_col, salt) afterwards; the build/static side
    of a join must be EXPANDED to all salt values (explode) — see
    salted_group_demo in tests for the pattern."""
    joined = df.join(
        F.broadcast(salts), df[cell_col] == salts["_salt_cell"], "left"
    ).drop("_salt_cell")
    return joined.withColumn(
        out,
        F.when(
            F.col("n_salt").isNotNull(),
            F.pmod(F.xxhash64(F.col(id_col)), F.col("n_salt")).cast("int"),
        ).otherwise(F.lit(0)),
    ).drop("n_salt")


def repartition_by_cell_range(df: DataFrame, n: int, cell_col: str = "cell_id") -> DataFrame:
    """Range-partitioned shuffle on the Z-order cell key — spatially
    coherent partitions (neighbors land together), the layout the
    images table would be written with on Iceberg (SURVEY.md §4)."""
    return df.repartitionByRange(n, F.col(cell_col))
