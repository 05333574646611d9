"""Spatial operators as DataFrame builders (SURVEY.md §2.2, §2.4).

Architecture (Spark-first, not a port of the reference's RDD flow):

* geocoding (blake2b image_id -> lon/lat) is the only Python step on
  the image hot path — one Arrow-vectorized pandas UDF;
* ALL cell math (C1 cover, C3 k-ring, Z-order packing) and ALL exact
  geometry (J4 point-segment distance, J2 ray-cast crossings) run as
  generated SQL expressions inside whole-stage codegen (sqlgen.py) —
  zero Python in joins/aggregations;
* joins are plain equi-joins on int64 ``cell_id`` so Catalyst/AQE pick
  broadcast vs shuffled-hash and split skewed cells.

Reference parity: C1 ≈ GeoTrellis ``MapKeyTransform.keysForGeometry``,
J1 ≈ the keyed RDD tile×roads join, J2 ≈ country ``covers(point)``
clip, J4 ≈ the 2 km proximity search (SURVEY.md §2; /root/reference is
empty so loci are the survey's recalled paths, not file:line).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .. import METERS_PER_DEG, WORLD_MIN, WORLD_SIZE
from .. import cells as C
from ..sqlgen import (
    apply_steps,
    grid_index_expr,
    point_cell_steps,
    point_seg_dist_steps,
)

_LONLAT_SCHEMA = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


@F.pandas_udf(_LONLAT_SCHEMA)
def lonlat_udf(image_id: pd.Series) -> pd.DataFrame:
    """Deterministic geocode: blake2b(image_id) -> lon/lat (FIXTURES.md §1).

    The one pandas UDF on the image hot path (crypto hash has no JVM
    twin we control); Arrow-batched, loop body is C (hashlib).
    """
    n = len(image_id)
    lon = np.empty(n, dtype=np.float64)
    lat = np.empty(n, dtype=np.float64)
    for j, s in enumerate(image_id):
        d = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
        a = int.from_bytes(d[:4], "big")
        b = int.from_bytes(d[4:], "big")
        lo = WORLD_MIN + WORLD_SIZE * a / 2**32
        la = WORLD_MIN + WORLD_SIZE * b / 2**32
        if s.endswith("7"):  # skew: dense urban cell (FIXTURES.md)
            lo = 2.5 + (a % 1000) * 1e-6
            la = 2.5 + (b % 1000) * 1e-6
        lon[j] = lo
        lat[j] = la
    return pd.DataFrame({"lon": lon, "lat": lat})


def with_geo(images: DataFrame) -> DataFrame:
    """Derive lon/lat + footprint quad from image_id (engine spec).

    half-size = 0.004° * (1 + (i % 5)/4) with i parsed from the id —
    JVM-side arithmetic; only the hash is Python.
    """
    df = images.withColumn("_ll", lonlat_udf("image_id"))
    df = df.select("*", F.col("_ll.lon").alias("lon"), F.col("_ll.lat").alias("lat")).drop("_ll")
    i = F.expr("CAST(SUBSTRING(image_id, 4) AS BIGINT)")
    half = (F.lit(0.004) * (F.lit(1.0) + (i % 5).cast("double") / F.lit(4.0))).alias("half")
    return (
        df.withColumn("half", half)
        .withColumn("fp_xmin", F.col("lon") - F.col("half"))
        .withColumn("fp_ymin", F.col("lat") - F.col("half"))
        .withColumn("fp_xmax", F.col("lon") + F.col("half"))
        .withColumn("fp_ymax", F.col("lat") + F.col("half"))
        .drop("half")
    )


def with_point_cell(df: DataFrame, level: int, px: str = "lon", py: str = "lat",
                    out: str = "cell_id", keep_idx: bool = False) -> DataFrame:
    """C1 (point case): add quadtree cell id — pure codegen, no Python.

    ``keep_idx=True`` keeps the integer grid indices ``{out}_ix`` /
    ``{out}_iy`` so downstream k-ring expansion can reuse them instead
    of bit-squeezing the packed id (which would re-inline the whole
    upstream expression per bit and overflow codegen's method limit).

    The packed id is wrapped in ``COALESCE(cell, -1)`` to make the
    column NON-NULLABLE: when a nullable cell id becomes an equi-join
    key, Catalyst infers an ``isnotnull`` filter and pushes it below
    the projection, re-inlining the whole morton chain (measured 33×
    slower on the interior-cell broadcast join).  Values are never
    null, so semantics (and oracle parity) are unchanged.
    """
    steps = point_cell_steps(px, py, level, out)
    df = apply_steps(df, steps)
    df = df.withColumn(out, F.coalesce(F.col(out), F.lit(-1)))
    return df if keep_idx else df.drop(*[n for n, _ in steps[:-1]])


def cover_bbox_cells(
    df: DataFrame,
    level: int,
    xmin: str,
    ymin: str,
    xmax: str,
    ymax: str,
    out: str = "cell_id",
) -> DataFrame:
    """C1 (bbox case): explode every cell intersecting the bbox.

    JVM-side: two ``sequence()`` explosions over grid index ranges,
    then Z-order pack — the keysForGeometry analogue for quads.
    """
    df = (
        df.withColumn("_ix0", F.expr(grid_index_expr(xmin, level)))
        .withColumn("_iy0", F.expr(grid_index_expr(ymin, level)))
        .withColumn("_ix1", F.expr(grid_index_expr(xmax, level)))
        .withColumn("_iy1", F.expr(grid_index_expr(ymax, level)))
        .withColumn("_cix", F.explode(F.expr("sequence(_ix0, _ix1)")))
        .withColumn("_ciy", F.explode(F.expr("sequence(_iy0, _iy1)")))
    )
    from ..sqlgen import pack_cell_expr

    # COALESCE → non-nullable join key (see with_point_cell)
    df = df.withColumn(
        out, F.coalesce(F.expr(pack_cell_expr("_cix", "_ciy", level)), F.lit(-1))
    )
    df = df.withColumnRenamed("_cix", f"{out}_ix").withColumnRenamed("_ciy", f"{out}_iy")
    return df.drop("_ix0", "_iy0", "_ix1", "_iy1")


def with_kring(df: DataFrame, level: int, k: int, cell: str = "cell_id",
               out: str = "ring_cell_id", idx_cols: tuple[str, str] | None = None) -> DataFrame:
    """C3: explode the (2k+1)² Chebyshev neighborhood of each cell.

    JVM-side; out-of-world neighbors are filtered.  Also emits
    ``k_ring`` = Chebyshev distance of each neighbor (used by J4's
    golden output).  Pass ``idx_cols=(ix, iy)`` when the producer kept
    the grid indices (with_point_cell/cover_bbox_cells do) — decoding
    them from the packed id works but re-inlines the upstream cell
    expression per bit after projection collapse.
    """
    from ..sqlgen import LEVEL_SHIFT, morton_squeeze_expr, pack_cell_expr

    n = 1 << level
    if idx_cols is not None:
        df = df.withColumn("_vx", F.col(idx_cols[0])).withColumn("_vy", F.col(idx_cols[1]))
    else:
        # decode ix, iy from the morton code (linear squeeze)
        df = df.withColumn("_code", F.expr(f"({cell} & {(1 << LEVEL_SHIFT) - 1})"))
        df = df.withColumn("_vx", F.expr(morton_squeeze_expr("_code", level, odd=False)))
        df = df.withColumn("_vy", F.expr(morton_squeeze_expr("_code", level, odd=True)))
        df = df.drop("_code")
    df = (
        df.withColumn("_dx", F.explode(F.expr(f"sequence({-k}, {k})")))
        .withColumn("_dy", F.explode(F.expr(f"sequence({-k}, {k})")))
        .withColumn("_nx", F.expr("_vx + _dx"))
        .withColumn("_ny", F.expr("_vy + _dy"))
        .filter(F.expr(f"_nx >= 0 AND _ny >= 0 AND _nx < {n} AND _ny < {n}"))
        .withColumn("k_ring", F.expr("GREATEST(ABS(_dx), ABS(_dy))").cast("int"))
    )
    # COALESCE → non-nullable join key (see with_point_cell)
    df = df.withColumn(
        out, F.coalesce(F.expr(pack_cell_expr("_nx", "_ny", level)), F.lit(-1))
    )
    return df.drop("_vx", "_vy", "_dx", "_dy", "_nx", "_ny")


def road_segments(roads: DataFrame) -> DataFrame:
    """Explode road polylines into segment rows (JVM-side transform).

    Output: road_id, kind, country_code, seg_id, ax, ay, bx, by.
    """
    segs = roads.withColumn(
        "_seg",
        F.explode(
            F.expr(
                "transform(slice(coords, 1, size(coords) - 1), "
                "(c, i) -> struct(i AS seg_id, c.x AS ax, c.y AS ay, "
                "coords[i + 1].x AS bx, coords[i + 1].y AS by))"
            )
        ),
    )
    return segs.select(
        "road_id",
        "country_code",
        "kind",
        F.col("_seg.seg_id").alias("seg_id"),
        F.col("_seg.ax").alias("ax"),
        F.col("_seg.ay").alias("ay"),
        F.col("_seg.bx").alias("bx"),
        F.col("_seg.by").alias("by"),
    )


def segments_with_cells(segs: DataFrame, level: int, k_expand: int = 0) -> DataFrame:
    """Cover each segment's bbox with cells at ``level`` (+ optional k-ring).

    The build side of J1/J4: exploded (cell_id, segment) rows.
    ``k_expand`` > 0 pre-expands the road side so the probe side can
    join on its single point cell (one shuffle, no probe-side blowup).
    """
    segs = (
        segs.withColumn("_xmin", F.expr("LEAST(ax, bx)"))
        .withColumn("_ymin", F.expr("LEAST(ay, by)"))
        .withColumn("_xmax", F.expr("GREATEST(ax, bx)"))
        .withColumn("_ymax", F.expr("GREATEST(ay, by)"))
    )
    covered = cover_bbox_cells(segs, level, "_xmin", "_ymin", "_xmax", "_ymax")
    covered = covered.drop("_xmin", "_ymin", "_xmax", "_ymax")
    if k_expand > 0:
        covered = with_kring(
            covered, level, k_expand, "cell_id", "ring_cell_id",
            idx_cols=("cell_id_ix", "cell_id_iy"),
        )
        covered = (
            covered.drop("cell_id", "k_ring", "cell_id_ix", "cell_id_iy")
            .withColumnRenamed("ring_cell_id", "cell_id")
            .dropDuplicates(["road_id", "seg_id", "cell_id"])
        )
    return covered


def compact_cover(dense_cells: DataFrame, level: int, cell: str = "cell_id") -> DataFrame:
    """C2 ★ distributed: minimal mixed-level cover of a dense single-level
    cell set (the DataFrame twin of cells.compact).

    Single-pass relational formulation — NO driver loop, no recursion:
    every cell emits its ``level+1`` ancestors (explode), an ancestor at
    level ℓ is FULL iff its descendant count equals 4^(level-ℓ), and the
    compacted cover is exactly the full nodes whose parent is not full.
    Two shuffles total (ancestor groupBy + parent anti-join), both on
    int64 keys — scales to any cover size.  Output: (cell, level)
    mixed-level rows.  Uses shiftleft/shiftright function forms (the
    ``>>`` operator fails to parse inside Spark function-call argument
    lists).
    """
    from ..sqlgen import LEVEL_SHIFT

    mask = (1 << LEVEL_SHIFT) - 1
    anc = dense_cells.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {level}), k -> "
                f"shiftleft(CAST({level} - k AS BIGINT), {LEVEL_SHIFT}) | "
                f"shiftright({cell} & {mask}, 2 * k))"
            )
        ).alias("anc")
    )
    cnt = anc.groupBy("anc").agg(F.count(F.lit(1)).alias("n"))
    lvl = f"CAST(shiftright(anc, {LEVEL_SHIFT}) AS INT)"
    full = cnt.filter(
        F.expr(f"n = shiftleft(CAST(1 AS BIGINT), 2 * ({level} - {lvl}))")
    ).select("anc")
    parent_of = F.expr(
        f"shiftleft(CAST({lvl} - 1 AS BIGINT), {LEVEL_SHIFT}) | "
        f"shiftright(anc & {mask}, 2)"
    )
    comp = full.withColumn("_p", parent_of).join(
        full.select(F.col("anc").alias("_p")), "_p", "left_anti"
    )
    return comp.select(
        F.col("anc").alias(cell),
        F.expr(f"CAST(shiftright(anc, {LEVEL_SHIFT}) AS INT)").alias("level"),
    )


def range_join_compacted(
    points_cells: DataFrame,
    cover: DataFrame,
    point_level: int,
    bin_level: int = 3,
    cell: str = "cell_id",
) -> DataFrame:
    """J6 ★: Z-order RANGE join of fine-level point cells against a
    compacted mixed-level cover — planned as a HASH equi-join, never a
    broadcast-nested-loop.

    A compacted cover cell at level ℓ owns the contiguous id range
    ``[code << 2(L-ℓ), (code+1) << 2(L-ℓ))`` of level-L descendants
    (cells.range_at_level; the Global-Range-Encoding trick, PAPERS.md).
    The naive formulation ``pts.join(cover, lo <= cell AND cell < hi)``
    has no equi-key, so Spark plans a BNLJ/cartesian — the measured
    degradation that kept J6 a documented fallback through r2.

    This version restores an equi-key by BINNING both sides at a coarse
    ``bin_level`` B:

    * probe (points): bin = ancestor code at B — exactly 1 bin/row, a
      pure shift of the already-computed cell id (no explode, no skew
      amplification on the fact table);
    * build (cover): a cell at level ℓ >= B maps to exactly 1 bin (its
      ancestor); a cell at ℓ < B explodes into its 4^(B-ℓ) descendant
      bins at B (bounded by 4^B total — the build side is the small,
      already-compacted one).

    The join is then ``ON probe.bin = build.bin AND lo <= cell < hi``:
    Catalyst hash-partitions (or broadcasts) on ``bin`` and evaluates
    the range predicate as the join residual.  Every point matches at
    most one cover cell (covers are disjoint by construction), so the
    result cardinality equals the contained-point count.  At 10^12
    rows the shape holds: one shuffle (or none, when the cover
    broadcasts) keyed on a coarse cell id, AQE skew-split applies, and
    ``bin_level`` trades build-side duplication (4^(B-ℓ) per coarse
    cell) against per-bin selectivity.

    Output: the point columns + ``cover_cell`` / ``cover_level``.
    """
    from ..sqlgen import LEVEL_SHIFT

    mask = (1 << LEVEL_SHIFT) - 1
    build = (
        cover.withColumn("_code", F.expr(f"({cell} & {mask})"))
        .withColumn(
            "_lo",
            F.expr(
                f"(CAST({point_level} AS BIGINT) << {LEVEL_SHIFT}) | "
                f"shiftleft(_code, 2 * ({point_level} - level))"
            ),
        )
        .withColumn(
            "_hi",
            F.expr(
                f"(CAST({point_level} AS BIGINT) << {LEVEL_SHIFT}) | "
                f"shiftleft(_code + 1, 2 * ({point_level} - level))"
            ),
        )
        .withColumn(
            "_bin_base",
            F.expr(
                f"CASE WHEN level >= {bin_level} "
                f"THEN shiftright(_code, 2 * (level - {bin_level})) "
                f"ELSE shiftleft(_code, 2 * ({bin_level} - level)) END"
            ),
        )
        .withColumn(
            "_n_bins",
            F.expr(
                f"CASE WHEN level >= {bin_level} THEN CAST(1 AS BIGINT) "
                f"ELSE shiftleft(CAST(1 AS BIGINT), 2 * ({bin_level} - level)) END"
            ),
        )
        .withColumn("_i", F.explode(F.expr("sequence(CAST(0 AS BIGINT), _n_bins - 1)")))
        # COALESCE → non-nullable equi-key (see with_point_cell)
        .withColumn("_bin", F.coalesce(F.expr("_bin_base + _i"), F.lit(-1)))
        .select(
            F.col(cell).alias("cover_cell"),
            F.col("level").alias("cover_level"),
            "_lo",
            "_hi",
            "_bin",
        )
    )
    probe = points_cells.withColumn(
        "_bin",
        F.coalesce(
            F.expr(
                f"shiftright({cell} & {mask}, 2 * ({point_level} - {bin_level}))"
            ),
            F.lit(-1),
        ),
    )
    joined = probe.join(
        build,
        (probe["_bin"] == build["_bin"])
        & (probe[cell] >= build["_lo"])
        & (probe[cell] < build["_hi"]),
        "inner",
    )
    return joined.drop("_bin", "_lo", "_hi")


def spatial_join(images_cells: DataFrame, road_cells: DataFrame) -> DataFrame:
    """J1 ★: the flagship tile×roads equi-join on cell_id.

    Plain shuffled-hash/broadcast equi-join — Catalyst + AQE decide;
    skewed urban cells are split by AQE (skew config in session.py).
    """
    return images_cells.join(road_cells, "cell_id", "inner")


def spatial_join_salted(
    points_cells: DataFrame,
    road_cells: DataFrame,
    target_rows_per_cell: int = 50_000,
    id_col: str = "image_id",
) -> DataFrame:
    """J1 ★ skew-hardened: the cell equi-join with EXPLICIT
    cell-frequency salting (A5 → skew.plan_salts), for when a dense
    urban cell exceeds what AQE's skew-split can rebalance (AQE splits
    oversized partitions of a shuffled join, but a broadcast/bucketed
    variant or a downstream per-cell cogroup sees the single hot KEY
    undivided).

    Shape (same as the proven minhash_lsh_pairs salting): a map-side
    histogram finds hot cells; the PROBE side (points — the big one)
    gets ``salt = pmod(xxhash64(id), n_salt(cell))`` and the BUILD side
    (road cover) EXPLODES over all n_salt values, so the join key
    becomes (cell_id, salt), every original pair matches exactly once,
    and a hot cell's work splits n_salt ways.  Cold cells keep salt 0 —
    no replication.  Result set is row-identical to spatial_join
    (pinned in tests).  Cost: one extra map-side-combined count agg
    over the probe side for the histogram.
    """
    from ..skew import cell_histogram, plan_salts, with_salt

    salts = plan_salts(cell_histogram(points_cells), target_rows_per_cell)
    # probe side: the shared salting helper (r03 review: this logic was
    # re-implemented here — pmod(xxhash64(id), n_salt), cold cells 0)
    probe = with_salt(points_cells, salts, id_col)
    # build side: EXPLODE over all n_salt values so every original pair
    # matches exactly once — the only part with_salt can't express
    build = (
        road_cells.join(
            F.broadcast(salts), road_cells.cell_id == salts["_salt_cell"], "left"
        )
        .drop("_salt_cell")
        .withColumn("n_salt", F.coalesce(F.col("n_salt"), F.lit(1)))
        .withColumn("salt", F.explode(F.expr("sequence(0, n_salt - 1)")))
        .withColumn("salt", F.col("salt").cast("int"))
        .drop("n_salt")
    )
    return probe.join(build, ["cell_id", "salt"], "inner").drop("salt")


def level_for_cutoff(cutoff_m: float) -> int:
    """Largest level whose cell size still >= cutoff (kring(1) exactness)."""
    cutoff_deg = cutoff_m / METERS_PER_DEG
    level = 0
    while (WORLD_SIZE / (1 << (level + 1))) >= cutoff_deg and level < C.MAX_LEVEL:
        level += 1
    return level


def knn_nearest_road(
    images_geo: DataFrame,
    segs: DataFrame,
    cutoff_m: float = 2000.0,
    level: int | None = None,
    id_col: str = "image_id",
) -> DataFrame:
    """J4 ★ + W1: nearest road within ``cutoff_m`` per image, exact.

    k-ring-expansion kNN, collapsed to ONE shuffle: at ``level`` the
    cell size is >= cutoff, so every segment within cutoff of a point
    lies in the point's 3×3 cell block (proof: |p-q|∞ <= |p-q|₂ <
    cellsize ⇒ q's cell is a Chebyshev-1 neighbor).  We pre-expand the
    *road* side by kring(1) (small side, exploded once) and join the
    image side on its single point cell — no probe-side row blowup.
    Exact point→segment distance + (dist, road_id) window tie-break.

    Emits: image_id, road_id, dist_m, k_ring (Chebyshev distance from
    the image's cell to the matched segment's covering cell).
    """
    if level is None:
        level = level_for_cutoff(cutoff_m)
    probe = with_point_cell(images_geo, level, "lon", "lat", "cell_id")
    build = segments_with_cells(segs, level, k_expand=0)
    build = with_kring(
        build, level, 1, "cell_id", "ring_cell_id",
        idx_cols=("cell_id_ix", "cell_id_iy"),
    )
    build = (
        build.select(
            F.col("ring_cell_id").alias("cell_id"),
            "road_id",
            "seg_id",
            "ax",
            "ay",
            "bx",
            "by",
            "k_ring",
        )
        # a segment can reach the same ring cell from several covering
        # cells — keep the MIN Chebyshev distance so k_ring is
        # deterministic (endpoints are constant per (road_id, seg_id))
        .groupBy("cell_id", "road_id", "seg_id")
        .agg(
            F.min("k_ring").alias("k_ring"),
            F.first("ax").alias("ax"),
            F.first("ay").alias("ay"),
            F.first("bx").alias("bx"),
            F.first("by").alias("by"),
        )
    )
    joined = probe.select(id_col, "lon", "lat", "cell_id").join(
        build, "cell_id", "inner"
    )
    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "by", "dist_m")
    joined = apply_steps(joined, steps).drop(*[n for n, _ in steps[:-1]])
    joined = joined.filter(F.col("dist_m") <= F.lit(float(cutoff_m)))
    # argmin via min(struct(...)): struct comparison is lexicographic, so
    # this reproduces the (dist, road_id, seg_id, k_ring) tie-break of a
    # row_number window — but with MAP-SIDE partial aggregation, so the
    # shuffle carries one pre-reduced row per (partition, point) instead
    # of sorting every candidate pair (the window variant was the
    # scaling bottleneck: ~60 candidates/point all crossed the exchange)
    best = joined.groupBy(id_col).agg(
        F.min(F.struct("dist_m", "road_id", "seg_id", "k_ring")).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.road_id").alias("road_id"),
        F.col("_b.dist_m").alias("dist_m"),
        F.col("_b.k_ring").cast("int").alias("k_ring"),
    )


def knn_topk_roads(
    images_geo: DataFrame,
    segs: DataFrame,
    cutoff_m: float = 2000.0,
    k: int = 3,
    level: int | None = None,
    id_col: str = "image_id",
) -> DataFrame:
    """J4b (r05): the k NEAREST roads per point within ``cutoff_m``,
    exact, deterministic tie-break (dist, road_id).

    Candidate completeness is the same 3×3-block proof as
    knn_nearest_road (cell size >= cutoff ⇒ every segment within cutoff
    of a point covers one of its Chebyshev-1 neighbor cells), so the
    top-k *roads* among the candidates are the true top-k within the
    cutoff — no ring iteration needed when a cutoff exists.

    Execution shape: candidate equi-join (no probe-side blowup) →
    per-(point, road) MIN over the road's segments (map-side-combined
    partial agg — a multi-segment road contributes its closest segment)
    → per-point rank window over the already-reduced (point, road)
    rows.  Two keyed exchanges, both over pre-reduced data, keys
    uniformly distributed; the window input per point is bounded by the
    road density inside the cutoff disc.  min(struct) can't express
    top-k>1, hence the window — but only AFTER the reduction, so the
    exchange never carries raw candidate pairs.

    Emits: id_col, road_id, dist_m, rnk (1-based, rnk <= k); points
    with fewer than k roads in range emit fewer rows.
    """
    if level is None:
        level = level_for_cutoff(cutoff_m)
    probe = with_point_cell(images_geo, level, "lon", "lat", "cell_id")
    build = segments_with_cells(segs, level, k_expand=0)
    build = with_kring(
        build, level, 1, "cell_id", "ring_cell_id",
        idx_cols=("cell_id_ix", "cell_id_iy"),
    )
    build = (
        build.select(
            F.col("ring_cell_id").alias("cell_id"),
            "road_id", "seg_id", "ax", "ay", "bx", "by",
        )
        # a segment reaches the same ring cell from several covering
        # cells; endpoints are functionally dependent on (road, seg)
        .dropDuplicates(["cell_id", "road_id", "seg_id"])
    )
    joined = probe.select(id_col, "lon", "lat", "cell_id").join(
        build, "cell_id", "inner"
    )
    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "by", "dist_m")
    joined = apply_steps(joined, steps).drop(*[n for n, _ in steps[:-1]])
    joined = joined.filter(F.col("dist_m") <= F.lit(float(cutoff_m)))
    per_road = joined.groupBy(id_col, "road_id").agg(
        F.min("dist_m").alias("dist_m")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("dist_m").asc(), F.col("road_id").asc()
    )
    return (
        per_road.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k))
    )


def snap_nearest_road(
    points_geo: DataFrame,
    segs: DataFrame,
    cutoff_m: float = 2000.0,
    level: int | None = None,
    id_col: str = "image_id",
) -> DataFrame:
    """MAP-MATCHING snap (J4c): nearest road segment per point WITH the
    linear-referencing payload — the clamped projection parameter t and
    the snapped on-segment coordinates — i.e. the operator a GPS-trace
    conflation pipeline runs after kNN.

    Same candidate construction and 3×3-block completeness proof as
    knn_nearest_road; the difference is the argmin struct carries the
    projection intermediates (t, endpoint, direction) so the snap is
    computed once, AFTER the reduction, from the winning segment only.
    t and the snapped coords quantize to micros with one FLOOR each
    (the double chain is shared text with the DuckDB oracle; every
    term already has a DOUBLE operand per CLAUDE.md gotcha 17).
    """
    if level is None:
        level = level_for_cutoff(cutoff_m)
    probe = with_point_cell(points_geo, level, "lon", "lat", "cell_id")
    build = segments_with_cells(segs, level, k_expand=0)
    build = with_kring(
        build, level, 1, "cell_id", "ring_cell_id",
        idx_cols=("cell_id_ix", "cell_id_iy"),
    )
    build = (
        build.select(
            F.col("ring_cell_id").alias("cell_id"),
            "road_id", "seg_id", "ax", "ay", "bx", "by",
        )
        .dropDuplicates(["cell_id", "road_id", "seg_id"])
    )
    joined = probe.select(id_col, "lon", "lat", "cell_id").join(
        build, "cell_id", "inner"
    )
    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "by", "dist_m")
    joined = apply_steps(joined, steps)
    joined = joined.filter(F.col("dist_m") <= F.lit(float(cutoff_m)))
    # argmin via min(struct): (dist, road, seg) is the deterministic
    # tie-break; the trailing fields are functionally dependent on
    # (road_id, seg_id) so they never influence the comparison
    best = joined.groupBy(id_col).agg(
        F.min(
            F.struct(
                "dist_m", "road_id", "seg_id", "dist_m_t",
                "ax", "ay", "dist_m_dx", "dist_m_dy",
            )
        ).alias("_b")
    )
    return best.selectExpr(
        id_col,
        "_b.road_id AS road_id",
        "_b.seg_id AS seg_id",
        "_b.dist_m AS dist_m",
        "CAST(FLOOR(_b.dist_m_t * 1000000.0) AS BIGINT) AS t_micros",
        "CAST(FLOOR((_b.ax + _b.dist_m_t * _b.dist_m_dx) * 1000000.0)"
        " AS BIGINT) AS snap_x_micro",
        "CAST(FLOOR((_b.ay + _b.dist_m_t * _b.dist_m_dy) * 1000000.0)"
        " AS BIGINT) AS snap_y_micro",
    )


def near_road_semi(
    points_geo: DataFrame,
    segs: DataFrame,
    cutoff_m: float,
    level: int | None = None,
    id_col: str = "image_id",
) -> DataFrame:
    """Shuffle-free 'within cutoff of any road' filter (J1+J4 existence
    form).

    LEFT SEMI broadcast hash join on the point's cell against the
    kring(1)-expanded segment cover, with the exact point→segment
    distance as an extra join predicate.  No shuffle touches the fact
    table — this is the flagship's scale path (a per-point argmin is
    only needed when the nearest road itself is asked for; see
    knn_nearest_road)."""
    from ..sqlgen import point_seg_dist_expr

    if level is None:
        level = level_for_cutoff(cutoff_m)
    probe = with_point_cell(points_geo, level, "lon", "lat", "cell_id")
    build = segments_with_cells(segs, level, k_expand=0)
    build = with_kring(
        build, level, 1, "cell_id", "ring_cell_id",
        idx_cols=("cell_id_ix", "cell_id_iy"),
    )
    build = (
        build.select(F.col("ring_cell_id").alias("rcell"), "ax", "ay", "bx", "by")
        .dropDuplicates(["rcell", "ax", "ay", "bx", "by"])
    )
    dist = point_seg_dist_expr("lon", "lat", "ax", "ay", "bx", "by")
    cond = (probe.cell_id == build.rcell) & (
        F.expr(dist) <= F.lit(float(cutoff_m))
    )
    return probe.join(F.broadcast(build), cond, "left_semi").drop("cell_id")


def pip_country_udf(rings: dict[str, np.ndarray]):
    """Arrow-batched exact ray-cast PIP: (lon, lat) -> country or NULL.

    Vectorized numpy even-odd crossing (geom.points_in_polygon) over
    all rings; identical IEEE arithmetic to the oracle's SQL crossing
    sum.  Used for the boundary-cell fallback in assign_countries — a
    literal CASE expression computes the same thing JVM-side but its
    generated code blew whole-stage codegen past the JIT method limit
    when fused with the EXISTS probe (measured 5-20× slowdowns of the
    WHOLE fused stage); the Arrow boundary keeps JVM stages small and
    the Python side is pure vectorized numpy (BASELINE.json:15)."""
    from ..geom import points_in_polygon

    items = list(rings.items())

    @F.pandas_udf("string")
    def _pip(lon: pd.Series, lat: pd.Series) -> pd.Series:
        px = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        py = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        out = np.full(len(px), None, dtype=object)
        # callers null-mask inputs for rows already decided JVM-side
        # (interior cells), so the vectorized ray-cast only runs on the
        # ~1% boundary rows — Catalyst extracts UDFs unconditionally,
        # masking is how you keep the Python work proportional
        undecided = ~np.isnan(px)
        for cc, ring in items:
            if not undecided.any():
                break
            inside = points_in_polygon(px[undecided], py[undecided], ring)
            idx = np.flatnonzero(undecided)[inside]
            out[idx] = cc
            undecided[idx] = False
        return pd.Series(out)

    return _pip


_VIEW_SEQ = [0]


def with_near_road_flag(
    points_geo: DataFrame,
    segs: DataFrame,
    cutoff_m: float,
    level: int | None = None,
    out: str = "near_road",
) -> DataFrame:
    """Map-side 'within cutoff of any road' boolean column.

    Expressed as a correlated SQL ``EXISTS`` so Catalyst plans a
    **BroadcastHashJoin ExistenceJoin** — one codegen'd hash probe per
    point with the exact point→segment distance as the extra join
    predicate, producing a boolean without dropping or duplicating
    rows.  (A higher-order ``exists()`` lambda over a per-cell array
    column computes the same thing but is evaluated interpreted —
    measured ~9× slower; a left-semi join computes the filter but loses
    the non-matching rows the flagship's n_points still needs.)"""
    from ..sqlgen import point_seg_dist_expr

    if level is None:
        level = level_for_cutoff(cutoff_m)
    spark = points_geo.sparkSession
    probe = with_point_cell(points_geo, level, "lon", "lat", "_ncell")
    build = segments_with_cells(segs, level, k_expand=0)
    build = with_kring(
        build, level, 1, "cell_id", "ring_cell_id",
        idx_cols=("cell_id_ix", "cell_id_iy"),
    )
    # duplicates (a segment reaching one ring cell via several cover
    # cells) cannot change EXISTS semantics — skipping the dedup saves
    # the build side's only shuffle
    build = build.select(
        F.col("ring_cell_id").alias("rcell"), "ax", "ay", "bx", "by"
    )
    _VIEW_SEQ[0] += 1
    pv = f"_nrf_probe_{id(points_geo)}_{_VIEW_SEQ[0]}"
    sv = f"_nrf_segs_{id(segs)}_{_VIEW_SEQ[0]}"
    probe.createOrReplaceTempView(pv)
    build.createOrReplaceTempView(sv)
    dist = point_seg_dist_expr("p.lon", "p.lat", "s.ax", "s.ay", "s.bx", "s.by")
    out_cols = ", ".join(f"p.{c}" for c in points_geo.columns)
    try:
        # spark.sql ANALYZES eagerly — the returned plan is bound, so the
        # views can be dropped immediately (they otherwise accumulate in
        # the session catalog for its whole lifetime)
        return spark.sql(
            f"SELECT {out_cols}, EXISTS(SELECT 1 FROM {sv} s WHERE s.rcell = p._ncell "
            f"AND {dist} <= CAST({float(cutoff_m)} AS DOUBLE)) AS {out} FROM {pv} p"
        )
    finally:
        spark.catalog.dropTempView(pv)
        spark.catalog.dropTempView(sv)


def prepare_bucketed_flag_tables(
    points_geo: DataFrame,
    segs: DataFrame,
    cutoff_m: float,
    points_table: str = "points_bucketed",
    cover_table: str = "cover_bucketed",
    level: int | None = None,
    n_buckets: int = 64,
) -> int:
    """Write both sides of the near-road join as bucketed tables
    (storage.write_bucketed_table) keyed by cell.

    One-time layout cost; afterwards with_near_road_flag_bucketed joins
    them with NO exchange and NO broadcast.  Returns the level used.
    """
    from ..storage import write_bucketed_table

    if level is None:
        level = level_for_cutoff(cutoff_m)
    probe = with_point_cell(points_geo, level, "lon", "lat", "cell_id")
    build = segments_with_cells(segs, level, k_expand=0)
    build = with_kring(
        build, level, 1, "cell_id", "ring_cell_id",
        idx_cols=("cell_id_ix", "cell_id_iy"),
    ).select(F.col("ring_cell_id").alias("cell_id"), "ax", "ay", "bx", "by")
    write_bucketed_table(probe, points_table, "cell_id", n_buckets)
    write_bucketed_table(build, cover_table, "cell_id", n_buckets)
    return level


def with_near_road_flag_bucketed(
    spark,
    cutoff_m: float,
    points_table: str = "points_bucketed",
    cover_table: str = "cover_bucketed",
    out: str = "near_road",
) -> DataFrame:
    """Scale path of with_near_road_flag: EXISTS over two tables
    bucketed on the cell key (prepare_bucketed_flag_tables).

    The whole-road-network broadcast of the default path cannot build
    at planet scale (~10⁸ segments × 9 ring cells); here BOTH sides are
    co-located by layout, so Catalyst plans a SortMergeJoin
    ExistenceJoin with NO Exchange on either side and no broadcast —
    pinned in tests/test_plans.py.  The fact table is read, probed and
    flagged without ever being shuffled."""
    from ..sqlgen import point_seg_dist_expr

    p = spark.table(points_table)
    dist = point_seg_dist_expr("p.lon", "p.lat", "s.ax", "s.ay", "s.bx", "s.by")
    out_cols = ", ".join(f"p.{c}" for c in p.columns if c != "cell_id")
    return spark.sql(
        f"SELECT {out_cols}, EXISTS(SELECT 1 FROM {cover_table} s "
        f"WHERE s.cell_id = p.cell_id "
        f"AND {dist} <= CAST({float(cutoff_m)} AS DOUBLE)) AS {out} "
        f"FROM {points_table} p"
    )


def knn_ring_iterative(
    points_geo: DataFrame,
    segs: DataFrame,
    level: int = 6,
    k_schedule: tuple[int, ...] = (1, 2, 4),
    id_col: str = "image_id",
) -> DataFrame:
    """J4 ★ unbounded form: literal k-ring-expansion kNN (no cutoff).

    Ring-by-ring driver loop (the north star's "k-ring-expansion kNN to
    nearest road geometry"): at each k the frontier's kring(k) cells
    equi-join the segment cover; a point SETTLES when its best exact
    distance ≤ k·cellsize — any unsearched segment lies in a cell at
    Chebyshev > k, hence at distance ≥ k·cellsize (proof in cells.py
    terms: the gap between a point's cell and a cell k+1 away spans k
    full cells).  Points still unsettled after the schedule fall back
    to one exact broadcast cross-join (the frontier is tiny by then) —
    bounded work, exact result, deterministic (dist, road_id, seg_id)
    tie-break.
    """
    cellsize_m = WORLD_SIZE / (1 << level) * METERS_PER_DEG
    build = segments_with_cells(segs, level, k_expand=0).select(
        F.col("cell_id").alias("rcell"), "road_id", "seg_id", "ax", "ay", "bx", "by"
    )
    steps = point_seg_dist_steps("lon", "lat", "ax", "ay", "bx", "by", "dist_m")
    frontier = with_point_cell(
        points_geo.select(id_col, "lon", "lat"), level, keep_idx=True
    )
    # Persist each ring's frontier: without it, ring k's left-anti chain
    # re-executes rings 1..k-1's joins against the full fact table (the
    # recompute grows quadratically in the schedule length).  Frontiers
    # stay persisted until the RESULT is materialized (the settled
    # parts' lineage references them — unpersisting mid-loop would
    # reintroduce the cascade), then all are dropped.  Frontier size is
    # monotonically shrinking, so peak cache ≈ the ring-1 frontier.
    from pyspark import StorageLevel

    frontier = frontier.persist(StorageLevel.DISK_ONLY)
    to_unpersist = [frontier]
    settled_parts: list[DataFrame] = []

    def _best(cands: DataFrame) -> DataFrame:
        d = apply_steps(cands, steps).drop(*[n for n, _ in steps[:-1]])
        return d.groupBy(id_col).agg(
            F.min(F.struct("dist_m", "road_id", "seg_id")).alias("_b"),
            F.first("lon").alias("lon"),
            F.first("lat").alias("lat"),
        )

    for k in k_schedule:
        ring_cells = with_kring(
            frontier, level, k, "cell_id", "ring_cell_id",
            idx_cols=("cell_id_ix", "cell_id_iy"),
        )
        cands = ring_cells.join(
            build, ring_cells.ring_cell_id == build.rcell, "inner"
        )
        best = _best(cands)
        # STRICT '<': at exact equality dist == k·cellsize an unexplored
        # segment at the same distance (with a smaller tie-break key) can
        # sit just outside the ring, so equality cases stay in the
        # frontier and resolve against the full candidate set later.
        done = best.filter(F.col("_b.dist_m") < F.lit(float(k) * cellsize_m))
        settled_parts.append(
            done.select(
                id_col,
                F.col("_b.road_id").alias("road_id"),
                F.col("_b.dist_m").alias("dist_m"),
                F.lit(int(k)).alias("k_settled"),
            )
        )
        nxt = frontier.join(done.select(id_col), id_col, "left_anti").persist(
            StorageLevel.DISK_ONLY
        )
        to_unpersist.append(nxt)
        empty = nxt.isEmpty()  # driver-side loop control (cheap: persisted)
        frontier = nxt
        if empty:
            frontier = None
            break

    if frontier is not None and not frontier.isEmpty():
        # exact fallback for the residual frontier (tiny): broadcast the
        # frontier (small side) against all segments
        cands = frontier.select(id_col, "lon", "lat").crossJoin(
            segs.select("road_id", "seg_id", "ax", "ay", "bx", "by")
        )
        best = _best(cands)
        settled_parts.append(
            best.select(
                id_col,
                F.col("_b.road_id").alias("road_id"),
                F.col("_b.dist_m").alias("dist_m"),
                F.lit(-1).alias("k_settled"),
            )
        )

    out = settled_parts[0]
    for part in settled_parts[1:]:
        out = out.unionByName(part)
    # materialize the result once, then release every cached frontier —
    # the returned frame no longer depends on them
    out = out.persist(StorageLevel.DISK_ONLY)
    out.count()
    for df in to_unpersist:
        df.unpersist()
    return out


ROAD_KINDS_ALL = [
    "motorway", "trunk", "primary", "secondary", "tertiary",
    "unclassified", "residential", "service", "track",
]
PAVED_SURFACES = ["asphalt", "concrete", "paving_stones", "paved"]
UNPAVED_SURFACES = ["dirt", "gravel", "sand", "unpaved"]
_ALL_SEASON_DEFAULT_KINDS = ["motorway", "trunk", "primary", "secondary"]


def filter_roads(roads: DataFrame) -> DataFrame:
    """F1: keep rows whose highway tag is a road kind (RoadTags filter)."""
    return roads.filter(F.expr("tags['highway']").isin(ROAD_KINDS_ALL))


def with_all_season(roads: DataFrame) -> DataFrame:
    """F2: the SDG 9.1.1 all-season predicate from the surface tag,
    with a road-class default when the surface is unknown."""
    surface = F.expr("tags['surface']")
    return roads.withColumn(
        "all_season",
        F.when(surface.isin(PAVED_SURFACES), F.lit(True))
        .when(surface.isin(UNPAVED_SURFACES), F.lit(False))
        .otherwise(F.col("kind").isin(_ALL_SEASON_DEFAULT_KINDS)),
    )


def forgotten_images(images_geo: DataFrame, nearest: DataFrame) -> DataFrame:
    """J5: images with NO road within cutoff — the 'forgotten' set."""
    return images_geo.join(nearest.select("image_id"), "image_id", "left_anti")


# ---------------------------------------------------------------------------
# J2 ★: compacted-cell candidates + exact ray-cast PIP country assignment
# ---------------------------------------------------------------------------


_CLASSIFY_CACHE: dict = {}
_DIMS_CACHE: dict = {}


def _rings_key(rings: dict[str, np.ndarray]) -> tuple:
    return tuple((cc, r.shape[0], float(r.sum())) for cc, r in sorted(rings.items()))


def _publish_dim_dir(tag: str, write_fn) -> str:
    """Atomically publish a small dim-table directory under a PER-USER
    unique path (ADVICE r02: the old fixed /tmp path + after-the-fact
    marker file let two concurrent sessions overwrite each other's
    parquet and pin the corrupted result forever, and was pre-seedable
    by other users).

    ``write_fn(tmp_dir)`` materializes the content into a fresh private
    temp dir; the dir is then published with one atomic ``os.rename``.
    If a concurrent session won the race (or the dir already exists),
    the freshly written copy is discarded and the committed one is used
    — both copies are deterministic functions of ``tag``'s inputs, so
    either is correct, but no reader can ever observe a half-written
    directory."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    base = _os.path.join(
        _tempfile.gettempdir(), f"sdg_dims_u{_os.getuid()}", tag
    )
    if _os.path.isdir(base):
        return base
    _os.makedirs(_os.path.dirname(base), exist_ok=True)
    tmp = _tempfile.mkdtemp(prefix=f"{tag}.tmp.", dir=_os.path.dirname(base))
    try:
        write_fn(tmp)
        _os.rename(tmp, base)  # atomic publish (same filesystem)
    except OSError:
        _shutil.rmtree(tmp, ignore_errors=True)  # lost the race — reuse winner
        if not _os.path.isdir(base):
            raise
    except Exception:
        # r03 review: a Spark write failure (Py4JJavaError/Analysis…)
        # is not an OSError — still remove the half-written private dir
        _shutil.rmtree(tmp, ignore_errors=True)
        raise
    return base


def _country_dims(spark, rings: dict[str, np.ndarray], level: int):
    """Cached tiny dimension DataFrames for J2 (per session + rings + level).

    The interior cover is built COMPACTED (C2 ★, cells.compact) and
    uncompacted back to ``level`` for the broadcast-hash join (see
    assign_countries for the trade-off).  Returns
    (interior_df[icell, country_code], boundary_df[bcell],
    edges_df[country_code, x0, y0, x1, y1])."""
    key = (spark.sparkContext.applicationId, _rings_key(rings), level)
    if key in _DIMS_CACHE:
        return _DIMS_CACHE[key]
    interior, boundary = _classify_country_cells(rings, level)
    int_rows: list[tuple[int, str]] = []
    for cc in rings:
        cc_cells = np.array([c for c, k in interior if k == cc], dtype=np.int64)
        if cc_cells.size:
            comp = C.compact(cc_cells)  # canonical compacted cover
            int_rows += [(int(c), cc) for c in C.uncompact(comp, level)]
    edge_rows = []
    for cc, ring in rings.items():
        for i in range(len(ring) - 1):
            edge_rows.append((cc, float(ring[i, 0]), float(ring[i, 1]),
                              float(ring[i + 1, 0]), float(ring[i + 1, 1])))
    # Materialize the dims as (tiny) parquet and read back: a
    # createDataFrame ExistingRDD re-runs a Python deserialization pass
    # inside EVERY broadcast build (~0.8 s serial per query execution —
    # measured); a parquet scan is JVM-only and OS-cached.  On a real
    # cluster these are Iceberg dim tables.  Published atomically via
    # _publish_dim_dir (per-user path + rename — no concurrent-session
    # corruption, no pre-seeding).
    import hashlib as _hl
    import os as _os

    import pandas as _pd

    tag = "dims_" + _hl.blake2b(repr((_rings_key(rings), level)).encode(),
                                digest_size=8).hexdigest()

    def _write(tmp: str) -> None:
        spark.createDataFrame(
            _pd.DataFrame(int_rows, columns=["icell", "country_code"]).astype(
                {"icell": "int64"}
            )
        ).coalesce(1).write.mode("overwrite").parquet(_os.path.join(tmp, "interior"))
        spark.createDataFrame(
            _pd.DataFrame({"bcell": _pd.array([int(b) for b in boundary],
                                              dtype="int64")})
        ).coalesce(1).write.mode("overwrite").parquet(_os.path.join(tmp, "boundary"))
        spark.createDataFrame(
            _pd.DataFrame(edge_rows,
                          columns=["country_code", "x0", "y0", "x1", "y1"])
        ).coalesce(1).write.mode("overwrite").parquet(_os.path.join(tmp, "edges"))

    base = _publish_dim_dir(tag, _write)
    interior_df = spark.read.parquet(_os.path.join(base, "interior"))
    boundary_df = spark.read.parquet(_os.path.join(base, "boundary"))
    edges_df = spark.read.parquet(_os.path.join(base, "edges"))
    result = (interior_df, boundary_df, edges_df)
    _DIMS_CACHE[key] = result
    return result


def _classify_country_cells(rings: dict[str, np.ndarray], level: int):
    """Driver-side (tiny) numpy prestage: classify grid cells at ``level``
    as interior to exactly one country or boundary.

    Returns (interior_records, boundary_cells):
      interior: (cell_id, country_code) — assignment needs no PIP
      boundary: (cell_id,) — exact ray-cast required
    Interior test: no ring edge's bbox-clipped segment intersects the
    cell rect AND the cell center is inside the ring (then the whole
    cell is, by Jordan).  Fully vectorized (cells × edges broadcast) —
    a per-cell Python loop here dominated flagship wall time.
    """
    key = (_rings_key(rings), level)
    if key in _CLASSIFY_CACHE:
        return _CLASSIFY_CACHE[key]
    interior: list[tuple[int, str]] = []
    boundary: set[int] = set()
    for cc, ring in rings.items():
        _row, cids = C.cover_bbox(
            np.array([ring[:, 0].min()]), np.array([ring[:, 1].min()]),
            np.array([ring[:, 0].max()]), np.array([ring[:, 1].max()]), level,
        )
        crosses, ctr_in = _ring_cell_test(cids, level, ring)
        boundary.update(int(c) for c in cids[crosses])
        for c in cids[~crosses][ctr_in]:
            interior.append((int(c), cc))
    result = ([(c, cc) for c, cc in interior if c not in boundary], sorted(boundary))
    _CLASSIFY_CACHE[key] = result
    return result


def _ring_cell_test(cids: np.ndarray, level: int, ring: np.ndarray):
    """Vectorized per-ring cell test: (crosses, center_inside_of_noncrossing).

    ``crosses[i]``: some ring edge intersects cell i's rect (Liang-Barsky
    accept, cells × edges broadcast).  ``center_inside``: for the cells
    with no crossing edge, whether the cell CENTER is inside the ring —
    by Jordan, then the whole cell is."""
    from ..geom import points_in_polygon

    size = WORLD_SIZE / (1 << level)
    _lvl, ix, iy = C.unpack(cids)
    x0 = WORLD_MIN + ix * size  # (ncell,)
    y0 = WORLD_MIN + iy * size
    x1 = x0 + size
    y1 = y0 + size
    # r06: loop over the FEW edges with (ncell,) vectors instead of one
    # (ncell × nedge) broadcast — the p coefficients (±dx, ±dy) depend
    # only on the edge, so they are scalars per iteration and the big
    # where()-masked temporaries (~20 × ncell·nedge doubles at the
    # strip-refinement level: 800k cells × 10 edges) disappear.  Same
    # elementwise IEEE arithmetic ⇒ bit-identical classification
    # (pinned by tests/test_spatial.py's brute-force twins).  Measured
    # 4.5 s → 0.5 s for the level-9→12 strip prestage on the r06 host.
    n = len(cids)
    crosses = np.zeros(n, dtype=bool)
    for e in range(len(ring) - 1):
        ax, ay = float(ring[e, 0]), float(ring[e, 1])
        bx, by = float(ring[e + 1, 0]), float(ring[e + 1, 1])
        dx = bx - ax
        dy = by - ay
        t0 = np.zeros(n)
        t1 = np.ones(n)
        ok = np.ones(n, dtype=bool)
        for p, q in ((-dx, ax - x0), (dx, x1 - ax),
                     (-dy, ay - y0), (dy, y1 - ay)):
            if p == 0.0:
                ok &= ~(q < 0.0)
            elif p < 0.0:
                np.maximum(t0, q / p, out=t0)
            else:
                np.minimum(t1, q / p, out=t1)
        crosses |= ok & (t0 <= t1)
    ctr_in = points_in_polygon(
        (x0 + size / 2)[~crosses], (y0 + size / 2)[~crosses], ring
    )
    return crosses, ctr_in


def _strip_rows(rings: dict[str, np.ndarray], level: int, hi: int):
    """Cached numpy prestage for the strip dim: children (at ``hi``) of
    the level-``level`` boundary cells, classified
    interior-to-one-country (cc) or still-boundary (None)."""
    key = (_rings_key(rings), level, hi, "striprows")
    if key in _CLASSIFY_CACHE:
        return _CLASSIFY_CACHE[key]
    _interior, boundary = _classify_country_cells(rings, level)
    bnd = np.asarray(sorted(boundary), dtype=np.int64)
    kids = bnd
    for _ in range(hi - level):
        kids = C.children(kids).reshape(-1)
    interior: list[tuple[int, str]] = []
    bset: set[int] = set()
    for cc, ring in rings.items():
        crosses, ctr_in = _ring_cell_test(kids, hi, ring)
        bset.update(int(c) for c in kids[crosses])
        for c in kids[~crosses][ctr_in]:
            interior.append((int(c), cc))
    rows = [(c, cc) for c, cc in interior if c not in bset]
    rows += [(b, None) for b in sorted(bset)]
    _CLASSIFY_CACHE[key] = rows
    return rows


def boundary_fraction(rings: dict[str, np.ndarray], level: int, hi: int) -> float:
    """World-area fraction still needing the exact ray-cast after the
    strip refinement at ``hi`` — the driver-side bound that picks
    assign_countries' stage-2 strategy (no Spark job: the classify/strip
    numpy prestages are already cached)."""
    if hi > level:
        n_undecided = sum(1 for _, cc in _strip_rows(rings, level, hi) if cc is None)
    else:
        _interior, boundary = _classify_country_cells(rings, level)
        n_undecided = len(boundary)
    return n_undecided / float((1 << hi) ** 2)


def _estimate_rows(df: DataFrame) -> int | None:
    """Cheap driver-side row estimate from Catalyst plan statistics
    (rowCount when the CBO has one, else sizeInBytes / 64 — a
    deliberately LOW bytes-per-row guess so wide tables overestimate
    rows and flip to the safe strategy early).  ``None`` when the stats
    are unavailable — callers MUST treat None as "unbounded" and pick
    their scale-safe strategy (ADVICE r03: returning 0 here silently
    selected the broadcast-back path, the exact direction the auto mode
    exists to prevent)."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        if stats.rowCount().isDefined():
            return int(str(stats.rowCount().get()))
        return int(str(stats.sizeInBytes())) // 64
    except Exception:  # noqa: BLE001 — stats are advisory
        import warnings

        warnings.warn(
            "plan-stats row estimate unavailable; auto strategy falls "
            "back to the scale-safe path", stacklevel=2,
        )
        return None


def _strip_dim(spark, rings: dict[str, np.ndarray], level: int, hi: int):
    """Refinement dim over the boundary STRIP (see _strip_rows).

    Returned DataFrame: (scell bigint, s_cc string) — ``s_cc`` NULL means
    still boundary at ``hi`` (needs exact ray-cast).  Cells of the strip
    that are outside every ring are OMITTED (Jordan: center outside + no
    crossing edge ⇒ whole cell outside), so a probe miss after the
    level-``level`` boundary match means "in no country".
    """
    key = (spark.sparkContext.applicationId, _rings_key(rings), level, hi, "strip")
    if key in _DIMS_CACHE:
        return _DIMS_CACHE[key]
    rows = _strip_rows(rings, level, hi)

    import hashlib as _hl
    import os as _os

    import pandas as _pd

    tag = "strip_" + _hl.blake2b(
        repr((_rings_key(rings), level, hi, "strip")).encode(), digest_size=8
    ).hexdigest()

    def _write(tmp: str) -> None:
        pdf = _pd.DataFrame(rows, columns=["scell", "s_cc"])
        pdf["scell"] = pdf["scell"].astype("int64")
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(tmp, "strip")
        )

    base = _publish_dim_dir(tag, _write)
    df = spark.read.parquet(_os.path.join(base, "strip"))
    _DIMS_CACHE[key] = df
    return df


def assign_countries(
    images_geo: DataFrame,
    rings: dict[str, np.ndarray],
    level: int = 7,
    id_col: str = "image_id",
    use_udf: bool | None = None,
    broadcast_back_max_rows: int = 4_000_000,
    case_min_rows: int = 2_000_000,
) -> DataFrame:
    """J2 ★: two-stage country assignment (SURVEY.md §2.4).

    Stage 1 — cell-candidate generation (C2): a driver-side numpy
    prestage classifies level-``level`` cells as interior to one
    country (built compacted via cells.compact, uncompacted for the
    broadcast-hash join — see _country_dims) or boundary.  One
    broadcast join tags each point with its interior country or NULL.
    Stage 2 — exact ray-casting PIP fills the NULLs; COALESCE keeps it
    a single-pass plan with no union (a union-of-branches variant
    re-planned and recomputed the upstream DAG per branch).

    Stage 2 default is the JVM ``pip_country_case_expr`` — the SAME
    expression text the DuckDB oracle runs (parity by construction) —
    evaluated in ITS OWN tiny stage: boundary-cell rows (~1%) are
    projected to (id, lon, lat), repartitioned (the exchange is a
    codegen-stage break), ray-cast there, and the (id, country) result
    is BROADCAST back onto the main stream.  Isolation is load-bearing:
    inlining the multi-ring CASE into the fused probe stage pushed the
    generated method past the JIT's huge-method limit and deoptimized
    the WHOLE stage to interpreted bytecode (measured 12× on all rows,
    not just boundary ones).  The upstream is computed twice (once for
    the main stream, once column-pruned to id+lon+lat for the boundary
    branch) — the second pass prunes to 3 columns so payload bytes are
    never re-read.  ``use_udf=True`` selects the Arrow-batched numpy
    ray-cast instead (single-pass; used when ring/edge count would make
    the literal CASE unreasonable, or when the boundary fraction is too
    large to broadcast back).  Requires ``id_col`` values to be unique.

    ``use_udf=None`` (default) AUTO-SELECTS stage 2 (VERDICT r02 #1:
    the JVM path broadcasts a fact-derived (id, country) set back onto
    the stream — perfect while the boundary row count is small, but at
    10^12 rows even a 0.15% boundary fraction is 1.5e9 rows, which
    cannot broadcast): expected boundary rows are bounded DRIVER-SIDE
    with no extra Spark job, as the plan-stats row estimate × the
    cached still-boundary area fraction (boundary_fraction); above
    ``broadcast_back_max_rows`` the single-pass Arrow ray-cast runs
    instead — mirroring burn_cost_summaries' auto strategy.  The bound
    assumes ~uniform point density; a caller with known extreme skew
    INTO the boundary strip should pass use_udf=True explicitly.

    Output: input columns + country_code.
    """
    spark = images_geo.sparkSession
    if use_udf is None:
        hi_auto = level + min(3, C.MAX_LEVEL - level)
        n_rows = _estimate_rows(images_geo)
        if n_rows is None:
            use_udf = True  # unbounded ⇒ the scale-safe Arrow ray-cast
        else:
            est = n_rows * boundary_fraction(rings, level, hi_auto)
            # r06 LOWER bound: the literal-CASE stage pays a fixed
            # multi-second driver-side janino compile of the multi-ring
            # expression (re-paid whenever the 100-entry codegen cache
            # has evicted it — i.e. on every fresh plan in a busy
            # session).  Below ~2M input rows that fixed cost cannot
            # amortize and the Arrow ray-cast (identical decisions,
            # certified by the same oracles) is strictly cheaper;
            # above it the compiled CASE wins per-row.  The row guess
            # for THIS bound comes from a payload-free projection
            # (id + lon + lat): _estimate_rows deliberately inflates
            # byte-heavy tables for the UPPER bound's safety, but an
            # image table's blob column must not make a 10k-row input
            # look like millions here.  Measured: image_zonal_stats
            # first-plan 7.3 s → 2.4 s, no steady-state regression.
            if est > broadcast_back_max_rows:
                use_udf = True  # broadcast-back can't hold the boundary set
            else:
                # lazy: each _estimate_rows call runs a full Catalyst
                # optimization pass driver-side (~0.3-0.5 s on the r06
                # host for the join-blown scaled plan) — only pay for
                # the lower-bound probe when the upper bound didn't
                # already decide.
                n_rows_l = _estimate_rows(
                    images_geo.select(id_col, "lon", "lat")
                )
                use_udf = n_rows_l is not None and n_rows_l < case_min_rows
    interior_df, boundary_df, edges_df = _country_dims(spark, rings, level)

    in_cols = list(images_geo.columns)
    cells_df = interior_df.unionByName(
        boundary_df.select(F.col("bcell").alias("icell"),
                           F.lit(None).cast("string").alias("country_code"))
    ).withColumnRenamed("country_code", "_int_cc")
    if use_udf:
        pts = with_point_cell(images_geo, level, "lon", "lat", "cell_lvl",
                              keep_idx=True)
        joined = pts.join(
            F.broadcast(cells_df), pts.cell_lvl == cells_df.icell, "inner"
        )
        pip = pip_country_udf(rings)
        masked_lon = F.when(F.col("_int_cc").isNull(), F.col("lon"))
        masked_lat = F.when(F.col("_int_cc").isNull(), F.col("lat"))
        out = joined.withColumn(
            "country_code", F.coalesce(F.col("_int_cc"), pip(masked_lon, masked_lat))
        )
        return (
            out.filter(F.col("country_code").isNotNull())
            .select(*in_cols, "country_code")
        )
    from ..sqlgen import pack_cell_expr, pip_country_case_expr

    # Grid indices are computed ONCE at the refinement level ``hi``; the
    # level-``level`` key is derived by shifting them (one FLOOR chain in
    # the generated code instead of two).
    refine = min(3, C.MAX_LEVEL - level)
    hi = level + refine
    pts = with_point_cell(images_geo, hi, "lon", "lat", "cell_hi", keep_idx=True)
    pts = pts.withColumn(
        "cell_lvl",
        F.coalesce(
            F.expr(pack_cell_expr(f"(cell_hi_ix >> {refine})",
                                  f"(cell_hi_iy >> {refine})", level)),
            F.lit(-1),
        ),
    )
    joined = pts.join(F.broadcast(cells_df), pts.cell_lvl == cells_df.icell, "inner")
    if refine > 0:
        # refinement join: decides ~(1 - 2^-refine) of the boundary-cell
        # rows JVM-side, shrinking the ray-cast branch (and its serial
        # broadcast-back collect) by the same factor
        strip = _strip_dim(spark, rings, level, hi).withColumn("_s_hit", F.lit(1))
        joined = joined.join(
            F.broadcast(strip), joined.cell_hi == strip.scell, "left"
        )
        undecided = (
            F.col("_int_cc").isNull()
            & F.col("_s_hit").isNotNull()
            & F.col("s_cc").isNull()
        )
        decided = F.coalesce(F.col("_int_cc"), F.col("s_cc"))
    else:
        undecided = F.col("_int_cc").isNull()
        decided = F.col("_int_cc")

    pip_case = F.expr(pip_country_case_expr(rings, "lon", "lat"))
    bnd = (
        joined.filter(undecided)
        .select(id_col, "lon", "lat")
        # exchange = codegen-stage break: the giant CASE must not fuse
        # into (and deoptimize) the probe stage — see docstring.  NOTE:
        # no isNotNull filter on _bnd_cc here — a filter on the CASE
        # alias is rewritten and pushed THROUGH the exchange into the
        # fact stream (measured 20×); unmatched rows are dropped by the
        # final country_code filter instead.
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("_bnd_cc", pip_case)
        .select(id_col, "_bnd_cc")
    )
    out = joined.join(F.broadcast(bnd), id_col, "left")
    out = out.withColumn("country_code", F.coalesce(decided, F.col("_bnd_cc")))
    return (
        out.filter(F.col("country_code").isNotNull())
        .select(*in_cols, "country_code")
    )
