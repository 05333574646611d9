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
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .. import METERS_PER_DEG, WORLD_MIN, WORLD_SIZE
from .. import cells as C
from ..sqlgen import (
    apply_steps,
    grid_index_expr,
    pip_crossing_expr,
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
    """
    steps = point_cell_steps(px, py, level, out)
    df = apply_steps(df, steps)
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

    df = df.withColumn(out, F.expr(pack_cell_expr("_cix", "_ciy", level)))
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
    df = df.withColumn(out, F.expr(pack_cell_expr("_nx", "_ny", level)))
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


def spatial_join(images_cells: DataFrame, road_cells: DataFrame) -> DataFrame:
    """J1 ★: the flagship tile×roads equi-join on cell_id.

    Plain shuffled-hash/broadcast equi-join — Catalyst + AQE decide;
    skewed urban cells are split by AQE (skew config in session.py).
    """
    return images_cells.join(road_cells, "cell_id", "inner")


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
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("dist_m").asc(), F.col("road_id").asc(), F.col("seg_id").asc(),
        F.col("k_ring").asc(),
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "road_id", "dist_m", F.col("k_ring").cast("int").alias("k_ring"))
    )


def forgotten_images(images_geo: DataFrame, nearest: DataFrame) -> DataFrame:
    """J5: images with NO road within cutoff — the 'forgotten' set."""
    return images_geo.join(nearest.select("image_id"), "image_id", "left_anti")


# ---------------------------------------------------------------------------
# J2 ★: compacted-cell candidates + exact ray-cast PIP country assignment
# ---------------------------------------------------------------------------


def _classify_country_cells(rings: dict[str, np.ndarray], level: int):
    """Driver-side (tiny) numpy prestage: classify grid cells at ``level``
    as interior to exactly one country or boundary.

    Returns (interior_records, boundary_records):
      interior: (cell_id, country_code) — assignment needs no PIP
      boundary: (cell_id,) — exact ray-cast required
    Interior test: no ring edge intersects the cell rect AND the cell
    center is inside the ring (then the whole cell is, by Jordan).
    """
    from ..geom import clip_segments_to_rect, points_in_polygon

    n = 1 << level
    interior: list[tuple[int, str]] = []
    boundary: set[int] = set()
    size = WORLD_SIZE / n
    # candidate cells per country: bbox cover
    for cc, ring in rings.items():
        xmin, ymin = ring[:, 0].min(), ring[:, 1].min()
        xmax, ymax = ring[:, 0].max(), ring[:, 1].max()
        row, cids = C.cover_bbox(
            np.array([xmin]), np.array([ymin]), np.array([xmax]), np.array([ymax]), level
        )
        lvl, ix, iy = C.unpack(cids)
        cxmin = WORLD_MIN + ix * size
        cymin = WORLD_MIN + iy * size
        ax, ay = ring[:-1, 0], ring[:-1, 1]
        bx, by = ring[1:, 0], ring[1:, 1]
        for j in range(len(cids)):
            keep, *_ = clip_segments_to_rect(
                ax, ay, bx, by, cxmin[j], cymin[j], cxmin[j] + size, cymin[j] + size
            )
            if keep.any():
                boundary.add(int(cids[j]))
            else:
                ctr_in = points_in_polygon(
                    np.array([cxmin[j] + size / 2]), np.array([cymin[j] + size / 2]), ring
                )[0]
                if ctr_in:
                    interior.append((int(cids[j]), cc))
    interior = [(c, cc) for c, cc in interior if c not in boundary]
    return interior, sorted(boundary)


def assign_countries(
    images_geo: DataFrame,
    rings: dict[str, np.ndarray],
    level: int = 7,
    id_col: str = "image_id",
) -> DataFrame:
    """J2 ★: two-stage country assignment (SURVEY.md §2.4).

    Stage 1 — compacted-cell candidate generation (C2): a driver-side
    numpy prestage classifies level-``level`` cells as interior
    (assignable by broadcast equi-join, compacted to mixed levels) or
    boundary.  Stage 2 — only boundary-cell images run the exact
    ray-casting PIP, as a broadcast edge explosion + crossing-count
    aggregation (pure codegen, sqlgen.pip_crossing_expr).

    Output: image_id, country_code (+ passthrough lon/lat).
    """
    spark = images_geo.sparkSession
    interior, boundary = _classify_country_cells(rings, level)

    # --- compact the interior covers per country (C2 ★) ---
    int_rows = []
    for cc in rings:
        cc_cells = np.array([c for c, k in interior if k == cc], dtype=np.int64)
        if cc_cells.size == 0:
            continue
        for comp in C.compact(cc_cells):
            lvl = int(C.level_of(np.array([comp]))[0])
            lo, hi = C.range_at_level(np.array([comp]), level)
            int_rows.append((int(lo[0]), int(hi[0]), cc, lvl))
    # represent compacted cells by their level-``level`` id range —
    # the Z-order contiguity trick (PAPERS.md range encoding)
    interior_df = spark.createDataFrame(
        int_rows, "range_lo bigint, range_hi bigint, country_code string, comp_level int"
    )

    pts = with_point_cell(images_geo, level, "lon", "lat", "cell_lvl")
    # stage 1: interior assignment — broadcast RANGE join on the compacted
    # cover (few rows after compaction; Z-order ranges make it a compact
    # broadcast-able predicate)
    stage1 = pts.join(
        F.broadcast(interior_df),
        (F.col("cell_lvl") >= F.col("range_lo")) & (F.col("cell_lvl") < F.col("range_hi")),
        "left",
    )
    assigned = stage1.filter(F.col("country_code").isNotNull()).select(
        id_col, "lon", "lat", "country_code"
    )
    todo = stage1.filter(F.col("country_code").isNull()).select(id_col, "lon", "lat")

    # stage 2: exact ray-cast PIP for boundary-cell images only
    edge_rows = []
    for cc, ring in rings.items():
        for i in range(len(ring) - 1):
            edge_rows.append(
                (cc, float(ring[i, 0]), float(ring[i, 1]), float(ring[i + 1, 0]), float(ring[i + 1, 1]))
            )
    edges = spark.createDataFrame(
        edge_rows, "country_code string, x0 double, y0 double, x1 double, y1 double"
    )
    crossed = (
        todo.crossJoin(F.broadcast(edges))
        .withColumn(
            "_cross", F.expr(pip_crossing_expr("lon", "lat", "x0", "y0", "x1", "y1"))
        )
        .groupBy(id_col, "lon", "lat", "country_code")
        .agg(F.sum("_cross").alias("_n"))
        .filter(F.col("_n") % 2 == 1)
        .select(id_col, "lon", "lat", "country_code")
    )
    return assigned.unionByName(crossed)
