#!/usr/bin/env python
"""Generate the versioned golden fixtures (FIXTURES.md §4, SURVEY.md §5.2).

Pure numpy oracle — no Spark.  The goldens pin the engine's
reference-parity outputs ("matching the reference's join output rows
and tile assignments", BASELINE.json:14): tile assignments, nearest
road (with deterministic tie-break), spatial-join rows, and the
per-country RAI summary, all at sf0.001 (1000 images, 200 roads).

Run:  python scripts/make_goldens.py     (rewrites tests/goldens/*)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdg_engine import cells as C  # noqa: E402
from sdg_engine import fixtures as FX  # noqa: E402
from sdg_engine.geom import point_segment_dist_sq  # noqa: E402
from sdg_engine import METERS_PER_DEG  # noqa: E402

SF = 0.001
LEVEL_ASSIGN = 12  # tile-assignment cell level
KNN_CUTOFF_M = 60000.0
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    n_images, _ = FX._sizes(SF)
    ids = np.array([f"img{i:012d}" for i in range(n_images)])
    lons, lats = FX.lonlat_batch(ids)
    roads = FX.roads_records(SF)

    # --- golden_tile_assignments: image -> cell(level 12) + country ---
    cells12 = C.point_cell(lons, lats, LEVEL_ASSIGN)
    ccs = FX.country_of_points(lons, lats)
    with open(os.path.join(OUT, "tile_assignments.json"), "w") as f:
        json.dump(
            [
                {"image_id": str(i), "cell_id": int(c), "country_code": str(k)}
                for i, c, k in zip(ids, cells12, ccs)
            ],
            f,
        )

    # --- segments + covers (shared by knn / join goldens) ---
    segs = []  # (road_id, seg_id, ax, ay, bx, by)
    for r in roads:
        pts = np.array([[p["x"], p["y"]] for p in r["coords"]])
        for s in range(len(pts) - 1):
            segs.append((r["road_id"], s, pts[s, 0], pts[s, 1], pts[s + 1, 0], pts[s + 1, 1]))
    seg_arr = np.array([(a, b, c, d) for _, _, a, b, c, d in segs])
    seg_ids = np.array([(rid, sid) for rid, sid, *_ in segs], dtype=np.int64)

    # --- golden_nearest_road: exact brute force + (dist, road_id, seg_id)
    # tie-break; k_ring = chebyshev(point cell idx, nearest seg-cover cell)
    level_knn = 0
    from sdg_engine.ops.spatial import level_for_cutoff  # numpy-free helper

    level_knn = level_for_cutoff(KNN_CUTOFF_M)
    pix, piy = C.xy_to_index(lons, lats, level_knn)
    nearest = []
    for j in range(len(ids)):
        d2 = point_segment_dist_sq(
            lons[j], lats[j], seg_arr[:, 0], seg_arr[:, 1], seg_arr[:, 2], seg_arr[:, 3]
        )
        dists = np.sqrt(d2) * METERS_PER_DEG
        order = np.lexsort((seg_ids[:, 1], seg_ids[:, 0], dists))
        best = order[0]
        if dists[best] <= KNN_CUTOFF_M:
            # k_ring: chebyshev distance from point cell to the nearest
            # covering cell of the winning segment's bbox
            ax, ay, bx, by = seg_arr[best]
            ix0, iy0 = C.xy_to_index(np.array([min(ax, bx)]), np.array([min(ay, by)]), level_knn)
            ix1, iy1 = C.xy_to_index(np.array([max(ax, bx)]), np.array([max(ay, by)]), level_knn)
            dx = max(int(ix0[0] - pix[j]), int(pix[j] - ix1[0]), 0)
            dy = max(int(iy0[0] - piy[j]), int(piy[j] - iy1[0]), 0)
            nearest.append(
                {
                    "image_id": str(ids[j]),
                    "road_id": int(seg_ids[best, 0]),
                    "dist_m": float(dists[best]),
                    "k_ring": int(max(dx, dy)),
                }
            )
    with open(os.path.join(OUT, "nearest_road.json"), "w") as f:
        json.dump(nearest, f)

    # --- golden_join_rows: point-cell ⋈ segment-bbox-cover at level 9 ---
    level_join = 7
    pcell = C.point_cell(lons, lats, level_join)
    row_idx, cover_cells = C.cover_bbox(
        np.minimum(seg_arr[:, 0], seg_arr[:, 2]),
        np.minimum(seg_arr[:, 1], seg_arr[:, 3]),
        np.maximum(seg_arr[:, 0], seg_arr[:, 2]),
        np.maximum(seg_arr[:, 1], seg_arr[:, 3]),
        level_join,
    )
    cell_to_roads: dict[int, set[int]] = {}
    for ri, cc_ in zip(row_idx, cover_cells):
        cell_to_roads.setdefault(int(cc_), set()).add(int(seg_ids[ri, 0]))
    join_rows = []
    for j in range(len(ids)):
        for rid in sorted(cell_to_roads.get(int(pcell[j]), ())):
            join_rows.append(
                {"image_id": str(ids[j]), "road_id": rid, "cell_id": int(pcell[j])}
            )
    with open(os.path.join(OUT, "join_rows.json"), "w") as f:
        json.dump(join_rows, f)

    # --- golden_rai_summary (per-country, burn/cost-distance based) ---
    from sdg_engine.ops.raster import tile_summary

    per_cc: dict[str, dict[str, float]] = {}
    for j in range(len(ids)):
        i = int(str(ids[j])[3:])
        half = 0.004 * (1.0 + (i % 5) / 4.0)
        fxmin, fymin, fxmax, fymax = lons[j] - half, lats[j] - half, lons[j] + half, lats[j] + half
        pop_total, pop_near, _pt, _pn = tile_summary(
            str(ids[j]),
            *_image_payload(i, lons[j], lats[j]),
            fxmin, fymin, fxmax, fymax,
            seg_arr, 250.0,
        )
        agg = per_cc.setdefault(ccs[j], {"n_images": 0, "n_near": 0, "pop_total": 0.0, "pop_near": 0.0})
        agg["n_images"] += 1
        agg["n_near"] += 1 if pop_near > 0 else 0
        agg["pop_total"] += pop_total
        agg["pop_near"] += pop_near
    summary = [
        {
            "country_code": k,
            "n_images": int(v["n_images"]),
            "n_near": int(v["n_near"]),
            "pop_total": round(v["pop_total"], 3),
            "pop_near": round(v["pop_near"], 3),
            "rai": round(v["pop_near"] / v["pop_total"], 6),
        }
        for k, v in sorted(per_cc.items())
    ]
    with open(os.path.join(OUT, "rai_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(f"goldens written to {OUT}: {len(ids)} assignments, "
          f"{len(nearest)} nearest, {len(join_rows)} join rows, "
          f"{len(summary)} countries")
    make_decode_stats_golden()
    make_thumb_stats_golden()


def make_decode_stats_golden() -> None:
    """Golden for the ORACLE-checked image_decode_stats query (r03).

    INDEPENDENT of the engine codecs by construction: pixels come from
    the fixture generator (the SPEC), and the lossy qnt transform is
    REIMPLEMENTED here (quantize to 64 levels, decode to bin centers)
    rather than imported from codecs.py — so a codec decode bug cannot
    leak into its own oracle.  jpg rows get NULL mean_lum: no
    independent JPEG decoder can exist in this container (jpeg.py IS
    the only one); jpg pixel fidelity is gated in tests/test_jpeg.py.
    Replicates fixtures.images_pdf's deterministic fmt/size assignment
    (FIXTURES.md: fmt = fmts[i %% 5], w = h = [32, 64, 128][i %% 3] at
    sf > 0.001) for the harness subset image_id < img…500 at sf0.01.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    fmts = FX.FMTS + ["qnt"]
    size_mix = [32, 64, 128]
    ids, lums = [], []
    for i in range(500):
        image_id = f"img{i:012d}"
        lon, lat = FX.lonlat_of(image_id)
        w = h = size_mix[i % len(size_mix)]
        fmt = fmts[i % len(fmts)]
        px = FX.make_image_pixels(i, lon, lat, w, h)
        if fmt == "qnt":
            # independent qnt twin: 64-level quantize → bin-center decode
            q = (px.astype(np.uint16) // 4).astype(np.uint8)
            px = np.minimum(q.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
        ids.append(image_id)
        if fmt == "jpg":
            lums.append(None)
        else:
            # EXACT expression shape of ops.payload.decode_stats (first
            # term astype'd, others upcast) so the float64 bits match
            lum = (
                0.299 * px[:, :, 0].astype(np.float64)
                + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2]
            )
            lums.append(float(lum.mean()))
    pq.write_table(
        pa.table({"image_id": ids, "mean_lum": pa.array(lums, pa.float64())}),
        os.path.join(OUT, "decode_stats_sf0.01.parquet"),
    )
    print(f"decode-stats golden: {len(ids)} rows "
          f"({sum(l is None for l in lums)} jpg NULLs)")


def make_thumb_stats_golden() -> None:
    """Golden for the ORACLE-checked image_thumbnails query (r03).

    INDEPENDENT of the engine resize/codecs: pixels come from the
    fixture generator (the SPEC), the qnt transform is the same
    reimplemented twin as the decode-stats golden, and the 16×16 box
    means are computed by RESHAPE block means (not the engine's cumsum
    inclusion-exclusion).  Fixture sizes 32/64/128 are exact multiples
    of 16 with power-of-two block areas, so both paths are float64-EXACT
    and the means match bit-for-bit.  jpg rows NULL (lossy decode)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fmts = FX.FMTS + ["qnt"]
    size_mix = [32, 64, 128]
    ids, lums = [], []
    for i in range(500):
        image_id = f"img{i:012d}"
        lon, lat = FX.lonlat_of(image_id)
        w = h = size_mix[i % len(size_mix)]
        fmt = fmts[i % len(fmts)]
        px = FX.make_image_pixels(i, lon, lat, w, h)
        if fmt == "qnt":
            q = (px.astype(np.uint16) // 4).astype(np.uint8)
            px = np.minimum(q.astype(np.uint16) * 4 + 2, 255).astype(np.uint8)
        ids.append(image_id)
        if fmt == "jpg":
            lums.append(None)
            continue
        b = h // 16  # block edge (2 / 4 / 8 — exact power-of-two areas)
        blocks = (
            px.astype(np.float64)
            .reshape(16, b, 16, b, 3)
            .sum(axis=(1, 3))
            / float(b * b)
        )
        thumb = np.clip(np.rint(blocks), 0, 255).astype(np.uint8)
        # EXACT expression shape of ops.payload.thumbnails for bit parity
        lum = (
            0.299 * thumb[:, :, 0].astype(np.float64)
            + 0.587 * thumb[:, :, 1]
            + 0.114 * thumb[:, :, 2]
        )
        lums.append(float(lum.mean()))
    pq.write_table(
        pa.table({"image_id": ids, "mean_lum": pa.array(lums, pa.float64())}),
        os.path.join(OUT, "thumb_stats_sf0.01.parquet"),
    )
    print(f"thumb-stats golden: {len(ids)} rows "
          f"({sum(l is None for l in lums)} jpg NULLs)")


def _image_payload(i: int, lon: float, lat: float):
    from sdg_engine.codecs import encode_image
    from sdg_engine.fixtures import FMTS, make_image_pixels

    fmts = FMTS + ["qnt"]
    fmt = fmts[i % len(fmts)]
    w = h = 64
    px = make_image_pixels(i, lon, lat, w, h)
    return encode_image(px, fmt), fmt, w, h


if __name__ == "__main__":
    main()
