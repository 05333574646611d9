"""Image-payload operators (SURVEY.md §2.8 X1-X5; BASELINE.json:15).

All Arrow-batched ``mapInPandas`` / pandas UDFs — the batch loop is
Python, the per-image work is numpy (no per-row Python in expressions).
The invariant surface (decoded-pixel PSNR, caption byte-equality,
phash stability) is exposed as DataFrame operators so pipelines can
gate themselves (the pytest gate uses them too).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash bigint"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """X1 surface: decode every image, emit per-image pixel stats.

    Output: image_id, mean_lum, min_px, max_px, ok (decode succeeded &
    shape matches the w/h columns).
    """

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                    ok = img.shape == (int(r.h), int(r.w), 3)
                    lum = (
                        0.299 * img[:, :, 0].astype(np.float64)
                        + 0.587 * img[:, :, 1]
                        + 0.114 * img[:, :, 2]
                    )
                    out.append((r.image_id, float(lum.mean()), int(img.min()),
                                int(img.max()), ok))
                except Exception:  # noqa: BLE001 — corrupt row -> ok=False
                    out.append((r.image_id, None, None, None, False))
            yield pd.DataFrame(
                out, columns=["image_id", "mean_lum", "min_px", "max_px", "ok"]
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _stats, "image_id string, mean_lum double, min_px int, max_px int, ok boolean"
    )


def thumbnails(images: DataFrame, tw: int = 16, th: int = 16) -> DataFrame:
    """X1 resize surface: area/box-mean thumbnail of every image,
    re-encoded as lossless PNG (the multimodal "resize" op of the task
    spec — decode / feature-extract / resize / frame-sample).

    Per-image work is numpy (cumsum block means — exact for the
    fixture's power-of-two block sizes); the batch loop is Python over
    whole payloads, amortized like the raster ops.  Output mean_lum is
    the luminance of the THUMB (post-rint), golden-checked against an
    independent generator-pixel twin in the oracle (jpg rows NULL —
    lossy decode, gated by PSNR in tests instead)."""

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image, encode_image
        from sdg_engine.phash import resize_area

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    img = decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                    chans = [
                        resize_area(img[:, :, c].astype(np.float64), th, tw)
                        for c in range(3)
                    ]
                    thumb = np.clip(
                        np.rint(np.stack(chans, axis=-1)), 0, 255
                    ).astype(np.uint8)
                    data = encode_image(thumb, "png")
                    lum = (
                        0.299 * thumb[:, :, 0].astype(np.float64)
                        + 0.587 * thumb[:, :, 1]
                        + 0.114 * thumb[:, :, 2]
                    )
                    out.append(
                        (r.image_id, data, tw, th, float(lum.mean()), True)
                    )
                except Exception:  # noqa: BLE001 — corrupt row -> ok=False
                    out.append((r.image_id, None, tw, th, None, False))
            yield pd.DataFrame(
                out,
                columns=["image_id", "thumb", "tw", "th", "mean_lum", "ok"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _thumb,
        "image_id string, thumb binary, tw int, th int, mean_lum double, ok boolean",
    )


def transcode(images: DataFrame, to_fmt: str) -> DataFrame:
    """X1+X2: decode → re-encode every image to ``to_fmt``.

    Returns the same images schema with new bytes/fmt and a freshly
    computed phash (which must equal the input phash on lossless paths
    — the invariant tests assert it)."""

    def _tx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image, encode_image
        from sdg_engine.phash import phash64

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                img = decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                data = encode_image(img, to_fmt)
                rt = decode_image(data, to_fmt, int(r.w), int(r.h))
                out.append(
                    (r.image_id, data, int(r.w), int(r.h), to_fmt, r.caption,
                     np.int64(phash64(rt)))
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    return images.mapInPandas(_tx, _IMAGES_SCHEMA)


def verify_invariants(inputs: DataFrame, outputs: DataFrame) -> DataFrame:
    """BASELINE.json:15 per-row invariants between two image tables.

    Joins on image_id and emits: psnr (inf→1e9 for lossless-equal),
    caption_equal, phash_hamming.  Gate: psnr >= 40 AND caption_equal.
    """
    a = inputs.select(
        F.col("image_id"),
        F.col("bytes").alias("bytes_in"),
        F.col("fmt").alias("fmt_in"),
        "w",
        "h",
        F.col("caption").alias("caption_in"),
        F.col("phash").alias("phash_in"),
    )
    b = outputs.select(
        F.col("image_id"),
        F.col("bytes").alias("bytes_out"),
        F.col("fmt").alias("fmt_out"),
        F.col("caption").alias("caption_out"),
        F.col("phash").alias("phash_out"),
    )
    joined = a.join(b, "image_id")

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image, psnr

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                da = decode_image(bytes(r.bytes_in), r.fmt_in, int(r.w), int(r.h))
                db = decode_image(bytes(r.bytes_out), r.fmt_out, int(r.w), int(r.h))
                p = psnr(da, db)
                out.append(
                    (
                        r.image_id,
                        1e9 if p == float("inf") else float(p),
                        r.caption_in == r.caption_out,
                        int(bin((int(r.phash_in) ^ int(r.phash_out)) & ((1 << 64) - 1)).count("1")),
                    )
                )
            yield pd.DataFrame(
                out, columns=["image_id", "psnr", "caption_equal", "phash_hamming"]
            )

    return joined.mapInPandas(
        _check,
        "image_id string, psnr double, caption_equal boolean, phash_hamming int",
    )


def phash_near_dup_pairs(images: DataFrame, max_hamming: int = 12) -> DataFrame:
    """X4 near-dup grouping: pHash-band LSH + exact hamming verify.

    Band trick: 8 bands of 8 bits — by pigeonhole, any pair within
    hamming 7 shares at least one unchanged band (guaranteed recall);
    up to 12 the recall is probabilistic but high.  Exact
    ``bit_count(a^b)`` (pure Spark SQL, no UDF) verifies candidates.
    """
    bands = images.select(
        "image_id",
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.expr(f"(phash >> {8 * i}) & 255").alias("sig"),
                )
                for i in range(8)
            ])
        ).alias("b"),
    ).select("image_id", "phash", "b.band", "b.sig")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("id_a"),
            F.col("b.image_id").alias("id_b"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def warp_checksums(images_geo: DataFrame, dst_crs: str,
                   out_w: int = 32, out_h: int = 32) -> DataFrame:
    """X6 reprojection surface (r04): decode each tile and WARP it from
    its plate-carrée footprint onto a regular ``dst_crs`` grid
    (crs.warp_tile, nearest-neighbour — the GeoTrellis tile.reproject
    analogue).  Emits INTEGER checksums (sum of all warped channel
    bytes, count of non-fill pixels), which are hash-stable, so the
    harness query over this op is golden-oracle-checked.

    Needs fp_xmin..fp_ymax from ops.spatial.with_geo."""

    def _warp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image
        from sdg_engine.crs import warp_tile

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                img = decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                warped = warp_tile(
                    img, (r.fp_xmin, r.fp_ymin, r.fp_xmax, r.fp_ymax),
                    dst_crs, out_w, out_h,
                )
                out.append((
                    r.image_id,
                    int(warped.astype(np.int64).sum()),
                    int((warped != 0).any(axis=2).sum()),
                ))
            yield pd.DataFrame(
                out, columns=["image_id", "warp_sum", "n_nonfill"]
            )

    cols = ["image_id", "bytes", "fmt", "w", "h",
            "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    return images_geo.select(*cols).mapInPandas(
        _warp, "image_id string, warp_sum bigint, n_nonfill int"
    )


def transcode_geotiff(images_geo: DataFrame) -> DataFrame:
    """S6 full (r04): re-encode tiles as GEOREFERENCED TIFFs — deflate
    strips + the GeoTIFF grid tags (ModelPixelScale = footprint
    degrees-per-pixel, ModelTiepoint = footprint top-left), the
    reference's actual raster sink format (WorldPop-style GeoTIFF).
    Lossless: decode(bytes) round-trips exactly (invariant-tested) and
    decode_tiff(..., return_geo=True) recovers the grid.

    Needs fp_xmin..fp_ymax from ops.spatial.with_geo."""

    def _tx(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image
        from sdg_engine.tiff import encode_tiff

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                img = decode_image(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                ps = ((r.fp_xmax - r.fp_xmin) / int(r.w),
                      (r.fp_ymax - r.fp_ymin) / int(r.h))
                data = encode_tiff(
                    img, pixel_scale=ps, tiepoint=(r.fp_xmin, r.fp_ymax)
                )
                out.append((r.image_id, data, int(r.w), int(r.h), "tif"))
            yield pd.DataFrame(
                out, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    cols = ["image_id", "bytes", "fmt", "w", "h",
            "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    return images_geo.select(*cols).mapInPandas(
        _tx, "image_id string, bytes binary, w int, h int, fmt string"
    )


# --- S6b (r05): colormapped PNG rendering of a binned raster layer ---------

# 8-stop value ramp (cool→hot), arbitrary literals shared verbatim with
# the DuckDB oracle (oracles_ext.IMAGE_RENDER_COLORMAP's VALUES list)
COLORMAP_RAMP = [
    (16, 16, 96), (32, 48, 128), (48, 96, 160), (64, 144, 192),
    (128, 192, 208), (192, 208, 144), (224, 160, 64), (240, 64, 32),
]

_RENDER_SCHEMA = (
    "tx int, ty int, png binary, n_covered int, "
    "sum_r bigint, sum_g bigint, sum_b bigint"
)


def render_colormap_png(cells: DataFrame, tile_px: int = 8) -> DataFrame:
    """Render a binned cell layer to per-tile colormapped PNGs (the
    reference's viz-PNG output, SURVEY §2.1 S6 'rendered PNG';
    VERDICT r04 item 4).

    cells: (tx, ty, px, py, bin) — tile address, within-tile pixel
    (south-origin py), ramp bin 0..7.  Uncovered pixels render
    background black.  One groupBy(tile).applyInPandas — the same
    keyed-cogroup shape as the MVT sink, skew salting applies.

    The emitted channel sums are computed from the DECODED png, so the
    row certifies the encode→decode round trip per tile; the DuckDB
    oracle recomputes them from the LUT literals + the relational bin
    counts (integers end-to-end — no float in the render path).
    """
    from ..codecs import decode_png, encode_png

    ramp = np.array(COLORMAP_RAMP, dtype=np.uint8)

    def _render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        img = np.zeros((tile_px, tile_px, 3), dtype=np.uint8)
        px = pdf["px"].to_numpy(np.int64)
        py = pdf["py"].to_numpy(np.int64)
        bb = np.clip(pdf["bin"].to_numpy(np.int64), 0, len(ramp) - 1)
        img[tile_px - 1 - py, px] = ramp[bb]  # row 0 = north
        blob = encode_png(img)
        back = decode_png(blob)
        s = back.reshape(-1, 3).astype(np.int64).sum(axis=0)
        return pd.DataFrame(
            [(tx, ty, blob, len(pdf), int(s[0]), int(s[1]), int(s[2]))],
            columns=["tx", "ty", "png", "n_covered",
                     "sum_r", "sum_g", "sum_b"],
        )

    return cells.groupBy("tx", "ty").applyInPandas(_render, _RENDER_SCHEMA)


# ---------------------------------------------------------------------------
# Horn hillshade (r05) — the classic GeoTrellis-style focal raster op,
# luminance-as-elevation over the image tiles.
# ---------------------------------------------------------------------------

# SPEC shared with the golden twin (scripts/make_goldens.py) — the
# expression ORDER is part of the spec so float64 bits match:
#   z    = edge-replicated pad of the luminance raster (all-three-
#          astype lum shape: 0.299*R + 0.587*G + 0.114*B)
#   dzdx = ((tr + 2*r + br) - (tl + 2*l + bl)) / 8.0
#   dzdy = ((bl + 2*b + br) - (tl + 2*t + tr)) / 8.0
#   slope  = arctan(Z_FACTOR * sqrt(dzdx*dzdx + dzdy*dzdy))
#   aspect = arctan2(dzdy, -dzdx)
#   shade  = cos(zen)*cos(slope) + sin(zen)*sin(slope)*cos(az - aspect)
#   shade8 = clip(floor(255.0*shade + 0.5), 0, 255) as int64
HILLSHADE_AZ_DEG = 315.0
HILLSHADE_ALT_DEG = 45.0
HILLSHADE_Z = 0.1


def horn_shade8(lum: np.ndarray) -> np.ndarray:
    """Quantized Horn hillshade of a float64 luminance raster."""
    az = np.deg2rad(HILLSHADE_AZ_DEG)
    zen = np.deg2rad(90.0 - HILLSHADE_ALT_DEG)
    z = np.pad(lum, 1, mode="edge")
    tl, t, tr = z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:]
    l, r = z[1:-1, :-2], z[1:-1, 2:]
    bl, b, br = z[2:, :-2], z[2:, 1:-1], z[2:, 2:]
    dzdx = ((tr + 2.0 * r + br) - (tl + 2.0 * l + bl)) / 8.0
    dzdy = ((bl + 2.0 * b + br) - (tl + 2.0 * t + tr)) / 8.0
    slope = np.arctan(HILLSHADE_Z * np.sqrt(dzdx * dzdx + dzdy * dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    shade = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(
        az - aspect
    )
    return np.clip(np.floor(255.0 * shade + 0.5), 0, 255).astype(np.int64)


def hillshade_stats(images: DataFrame) -> DataFrame:
    """Per-image hillshade checksums: decode -> luminance-as-elevation
    -> Horn 3x3 focal shade -> integer sums (fold-order exact).

    Map-only mapInPandas like decode_stats — payload bytes never
    shuffle; at 100 TB the stage splits by parquet row group and the
    only exchange is whatever aggregate the caller adds.  The 3x3
    halo is interior to each tile (edge-replicate pad), so no
    cross-tile stitch is needed — the stitched-halo variant for
    seamless mosaics is ops/raster's kring(1) halo exchange.
    """

    def _shade(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for rr in pdf.itertuples(index=False):
                img = decode_image(bytes(rr.bytes), rr.fmt, int(rr.w), int(rr.h))
                lum = (
                    0.299 * img[:, :, 0].astype(np.float64)
                    + 0.587 * img[:, :, 1].astype(np.float64)
                    + 0.114 * img[:, :, 2].astype(np.float64)
                )
                s8 = horn_shade8(lum)
                out.append(
                    (
                        rr.image_id,
                        int(s8.size),
                        int(s8.sum()),
                        int(s8.min()),
                        int(s8.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "n_px", "sum_shade", "min_shade", "max_shade"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _shade,
        "image_id string, n_px int, sum_shade bigint, "
        "min_shade int, max_shade int",
    )


# ---------------------------------------------------------------------------
# Sobel edge density (r05) — the sharpness/blur curation signal an
# image-corpus pipeline scores before training-set selection.  ALL
# INTEGER: luma in BT.601 integer milli-units (299R + 587G + 114B),
# L1 gradient magnitude |gx| + |gy|, fold-order exact by construction.
# ---------------------------------------------------------------------------

# SPEC shared with the golden twin (scripts/make_goldens.py):
#   L  = 299*R + 587*G + 114*B  (int64, edge-replicated pad)
#   gx = (tr + 2*r + br) - (tl + 2*l + bl)
#   gy = (bl + 2*b + br) - (tl + 2*t + tr)
#   mag = |gx| + |gy|; edge pixel when mag > SOBEL_EDGE_T
SOBEL_EDGE_T = 100_000  # ~98 gray levels in luma milli-units


def sobel_mag(lum_i: np.ndarray) -> np.ndarray:
    """L1 Sobel gradient magnitude of an int64 luma raster."""
    z = np.pad(lum_i, 1, mode="edge")
    tl, t, tr = z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:]
    l, r = z[1:-1, :-2], z[1:-1, 2:]
    bl, b, br = z[2:, :-2], z[2:, 1:-1], z[2:, 2:]
    gx = (tr + 2 * r + br) - (tl + 2 * l + bl)
    gy = (bl + 2 * b + br) - (tl + 2 * t + tr)
    return np.abs(gx) + np.abs(gy)


def sobel_stats(images: DataFrame) -> DataFrame:
    """Per-image Sobel edge stats: decode -> integer BT.601 luma ->
    3x3 Sobel L1 magnitude -> (n_px, n_edges, sum_mag, max_mag).

    Map-only mapInPandas like hillshade_stats — payload bytes never
    shuffle, the 3x3 halo is interior to each image (edge-replicate),
    and every value is an exact BIGINT, so the checksums are
    fold-order independent at any partitioning.
    """

    def _edges(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for rr in pdf.itertuples(index=False):
                img = decode_image(bytes(rr.bytes), rr.fmt, int(rr.w), int(rr.h))
                lum = (
                    299 * img[:, :, 0].astype(np.int64)
                    + 587 * img[:, :, 1].astype(np.int64)
                    + 114 * img[:, :, 2].astype(np.int64)
                )
                mag = sobel_mag(lum)
                out.append(
                    (
                        rr.image_id,
                        int(mag.size),
                        int((mag > SOBEL_EDGE_T).sum()),
                        int(mag.sum()),
                        int(mag.max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "n_px", "n_edges", "sum_mag", "max_mag"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _edges,
        "image_id string, n_px int, n_edges int, sum_mag bigint, max_mag bigint",
    )


# ---------------------------------------------------------------------------
# D8 flow direction + accumulation (r05) — the hydrology terrain op
# (GeoTrellis-world: focal flow / accumulation), luminance-as-elevation
# like hillshade.  ALL INTEGER, so parity with the golden twin is exact.
# ---------------------------------------------------------------------------

# SPEC shared with the golden twin (scripts/make_goldens.py):
#   elev = 299*R + 587*G + 114*B  (int64 milli-luma)
#   neighbors in FIXED order N NE E SE S SW W NW; out-of-bounds
#   neighbor = the cell itself (clamp), so its drop is 0 and it can
#   never win the strict-positive steepest-descent test
#   drop(c,n) = elev(c) - elev(n); target = FIRST neighbor in order
#   achieving the maximum drop > 0; SINK when no neighbor is lower
#   acc(c) = 1 + sum(acc(u) for upstream u) — a DAG by strict descent
#   chk = sum(acc_i * ((i % 97) + 1)) over row-major i (position-aware)
_D8_OFFS = ((-1, 0), (-1, 1), (0, 1), (1, 1),
            (1, 0), (1, -1), (0, -1), (-1, -1))


def d8_targets(lum_i: np.ndarray) -> np.ndarray:
    """Flat steepest-descent target per cell (-1 = sink), vectorized
    over the 8 offsets per the SPEC above."""
    h, w = lum_i.shape
    rr, cc = np.indices((h, w))
    best = np.zeros((h, w), dtype=np.int64)
    tgt = np.full((h, w), -1, dtype=np.int64)
    for dr, dc in _D8_OFFS:
        ri = np.clip(rr + dr, 0, h - 1)
        ci = np.clip(cc + dc, 0, w - 1)
        drop = lum_i - lum_i[ri, ci]
        better = drop > best  # strict: the FIRST offset at the max wins
        best = np.where(better, drop, best)
        tgt = np.where(better, ri * w + ci, tgt)
    return tgt.ravel()


def d8_flow_accum(lum_i: np.ndarray) -> tuple[np.ndarray, int]:
    """D8 accumulation of an int64 DEM: steepest-descent target per
    cell, then ONE high-to-low sweep — processing cells in strictly
    decreasing elevation order means every upstream cell is finished
    before its target accumulates it (cells of EQUAL elevation cannot
    flow to each other: the drop test is strict), so a single pass
    computes acc = 1 + sum(upstream) exactly.
    Returns (acc flat int64, n_sinks)."""
    h, w = lum_i.shape
    flat_t = d8_targets(lum_i)
    order = np.argsort(lum_i.ravel(), kind="stable")[::-1]  # high -> low
    tl = flat_t.tolist()
    al = [1] * (h * w)
    for i in order.tolist():
        t = tl[i]
        if t >= 0:
            al[t] += al[i]
    return np.asarray(al, dtype=np.int64), int((flat_t < 0).sum())


def d8_flow_stats(images: DataFrame) -> DataFrame:
    """Per-image D8 flow-accumulation stats: decode -> integer luma
    DEM -> steepest-descent accumulation -> exact-BIGINT summaries.

    Map-only mapInPandas like hillshade/sobel — payload bytes never
    shuffle; the per-image DAG sweep is local (a DEM tile's flow field
    is interior under clamp borders), and every output is an exact
    integer, fold-order independent at any partitioning."""

    def _flow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for rr in pdf.itertuples(index=False):
                img = decode_image(bytes(rr.bytes), rr.fmt, int(rr.w), int(rr.h))
                lum = (
                    299 * img[:, :, 0].astype(np.int64)
                    + 587 * img[:, :, 1].astype(np.int64)
                    + 114 * img[:, :, 2].astype(np.int64)
                )
                acc, n_sinks = d8_flow_accum(lum)
                wgt = (np.arange(acc.size, dtype=np.int64) % 97) + 1
                out.append(
                    (
                        rr.image_id,
                        int(acc.size),
                        n_sinks,
                        int(acc.sum()),
                        int(acc.max()),
                        int((acc * wgt).sum()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["image_id", "n_px", "n_sinks",
                         "sum_acc", "max_acc", "chk"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _flow,
        "image_id string, n_px int, n_sinks int, "
        "sum_acc bigint, max_acc bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Terrain family (r05, continued): watershed basins, viewshed, and
# priority-flood pit fill — the three classic DEM-conditioning /
# visibility ops next to hillshade + D8 accumulation.  All integer,
# all map-only; each has an INDEPENDENT golden twin that computes the
# same SPEC with a different algorithm (see scripts/make_goldens.py).
# ---------------------------------------------------------------------------


def _int_terrain_op(images: DataFrame, kernel, cols: list[str],
                    schema_tail: str) -> DataFrame:
    """Shared map-only scaffold for the integer terrain stats ops:
    decode -> int64 milli-luma DEM -> per-image kernel(lum) -> row
    tuple.  Payload bytes never shuffle (zero Exchange, plan-pinned
    per query); every kernel output is an exact integer so results are
    partitioning- and fold-order-independent."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for rr in pdf.itertuples(index=False):
                img = decode_image(bytes(rr.bytes), rr.fmt, int(rr.w), int(rr.h))
                lum = (
                    299 * img[:, :, 0].astype(np.int64)
                    + 587 * img[:, :, 1].astype(np.int64)
                    + 114 * img[:, :, 2].astype(np.int64)
                )
                out.append((rr.image_id, *kernel(lum)))
            yield pd.DataFrame(out, columns=["image_id", *cols])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _run, "image_id string, " + schema_tail
    )


def d8_watershed(lum_i: np.ndarray) -> tuple[np.ndarray, int]:
    """WATERSHED BASIN labels: every cell is labeled with the flat
    index of the SINK its D8 steepest-descent path terminates at (the
    drainage-basin partition of the DEM).  Resolution is POINTER
    JUMPING — next = next[next] doubles the resolved path length per
    round, so convergence is O(log diameter) rounds of O(n) numpy
    (the golden twin walks chains with scalar memoization instead).
    Returns (labels flat int64, n_basins)."""
    flat_t = d8_targets(lum_i)
    n = flat_t.size
    idx = np.arange(n, dtype=np.int64)
    nxt = np.where(flat_t < 0, idx, flat_t)
    while True:
        nxt2 = nxt[nxt]
        if (nxt2 == nxt).all():
            break
        nxt = nxt2
    return nxt, int((flat_t < 0).sum())


def watershed_stats_kernel(lum: np.ndarray) -> tuple[int, int, int, int, int]:
    # SPEC: labels = sink flat index; largest_px = max basin size;
    # sum_sq = sum over basins of size^2 (the collision/Simpson mass —
    # position-independent); chk = sum((label_i + 1) * wgt_i), wgt as
    # in the flow op (position-aware).
    labels, n_basins = d8_watershed(lum)
    sizes = np.bincount(labels, minlength=labels.size).astype(np.int64)
    wgt = (np.arange(labels.size, dtype=np.int64) % 97) + 1
    return (int(labels.size), n_basins, int(sizes.max()),
            int((sizes * sizes).sum()), int(((labels + 1) * wgt).sum()))


def watershed_stats(images: DataFrame) -> DataFrame:
    """Per-image D8 watershed-basin stats (map-only; see
    _int_terrain_op)."""
    return _int_terrain_op(
        images, watershed_stats_kernel,
        ["n_px", "n_basins", "largest_px", "sum_sq", "chk"],
        "n_px int, n_basins int, largest_px int, sum_sq bigint, chk bigint",
    )


# Viewshed SPEC (shared with the golden twin):
#   viewpoint v = (h//2, w//2); ev = elev(v)
#   for target t at (r,c): dr = r - h//2, dc = c - w//2,
#   n = max(|dr|, |dc|) (Chebyshev ray length)
#   intermediate sample at step k in 1..n-1:
#     p_k = (h//2 + floor((2*k*dr + n) / (2*n)),
#            w//2 + floor((2*k*dc + n) / (2*n)))   [exact integer DDA]
#   VISIBLE iff for every k: (elev(p_k) - ev) * n <= (elev(t) - ev) * k
#   (blocked only when an intermediate subtends a STRICTLY greater
#   slope — grazing sightlines pass, so a flat DEM is fully visible;
#   cross-multiplied rationals, n, k > 0 so the direction is exact);
#   n <= 1 targets are visible.
#   chk = sum(wgt_i over visible i), wgt as above (position-aware).


def viewshed_visible(lum_i: np.ndarray) -> np.ndarray:
    """Flat bool visibility mask from the center cell — vectorized
    ANY-VIOLATION formulation: for each step k, compute every ray's
    k-th intermediate sample at once and accumulate violations (the
    golden twin instead tracks the running MAX slope as an exact
    rational best_num/best_den per target)."""
    h, w = lum_i.shape
    r0, c0 = h // 2, w // 2
    ev = int(lum_i[r0, c0])
    flat = lum_i.ravel()
    rr, cc = np.indices((h, w))
    dr = (rr - r0).ravel().astype(np.int64)
    dc = (cc - c0).ravel().astype(np.int64)
    n = np.maximum(np.abs(dr), np.abs(dc))
    et = flat.astype(np.int64) - ev
    viol = np.zeros(flat.size, dtype=bool)
    # r06: iterate over a COMPRESSED active-ray index set instead of
    # full-raster arrays per step — a ray leaves the set when it is
    # violated (its fate is decided) or exhausted (k >= n), so step
    # k's vector work is proportional to the surviving rays, not to
    # the raster (full-array form measured 6-7× slower on the mix).
    # No clip needed: for k < n the k-th rounded sample lies strictly
    # between the center and the in-raster target (|2k·d + n| // 2n
    # <= |d| whenever k < n), so every gather is in-bounds.
    act = np.nonzero(n > 1)[0]  # rays with >= 1 intermediate sample
    k = 1
    while act.size:
        dra = dr[act]
        dca = dc[act]
        na = n[act]
        eta = et[act]
        rk = r0 + (2 * k * dra + na) // (2 * na)
        ck = c0 + (2 * k * dca + na) // (2 * na)
        ep = flat[rk * w + ck] - ev
        bad = ep * na > eta * k
        viol[act[bad]] = True
        k += 1
        act = act[(~bad) & (na > k)]
    return ~viol


def viewshed_stats_kernel(lum: np.ndarray) -> tuple[int, int, int, int]:
    vis = viewshed_visible(lum)
    wgt = (np.arange(vis.size, dtype=np.int64) % 97) + 1
    return (int(vis.size), int(vis.sum()),
            int(lum.ravel()[vis].sum()), int(wgt[vis].sum()))


def viewshed_stats(images: DataFrame) -> DataFrame:
    """Per-image viewshed stats from the center cell (map-only; see
    _int_terrain_op)."""
    return _int_terrain_op(
        images, viewshed_stats_kernel,
        ["n_px", "n_visible", "sum_vis_lum", "chk"],
        "n_px int, n_visible int, sum_vis_lum bigint, chk bigint",
    )


def pit_fill(lum_i: np.ndarray) -> np.ndarray:
    """DEPRESSION FILLING: filled(c) = max(elev(c), min over all
    border-reaching paths of the max elevation along the path) — the
    unique minimax fixpoint, so any evaluation order yields the same
    surface.  Engine: vectorized BELLMAN value iteration from a BIG
    interior (each pass is 8 shifted clamp-view minima — pure numpy;
    passes are bounded by the longest drainage chain, measured 84 ms
    heapq → ~6 ms per 128x128 on the fixture mix).  The golden twin
    settles cells ONE AT A TIME off a border-seeded priority-flood
    min-heap (Barnes et al. 2014, public literature) — a genuinely
    different algorithm arriving at the same fixpoint.
    Returns filled int64 (same shape)."""
    h, w = lum_i.shape
    BIG = np.int64(1) << 40
    border = np.zeros((h, w), dtype=bool)
    border[0, :] = border[-1, :] = True
    border[:, 0] = border[:, -1] = True
    filled = np.where(border, lum_i, BIG)
    # padded buffer so the 8 neighbor reads are contiguous SLICES
    # (views), not fancy-index gathers; the BIG pad ring never wins a
    # minimum, which matches the clamp-border SPEC on the pinned ring
    pad = np.full((h + 2, w + 2), BIG, dtype=np.int64)
    mn = np.empty((h, w), dtype=np.int64)
    while True:
        pad[1:-1, 1:-1] = filled
        mn[:] = BIG
        for dr, dc in _D8_OFFS:
            np.minimum(
                mn, pad[1 + dr:h + 1 + dr, 1 + dc:w + 1 + dc], out=mn
            )
        nxt = np.where(border, lum_i, np.maximum(lum_i, mn))
        if (nxt == filled).all():
            return filled
        filled = nxt


def pit_fill_stats_kernel(lum: np.ndarray) -> tuple[int, int, int, int]:
    # SPEC: n_raised = cells where filled > elev; sum_delta = total
    # fill volume; chk = sum(filled_i * wgt_i) (position-aware).
    filled = pit_fill(lum)
    delta = (filled - lum).ravel()
    wgt = (np.arange(delta.size, dtype=np.int64) % 97) + 1
    return (int(delta.size), int((delta > 0).sum()), int(delta.sum()),
            int((filled.ravel() * wgt).sum()))


def pit_fill_stats(images: DataFrame) -> DataFrame:
    """Per-image priority-flood pit-fill stats (map-only; see
    _int_terrain_op)."""
    return _int_terrain_op(
        images, pit_fill_stats_kernel,
        ["n_px", "n_raised", "sum_delta", "chk"],
        "n_px int, n_raised int, sum_delta bigint, chk bigint",
    )


# GLCM SPEC (shared with the golden twin): quantize q = min(15,
# elev // 16000) (16 gray levels over the 0..255000 milli-luma
# range); co-occurrence counts over the two directed offsets right
# (0,1) and down (1,0), UNNORMALIZED (integer counts).  Features:
#   contrast   = sum c(i,j) * (i-j)^2
#   energy     = sum c(i,j)^2
#   homog_mils = sum (1000 * c(i,j)) DIV (1 + (i-j)^2)
# All int64 — exact parity at any fold order.


def glcm_features(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """Gray-level co-occurrence texture features — the classic Haralick
    curation signal (flat/synthetic images separate from natural
    texture).  Engine: flat bincount over combined 16*qa+qb codes (the
    golden twin scatter-adds into a 16x16 matrix instead)."""
    q = np.minimum(lum_i // 16000, 15)
    pairs_h = (16 * q[:, :-1] + q[:, 1:]).ravel()
    pairs_v = (16 * q[:-1, :] + q[1:, :]).ravel()
    c = (np.bincount(pairs_h, minlength=256)
         + np.bincount(pairs_v, minlength=256)).astype(np.int64)
    i, j = np.divmod(np.arange(256, dtype=np.int64), 16)
    d2 = (i - j) * (i - j)
    return (
        int(pairs_h.size + pairs_v.size),
        int((c * d2).sum()),
        int((c * c).sum()),
        int(((1000 * c) // (1 + d2)).sum()),
    )


def glcm_stats(images: DataFrame) -> DataFrame:
    """Per-image GLCM texture stats (map-only; see _int_terrain_op)."""
    return _int_terrain_op(
        images, glcm_features,
        ["n_pairs", "contrast", "energy", "homog_mils"],
        "n_pairs int, contrast bigint, energy bigint, homog_mils bigint",
    )


# Quadtree SPEC (shared with the golden twin): over the square
# power-of-two luma DEM, a block is a LEAF iff max-min <= 8000
# (half a GLCM gray level); otherwise it splits into 4 quadrants.
# Because range is monotone under containment (child range <= parent
# range), the top-down split (engine) and the maximal-uniform-node
# selection on min/max pyramids (golden) produce the SAME leaf set.
_QT_THRESH = 8000


def quadtree_leaves(lum_i: np.ndarray) -> list[tuple[int, int, int]]:
    """Top-down quadtree decomposition of an int64 DEM; returns
    (depth, size, range) per leaf — the GeoTrellis-flavored
    homogeneous-block compression (quadtree cells are this engine's
    spatial index family; here the same structure adapts to CONTENT).

    Per-block ranges come from min/max pyramids built ONCE with
    strided numpy reductions (O(n) total, vs re-reducing each block
    slice in the DFS — measured 117 ms → 2 ms per 128x128 image);
    the DFS stack then decides splits with O(1) lookups.  The golden
    twin selects the same leaf set with level-wise uniformity MASKS
    instead of a traversal."""
    h, _w = lum_i.shape
    levels = int(h).bit_length() - 1
    mins, maxs = [lum_i], [lum_i]
    for _k in range(levels):
        a, b = mins[-1], maxs[-1]
        mins.append(np.minimum(
            np.minimum(a[0::2, 0::2], a[0::2, 1::2]),
            np.minimum(a[1::2, 0::2], a[1::2, 1::2])))
        maxs.append(np.maximum(
            np.maximum(b[0::2, 0::2], b[0::2, 1::2]),
            np.maximum(b[1::2, 0::2], b[1::2, 1::2])))
    leaves: list[tuple[int, int, int]] = []
    stack = [(0, 0, levels, 0)]  # (row, col, level k = log2 size, depth)
    while stack:
        r, c, k, d = stack.pop()
        rng = int(maxs[k][r, c] - mins[k][r, c])
        if rng <= _QT_THRESH or k == 0:
            leaves.append((d, 1 << k, rng))
        else:
            stack += [(2 * r, 2 * c, k - 1, d + 1),
                      (2 * r, 2 * c + 1, k - 1, d + 1),
                      (2 * r + 1, 2 * c, k - 1, d + 1),
                      (2 * r + 1, 2 * c + 1, k - 1, d + 1)]
    return leaves


def quadtree_stats_kernel(lum: np.ndarray) -> tuple[int, int, int, int, int]:
    # outputs: n_px, n_leaves, max_depth, sum_range (Σ leaf ranges),
    # sum_depth_px (Σ depth · leaf pixels — the weighted tree cost)
    leaves = quadtree_leaves(lum)
    return (
        int(lum.size),
        len(leaves),
        max(d for d, _s, _r in leaves),
        sum(r for _d, _s, r in leaves),
        sum(d * s * s for d, s, _r in leaves),
    )


def quadtree_stats(images: DataFrame) -> DataFrame:
    """Per-image quadtree-compression stats (map-only; see
    _int_terrain_op)."""
    return _int_terrain_op(
        images, quadtree_stats_kernel,
        ["n_px", "n_leaves", "max_depth", "sum_range", "sum_depth_px"],
        "n_px int, n_leaves int, max_depth int, sum_range bigint, "
        "sum_depth_px bigint",
    )


# ---------------------------------------------------------------------------
# Marching-squares contour extraction stats (r05) — the raster->vector
# contouring analogue (GeoTrellis-world: toVector/contour ops).
# ---------------------------------------------------------------------------

# SPEC shared with the golden twin: corner mask m = (lum >= iso);
# case(i,j) = m[i,j] + 2*m[i,j+1] + 4*m[i+1,j+1] + 8*m[i+1,j];
# segments per case: 0 for {0,15}, 2 for the saddles {5,10}, else 1.
CONTOUR_ISO = 128.0


def marching_squares_stats(lum: np.ndarray, iso: float = CONTOUR_ISO):
    """(n_cells, n_cells_crossed, n_segments, sum_case) of the
    marching-squares case grid — all integers, fold-order exact."""
    m = lum >= iso
    case = (
        m[:-1, :-1].astype(np.int64)
        + 2 * m[:-1, 1:].astype(np.int64)
        + 4 * m[1:, 1:].astype(np.int64)
        + 8 * m[1:, :-1].astype(np.int64)
    )
    segs = np.where(
        (case == 0) | (case == 15), 0, np.where((case == 5) | (case == 10), 2, 1)
    )
    return (
        int(case.size),
        int((segs > 0).sum()),
        int(segs.sum()),
        int(case.sum()),
    )


def contour_stats(images: DataFrame, iso: float = CONTOUR_ISO) -> DataFrame:
    """Per-image marching-squares contour stats at the iso-luminance
    level — decode -> threshold -> 2x2 case grid -> integer sums.
    Map-only mapInPandas like decode_stats/hillshade_stats: payload
    bytes never shuffle."""

    def _ms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for rr in pdf.itertuples(index=False):
                img = decode_image(bytes(rr.bytes), rr.fmt, int(rr.w), int(rr.h))
                lum = (
                    0.299 * img[:, :, 0].astype(np.float64)
                    + 0.587 * img[:, :, 1].astype(np.float64)
                    + 0.114 * img[:, :, 2].astype(np.float64)
                )
                out.append((rr.image_id,) + marching_squares_stats(lum, iso))
            yield pd.DataFrame(
                out,
                columns=["image_id", "n_cells", "n_crossed", "n_segments",
                         "sum_case"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _ms,
        "image_id string, n_cells int, n_crossed int, n_segments int, "
        "sum_case bigint",
    )


# ---------------------------------------------------------------------------
# r05 continuation: slope/aspect, Strahler order, histogram
# equalization, 3x3 morphology — all integer-exact map-only kernels
# ---------------------------------------------------------------------------

# slope/aspect SPEC (shared with the golden twin): Horn 3x3 gradients
# on the int64 milli-luma DEM under clamp (edge-replicate) borders —
#   gx = (tr + 2r + br) - (tl + 2l + bl)   (east-positive)
#   gy = (bl + 2b + br) - (tl + 2t + tr)   (south-positive)
# aspect octant (first-match rule, total + deterministic):
#   flat         iff gx == 0 and gy == 0          -> class -1
#   |gx| >  |gy| -> E(0) if gx > 0 else W(4)
#   |gy| >  |gx| -> S(2) if gy > 0 else N(6)
#   |gx| == |gy| -> SE(1)/SW(3)/NW(5)/NE(7) by the sign pair
# slope energy s2 = gx^2 + gy^2; steep iff s2 > _SA_STEEP.
_SA_STEEP = 10_000_000_000


def _horn_grads(lum_i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Clamp-border Horn gradients via an edge-replicated pad (the 8
    neighbor reads are contiguous slices — views, not gathers)."""
    h, w = lum_i.shape
    p = np.pad(lum_i, 1, mode="edge")
    tl, t, tr = p[:h, :w], p[:h, 1:w + 1], p[:h, 2:]
    le, ri = p[1:h + 1, :w], p[1:h + 1, 2:]
    bl, b, br = p[2:, :w], p[2:, 1:w + 1], p[2:, 2:]
    gx = (tr + 2 * ri + br) - (tl + 2 * le + bl)
    gy = (bl + 2 * b + br) - (tl + 2 * t + tr)
    return gx, gy


def slope_aspect_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Vectorized octant classification per the SPEC above (the golden
    twin runs a scalar per-pixel if/elif chain over np.ix_ clamp
    gathers instead).  Returns (n_px, n_flat, hist_chk, n_steep,
    sum_s2) — hist_chk = sum over octants of (k+1)*count_k."""
    gx, gy = _horn_grads(lum_i)
    ax, ay = np.abs(gx), np.abs(gy)
    flat = (gx == 0) & (gy == 0)
    octant = np.select(
        [
            ax > ay,            # E / W
            ay > ax,            # S / N
            (gx > 0) & (gy > 0),    # |gx|==|gy| diagonals
            (gx < 0) & (gy > 0),
            (gx < 0) & (gy < 0),
        ],
        [
            np.where(gx > 0, 0, 4),
            np.where(gy > 0, 2, 6),
            np.full(gx.shape, 1, dtype=np.int64),
            np.full(gx.shape, 3, dtype=np.int64),
            np.full(gx.shape, 5, dtype=np.int64),
        ],
        default=7,  # gx > 0, gy < 0 (NE); flats masked out below
    )
    cnt = np.bincount(octant[~flat].ravel(), minlength=8).astype(np.int64)
    s2 = gx * gx + gy * gy
    return (
        int(lum_i.size),
        int(flat.sum()),
        int((cnt * (np.arange(8, dtype=np.int64) + 1)).sum()),
        int((s2 > _SA_STEEP).sum()),
        int(s2.sum()),
    )


def slope_aspect_stats(images: DataFrame) -> DataFrame:
    """Per-image Horn slope/aspect stats (map-only; _int_terrain_op)."""
    return _int_terrain_op(
        images, slope_aspect_kernel,
        ["n_px", "n_flat", "hist_chk", "n_steep", "sum_s2"],
        "n_px int, n_flat bigint, hist_chk bigint, n_steep bigint, "
        "sum_s2 bigint",
    )


def strahler_orders(lum_i: np.ndarray) -> np.ndarray:
    """STRAHLER stream order over the D8 flow DAG: a cell with no
    upstream is order 1; otherwise order = m + 1 if >= 2 upstream
    cells attain the max upstream order m, else m.  Engine: ONE
    high-to-low elevation sweep (strict drop makes every upstream cell
    strictly higher, so its order is final before its target folds it
    in), maintaining per-cell (max upstream order, count at that max).
    The golden twin runs a memoized postorder DFS over the reverse
    adjacency instead.  Returns flat int64 orders."""
    flat_t = d8_targets(lum_i)
    n = flat_t.size
    order_v = [0] * n  # max upstream order seen so far
    cnt_v = [0] * n    # how many upstream attain it
    out = [1] * n
    tl = flat_t.tolist()
    high_to_low = np.argsort(lum_i.ravel(), kind="stable")[::-1]
    for i in high_to_low.tolist():
        o = 1
        if order_v[i] > 0:
            o = order_v[i] + 1 if cnt_v[i] >= 2 else order_v[i]
        out[i] = o
        t = tl[i]
        if t >= 0:
            if o > order_v[t]:
                order_v[t] = o
                cnt_v[t] = 1
            elif o == order_v[t]:
                cnt_v[t] += 1
    return np.asarray(out, dtype=np.int64)


def strahler_stats_kernel(lum: np.ndarray) -> tuple[int, int, int, int, int]:
    orders = strahler_orders(lum)
    wgt = (np.arange(orders.size, dtype=np.int64) % 97) + 1
    return (
        int(orders.size),
        int(orders.max()),
        int(orders.sum()),
        int((orders >= 2).sum()),
        int((wgt * orders).sum()),
    )


def strahler_stats(images: DataFrame) -> DataFrame:
    """Per-image Strahler-order stats (map-only; _int_terrain_op)."""
    return _int_terrain_op(
        images, strahler_stats_kernel,
        ["n_px", "max_order", "sum_order", "n_ge2", "chk"],
        "n_px int, max_order bigint, sum_order bigint, n_ge2 bigint, "
        "chk bigint",
    )


# hist-equalize SPEC (shared with the golden twin): v = lum // 1000
# (0..255), cdf = inclusive cumulative histogram, cdfmin = smallest
# nonzero cdf value, eq(v) = (cdf[v] - cdfmin) * 255 // max(npx -
# cdfmin, 1) — the classic integer equalization remap; a constant
# image maps to all-zeros.


def hist_equalize_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Vectorized bincount/cumsum equalization (the golden twin builds
    the CDF with a scalar counting dict).  Returns (n_px, sum_eq,
    n_levels_out, max_eq, chk) with chk = sum((idx%97+1) * eq_pixel)."""
    v = (lum_i // 1000).ravel()
    cnt = np.bincount(v, minlength=256).astype(np.int64)
    cdf = np.cumsum(cnt)
    npx = int(v.size)
    cdfmin = int(cdf[cnt.nonzero()[0][0]])
    denom = max(npx - cdfmin, 1)
    lut = (cdf - cdfmin) * 255 // denom
    eq = lut[v]
    wgt = (np.arange(npx, dtype=np.int64) % 97) + 1
    return (
        npx,
        int(eq.sum()),
        int(np.unique(eq).size),
        int(eq.max()),
        int((wgt * eq).sum()),
    )


def hist_equalize_stats(images: DataFrame) -> DataFrame:
    """Per-image histogram-equalization stats (map-only)."""
    return _int_terrain_op(
        images, hist_equalize_kernel,
        ["n_px", "sum_eq", "n_levels_out", "max_eq", "chk"],
        "n_px int, sum_eq bigint, n_levels_out bigint, max_eq bigint, "
        "chk bigint",
    )


# morphology SPEC (shared with the golden twin): 3x3 erosion = window
# min, dilation = window max, under clamp (edge-replicate) borders;
# gradient = dilate - erode; edge iff gradient > 20000 milli-luma.
_MORPH_EDGE = 20_000


def morphology_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Edge-replicated pad + 9 contiguous slices (views); the golden
    twin gathers each offset with np.ix_ clamp indices instead.
    Returns (n_px, sum_erode, sum_dilate, n_edge, chk) with chk =
    sum((idx%97+1) * gradient)."""
    h, w = lum_i.shape
    p = np.pad(lum_i, 1, mode="edge")
    er = lum_i.copy()
    di = lum_i.copy()
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            win = p[1 + dr:h + 1 + dr, 1 + dc:w + 1 + dc]
            np.minimum(er, win, out=er)
            np.maximum(di, win, out=di)
    grad = (di - er).ravel()
    wgt = (np.arange(grad.size, dtype=np.int64) % 97) + 1
    return (
        int(grad.size),
        int(er.sum()),
        int(di.sum()),
        int((grad > _MORPH_EDGE).sum()),
        int((wgt * grad).sum()),
    )


def morphology_stats(images: DataFrame) -> DataFrame:
    """Per-image 3x3 morphology stats (map-only)."""
    return _int_terrain_op(
        images, morphology_kernel,
        ["n_px", "sum_erode", "sum_dilate", "n_edge", "chk"],
        "n_px int, sum_erode bigint, sum_dilate bigint, n_edge bigint, "
        "chk bigint",
    )


def median3_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """3x3 MEDIAN FILTER under clamp borders — the order-statistic
    denoiser completing focal statistics (min/max live in morphology):
    median of 9 = the 5th smallest, exact integer.  Engine path:
    pad-slice stack + np.partition; the golden twin sorts np.ix_
    clamp gathers instead.  Returns (n_px, sum_med, n_changed,
    max_absdiff, chk)."""
    h, w = lum_i.shape
    p = np.pad(lum_i, 1, mode="edge")
    stack = np.stack(
        [p[r:r + h, c:c + w] for r in range(3) for c in range(3)]
    )
    med = np.partition(stack, 4, axis=0)[4]
    diff = np.abs(med - lum_i)
    wgt = (np.arange(lum_i.size, dtype=np.int64) % 97) + 1
    return (
        int(lum_i.size),
        int(med.sum()),
        int((med != lum_i).sum()),
        int(diff.max()),
        int((wgt * med.ravel()).sum()),
    )


def median3_stats(images: DataFrame) -> DataFrame:
    """Per-image 3x3 median-filter stats (map-only)."""
    return _int_terrain_op(
        images, median3_kernel,
        ["n_px", "sum_med", "n_changed", "max_absdiff", "chk"],
        "n_px int, sum_med bigint, n_changed bigint, max_absdiff bigint, "
        "chk bigint",
    )


def box_downscale_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """2x BOX-FILTER DOWNSCALE (one pyramid level): each output pixel
    is the integer mean of its 2x2 block — (a+b+c+d) DIV 4, exact at
    any partitioning (odd trailing row/col is dropped, the floor-size
    spec).  Engine path: strided SLICES (views) summed; the golden twin
    reshapes into blocks instead.  Returns (n_out, sum_ds, max_ds,
    min_ds, chk)."""
    h, w = lum_i.shape
    h2, w2 = h // 2, w // 2
    c = lum_i[: h2 * 2, : w2 * 2]
    ds = (
        c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2]
    ) // 4
    wgt = (np.arange(ds.size, dtype=np.int64) % 97) + 1
    return (
        int(ds.size),
        int(ds.sum()),
        int(ds.max()),
        int(ds.min()),
        int((wgt * ds.ravel()).sum()),
    )


def box_downscale_stats(images: DataFrame) -> DataFrame:
    """Per-image 2x box-downscale stats (map-only)."""
    return _int_terrain_op(
        images, box_downscale_kernel,
        ["n_out", "sum_ds", "max_ds", "min_ds", "chk"],
        "n_out int, sum_ds bigint, max_ds bigint, min_ds bigint, "
        "chk bigint",
    )


def otsu_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """OTSU THRESHOLD (exact): 256-bin histogram over lum DIV 1000,
    threshold t maximizing the between-class variance — compared as the
    EXACT rational (s0*N - S*w0)^2 / (w0*(N-w0)) via cross-multiplied
    arbitrary-precision Python ints (the squared numerator overflows
    int64 at real image sizes); strictly-greater keeps the SMALLEST t,
    so the argmax is deterministic.  Foreground = bins > t.  Engine
    path: np.bincount + vectorized cumsums feeding the scalar compare
    loop; the golden twin accumulates running sums incrementally and
    compares with fractions.Fraction instead.  Returns (thr, n_fg,
    sum_fg, chk)."""
    b = (lum_i // 1000).ravel()
    hist = np.bincount(b, minlength=256).astype(np.int64)
    csum = np.cumsum(hist)
    vsum = np.cumsum(hist * np.arange(256, dtype=np.int64))
    n_tot = int(b.size)
    s_tot = int(vsum[-1])
    best_t, best_num, best_den = -1, 0, 1
    for t in range(256):
        w0 = int(csum[t])
        if w0 == 0 or w0 == n_tot:
            continue
        num = int(vsum[t]) * n_tot - s_tot * w0
        den = w0 * (n_tot - w0)
        if best_t < 0 or num * num * best_den > best_num * best_num * den:
            best_t, best_num, best_den = t, num, den
    mask = b > best_t
    wgt = (np.arange(b.size, dtype=np.int64) % 97) + 1
    return (
        int(best_t),
        int(mask.sum()),
        int(lum_i.ravel()[mask].sum()),
        int((wgt * mask.astype(np.int64)).sum()),
    )


def otsu_stats(images: DataFrame) -> DataFrame:
    """Per-image Otsu binarization stats (map-only)."""
    return _int_terrain_op(
        images, otsu_kernel,
        ["thr", "n_fg", "sum_fg", "chk"],
        "thr int, n_fg bigint, sum_fg bigint, chk bigint",
    )


# TPI/TRI SPEC (shared with the golden twin): 8-neighborhood under
# clamp borders; TPI = 8*center - sum(neighbors), TRI = sum(|center -
# neighbor|); ridge/valley threshold on |TPI| in milli-luma units.
_TPI_T = 8_000


def tpi_tri_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int, int]:
    """Topographic Position Index + Terrain Ruggedness Index stats per
    the SPEC above, via an edge-replicated pad whose 8 neighbor reads
    are contiguous SLICES (views, never gathers — the morphology
    layout).  The golden twin uses np.ix_ clamp gathers instead."""
    h, w = lum_i.shape
    p = np.pad(lum_i, 1, mode="edge")
    nb = (
        p[:h, :w], p[:h, 1:w + 1], p[:h, 2:],
        p[1:h + 1, :w], p[1:h + 1, 2:],
        p[2:, :w], p[2:, 1:w + 1], p[2:, 2:],
    )
    s = np.zeros_like(lum_i)
    tri = np.zeros_like(lum_i)
    for b in nb:
        s += b
        tri += np.abs(lum_i - b)
    tpi = 8 * lum_i - s
    wgt = (np.arange(lum_i.size, dtype=np.int64) % 97) + 1
    return (
        int(lum_i.size),
        int(tri.sum()),
        int(tri.max()),
        int((tpi > _TPI_T).sum()),
        int((tpi < -_TPI_T).sum()),
        int((wgt * tri.ravel()).sum()),
    )


def tpi_tri_stats(images: DataFrame) -> DataFrame:
    """Per-image TPI/TRI terrain-index stats (map-only)."""
    return _int_terrain_op(
        images, tpi_tri_kernel,
        ["n_px", "sum_tri", "max_tri", "n_ridge", "n_valley", "chk"],
        "n_px int, sum_tri bigint, max_tri bigint, n_ridge bigint, "
        "n_valley bigint, chk bigint",
    )


def d8_flow_length(lum_i: np.ndarray) -> tuple[np.ndarray, int]:
    """DOWNSTREAM FLOW LENGTH along the D8 target chain to each cell's
    sink, with integer step weights 10 (cardinal) / 14 (diagonal —
    10*sqrt(2) truncated, the classic grid metric).  The step weight is
    decided by the EFFECTIVE displacement (clamped border offsets can
    degrade a diagonal to a cardinal move).  Engine path: vectorized
    POINTER JUMPING with additive lengths (L[i] += L[t[i]]; t = t[t]),
    O(log path) rounds — the same doubling primitive as watershed.
    The golden twin walks each chain scalar-memoized instead.
    Returns (flat int64 lengths, n_sinks)."""
    h, w = lum_i.shape
    t = d8_targets(lum_i)
    n = t.size
    idx = np.arange(n, dtype=np.int64)
    rr, cc = idx // w, idx % w
    tr, tc = np.where(t >= 0, t // w, rr), np.where(t >= 0, t % w, cc)
    diag = (tr != rr) & (tc != cc)
    length = np.where(t >= 0, np.where(diag, 14, 10), 0).astype(np.int64)
    ptr = np.where(t >= 0, t, idx)  # sinks self-loop with step 0
    while True:
        nxt = ptr[ptr]
        if (nxt == ptr).all():
            break
        length = length + length[ptr]
        ptr = nxt
    return length, int((t < 0).sum())


def flow_length_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    length, n_sinks = d8_flow_length(lum_i)
    wgt = (np.arange(length.size, dtype=np.int64) % 97) + 1
    return (
        int(length.size),
        n_sinks,
        int(length.sum()),
        int(length.max()),
        int((wgt * length).sum()),
    )


def flow_length_stats(images: DataFrame) -> DataFrame:
    """Per-image D8 downstream flow-length stats (map-only)."""
    return _int_terrain_op(
        images, flow_length_kernel,
        ["n_px", "n_sinks", "sum_len", "max_len", "chk"],
        "n_px int, n_sinks int, sum_len bigint, max_len bigint, "
        "chk bigint",
    )


def edt_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """EXACT squared EUCLIDEAN DISTANCE TRANSFORM to the nearest BRIGHT
    pixel (luma >= 128000) — the exact companion to cost-distance's
    chamfer 3-4 approximation.  Uses the separable decomposition
    (2D EDT = 1D row pass over the 1D column pass, a theorem): pass 1
    is the binary nearest-seed column scan (two sweeps), pass 2
    minimizes d1 + (x-x')^2 via a VECTORIZED exact broadcast over
    column offsets — O(n*w) with tile-bounded w, the right
    constant-factor choice on SIMD for fixed tile sizes.  The golden
    twin runs the asymptotically-linear Felzenszwalb-Huttenlocher
    lower-envelope instead, with exact Fraction hull intersections —
    two genuinely different algorithms meeting at the same exact
    integer transform.  All-integer outputs; images with no bright
    pixel emit the -1 sentinel.  Returns (n_px, n_fg, sum_d2, max_d2,
    chk)."""
    h, w = lum_i.shape
    mask = lum_i >= 128_000
    n_px = int(lum_i.size)
    if not mask.any():
        return (n_px, 0, -1, -1, -1)
    big = 10 * (h + w)  # pseudo-INF seed distance; big^2 dominates any
    # true d2 <= h^2 + w^2 while staying far from int64 overflow
    last = np.full(w, -big, dtype=np.int64)
    d1 = np.empty((h, w), dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    for y in range(h):
        last = np.where(mask[y], ys[y], last)
        d1[y] = ys[y] - last
    nxt = np.full(w, 2 * big, dtype=np.int64)
    for y in range(h - 1, -1, -1):
        nxt = np.where(mask[y], ys[y], nxt)
        d1[y] = np.minimum(d1[y], nxt - ys[y])
    d1 *= d1
    xs = np.arange(w, dtype=np.int64)
    off2 = (xs[:, None] - xs[None, :]) ** 2  # (x, x') -> (x-x')^2
    dt = (d1[:, None, :] + off2[None, :, :]).min(axis=2)
    wgt = (np.arange(dt.size, dtype=np.int64) % 97) + 1
    return (
        n_px,
        int(mask.sum()),
        int(dt.sum()),
        int(dt.max()),
        int((wgt * dt.ravel()).sum()),
    )


def edt_stats(images: DataFrame) -> DataFrame:
    """Per-image exact-EDT stats (map-only)."""
    return _int_terrain_op(
        images, edt_kernel,
        ["n_px", "n_fg", "sum_d2", "max_d2", "chk"],
        "n_px int, n_fg bigint, sum_d2 bigint, max_d2 bigint, chk bigint",
    )


def fft_sharpness_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """FFT SHARPNESS: 2-D real FFT of the exact milli-luma raster;
    high-frequency = wavenumber radius^2 beyond (min(h,w)//4)^2 with
    folded row frequencies fu = min(u, h-u) — a pure-integer mask.
    Energy ratio quantizes to micros through one shared double chain;
    the dominant non-DC frequency is the FIRST argmax (deterministic).
    Returns (n_px, hf_ratio_micros, peak_u, peak_v)."""
    h, w = lum_i.shape
    spec = np.fft.rfft2(lum_i.astype(np.float64))
    p = (spec * np.conj(spec)).real
    fu = np.minimum(np.arange(h), h - np.arange(h))[:, None]
    fv = np.arange(p.shape[1])[None, :]
    r2 = fu * fu + fv * fv
    thr = (min(h, w) // 4) ** 2
    total = float(p.sum() - p[0, 0])  # DC excluded from both sides
    hf = float(p[r2 > thr].sum())
    ratio = int(np.floor(hf / total * 1_000_000.0)) if total > 0 else -1
    pm = p.copy()
    pm[0, 0] = -1.0
    k = int(np.argmax(pm))  # first max, row-major
    return (int(lum_i.size), ratio, k // p.shape[1], k % p.shape[1])


def fft_sharpness_stats(images: DataFrame) -> DataFrame:
    """Per-image FFT sharpness stats (map-only)."""
    return _int_terrain_op(
        images, fft_sharpness_kernel,
        ["n_px", "hf_ratio_micros", "peak_u", "peak_v"],
        "n_px int, hf_ratio_micros bigint, peak_u int, peak_v int",
    )


# SSIM constants at milli-luma scale: C1 = (0.01 * 255000)^2,
# C2 = (0.03 * 255000)^2 — the standard stabilizers.
_SSIM_C1 = 6_502_500.0
_SSIM_C2 = 58_522_500.0


def ssim_recon_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """GLOBAL SSIM between the image and its 2x box-downscale +
    nearest-upsample RECONSTRUCTION — the perceptual quality metric
    beyond PSNR (X3 family): a pyramid level's information loss as a
    curation signal.  All moment sums (Sx, Sy, Sxx, Syy, Sxy) are
    EXACT int64 over milli-luma; the closed-form SSIM evaluates once
    per image in doubles with SPEC'd expression order and quantizes to
    micros with one FLOOR.  Returns (n, sum_y, ssim_micros, chk)."""
    h, w = lum_i.shape
    h2, w2 = h // 2, w // 2
    c = lum_i[: h2 * 2, : w2 * 2]
    ds = (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2]
          + c[1::2, 1::2]) // 4
    recon = np.repeat(np.repeat(ds, 2, axis=0), 2, axis=1)
    x = c.astype(np.int64)
    y = recon.astype(np.int64)
    n = int(x.size)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    sxy = int((x * y).sum())
    mx = sx / n
    my = sy / n
    vx = sxx / n - mx * mx
    vy = syy / n - my * my
    cov = sxy / n - mx * my
    ssim = ((2.0 * mx * my + _SSIM_C1) * (2.0 * cov + _SSIM_C2)) / (
        (mx * mx + my * my + _SSIM_C1) * (vx + vy + _SSIM_C2)
    )
    wgt = (np.arange(y.size, dtype=np.int64) % 97) + 1
    return (
        n, sy, int(np.floor(ssim * 1_000_000.0)),
        int((wgt * y.ravel()).sum()),
    )


def ssim_recon_stats(images: DataFrame) -> DataFrame:
    """Per-image reconstruction-SSIM stats (map-only)."""
    return _int_terrain_op(
        images, ssim_recon_kernel,
        ["n_px", "sum_recon", "ssim_micros", "chk"],
        "n_px int, sum_recon bigint, ssim_micros bigint, chk bigint",
    )


# FAST-12: the standard Bresenham radius-3 circle, clockwise from
# 12 o'clock — (dr, dc) offsets; threshold in milli-luma.
FAST_CIRCLE = [
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2),
    (-3, -1),
]
FAST_T = 3_000


def fast_corner_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """FAST-12 segment test on milli-luma: corner iff >= 12 CONTIGUOUS
    circle neighbors (circular) are all > center + t (bright) or all
    < center - t (dark).  Engine mechanics: 16 shifted views -> bool
    stacks -> doubled-axis slice-ANDs over every 12-length arc; the
    golden twin routes the same packed 16-bit codes through a
    scalar-built 65536-entry max-circular-run lookup instead.
    Returns (n_interior, n_corners, n_bright, n_dark, chk)."""
    h, w = lum_i.shape
    if h < 7 or w < 7:
        return (0, 0, 0, 0, 0)
    c = lum_i[3:h - 3, 3:w - 3]
    bright = np.stack([
        lum_i[3 + dr:h - 3 + dr, 3 + dc:w - 3 + dc] > c + FAST_T
        for dr, dc in FAST_CIRCLE
    ])
    dark = np.stack([
        lum_i[3 + dr:h - 3 + dr, 3 + dc:w - 3 + dc] < c - FAST_T
        for dr, dc in FAST_CIRCLE
    ])

    def arc12(m):
        mm = np.concatenate([m, m], axis=0)
        hit = np.zeros(m.shape[1:], dtype=bool)
        for s in range(16):
            hit |= mm[s:s + 12].all(axis=0)
        return hit

    b_hit = arc12(bright)
    d_hit = arc12(dark)
    corner = b_hit | d_hit
    wgt = (np.arange(corner.size, dtype=np.int64) % 97) + 1
    return (
        int(corner.size),
        int(corner.sum()),
        int(b_hit.sum()),
        int(d_hit.sum()),
        int((wgt * corner.ravel().astype(np.int64)).sum()),
    )


def fast_corner_stats(images: DataFrame) -> DataFrame:
    """Per-image FAST-12 corner stats (map-only)."""
    return _int_terrain_op(
        images, fast_corner_kernel,
        ["n_interior", "n_corners", "n_bright", "n_dark", "chk"],
        "n_interior int, n_corners bigint, n_bright bigint, "
        "n_dark bigint, chk bigint",
    )


# Fixed-point inverse-rotation matrix for the bilinear affine op:
# 30 degrees, 16.16 literals — the SPEC both twins share.
AFFINE_COS_FP = 56756  # round(cos(30deg) * 65536)
AFFINE_SIN_FP = 32768  # round(sin(30deg) * 65536)


def affine_bilinear_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """30-degree rotation about the image center with FIXED-POINT
    BILINEAR resampling: source coordinates on a DOUBLED grid stay
    integral (dr2 = 2r - (h-1)), the inverse map is the 16.16 integer
    matrix above, and the bilinear weights quantize to 1/256 BEFORE
    the blend — every output pixel is one exact integer expression, so
    the result is hash-stable at any partitioning.  Out-of-bounds
    samples are skipped (counted).  Engine mechanics: flat
    fancy-indexing over index arrays; the golden twin gathers through
    four np.take calls on clamped indices instead.  Returns
    (n_sampled, sum_out, max_out, chk)."""
    h, w = lum_i.shape
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    dr2 = 2 * r - (h - 1)
    dc2 = 2 * c - (w - 1)
    # inverse rotation: source = R(-theta) . out
    su2 = AFFINE_COS_FP * dc2 + AFFINE_SIN_FP * dr2  # doubled col, fp16
    sv2 = -AFFINE_SIN_FP * dc2 + AFFINE_COS_FP * dr2  # doubled row, fp16
    sc2 = su2 + (w - 1) * 65536
    sr2 = sv2 + (h - 1) * 65536
    # integer floor / fractional part on the doubled fp grid
    c0 = sc2 // 131072
    r0 = sr2 // 131072
    fc = (sc2 - c0 * 131072) * 256 // 131072  # 0..255
    fr = (sr2 - r0 * 131072) * 256 // 131072
    ok = (r0 >= 0) & (r0 + 1 < h) & (c0 >= 0) & (c0 + 1 < w)
    r0c = np.clip(r0, 0, h - 2)
    c0c = np.clip(c0, 0, w - 2)
    p00 = lum_i[r0c, c0c]
    p01 = lum_i[r0c, c0c + 1]
    p10 = lum_i[r0c + 1, c0c]
    p11 = lum_i[r0c + 1, c0c + 1]
    out = (
        (256 - fr) * ((256 - fc) * p00 + fc * p01)
        + fr * ((256 - fc) * p10 + fc * p11)
    ) // 65536
    out = np.where(ok, out, 0)
    wgt = (np.arange(out.size, dtype=np.int64) % 97) + 1
    return (
        int(ok.sum()),
        int(out.sum()),
        int(out.max()),
        int((wgt * out.ravel()).sum()),
    )


def affine_bilinear_stats(images: DataFrame) -> DataFrame:
    """Per-image fixed-point bilinear rotation stats (map-only)."""
    return _int_terrain_op(
        images, affine_bilinear_kernel,
        ["n_sampled", "sum_out", "max_out", "chk"],
        "n_sampled bigint, sum_out bigint, max_out bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Hough line transform (r05 wave 23) — dominant-line detection over the
# Sobel edge map, ALL INTEGER.  SPEC shared by both twins:
#   edges  = sobel L1 magnitude > SOBEL_EDGE_T (the certified edge map)
#   theta  = 12 bins at 15-degree spacing; cos/sin as 10-bit fixed-point
#            LITERALS (the tables below)
#   rho    = (c*cos_fp + r*sin_fp) // 4096  (floor; 4-pixel rho bins)
#   key    = theta*1536 + rho + 512; votes accumulate per key
#   best   = max votes, ties broken to the SMALLEST (theta, rho) —
#            exactly np.argmax over the flat accumulator
#   chk    = sum over cells of votes^2 * (key + 1)  (order-free)
# ---------------------------------------------------------------------------

HOUGH_COS_FP = (1024, 989, 887, 724, 512, 265, 0,
                -265, -512, -724, -887, -989)
HOUGH_SIN_FP = (0, 265, 512, 724, 887, 989, 1024,
                989, 887, 724, 512, 265)
HOUGH_RHO_Q = 4096   # fp10 rho quantized into 4-pixel bins
HOUGH_OFF = 512      # rho-bin offset (rho >= -1024*max(h,w)/4096)
HOUGH_W = 1536       # accumulator stride per theta bin


def hough_lines_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Dominant Hough line of an int64 luma raster.  Engine mechanics:
    12 bincount passes summed into one flat accumulator (the golden
    twin scatters with np.add.at into a (12, W) matrix instead, over a
    clamp-indexed edge map).  Returns
    (n_edges, best_votes, best_theta, best_rho, chk)."""
    h, w = lum_i.shape
    assert h + w < (HOUGH_W - HOUGH_OFF) * HOUGH_RHO_Q // 1024, "raster too large"
    mag = sobel_mag(lum_i)
    er, ec = np.nonzero(mag > SOBEL_EDGE_T)
    n_edges = int(er.size)
    if n_edges == 0:
        return (0, 0, -1, 0, 0)
    er = er.astype(np.int64)
    ec = ec.astype(np.int64)
    acc = np.zeros(12 * HOUGH_W, dtype=np.int64)
    for t in range(12):
        rb = (ec * HOUGH_COS_FP[t] + er * HOUGH_SIN_FP[t]) // HOUGH_RHO_Q
        acc += np.bincount(t * HOUGH_W + rb + HOUGH_OFF,
                           minlength=12 * HOUGH_W)
    best = int(np.argmax(acc))  # first max == smallest (theta, rho)
    keys = np.arange(acc.size, dtype=np.int64)
    chk = int((acc * acc * (keys + 1)).sum())
    return (n_edges, int(acc[best]), best // HOUGH_W,
            best % HOUGH_W - HOUGH_OFF, chk)


# ---------------------------------------------------------------------------
# Hysteresis edge linking (r05 wave 25) — the two-threshold Canny
# stage: weak edges survive only when 8-connected (through weak
# pixels) to a strong edge.  SPEC shared by both twins:
#   mag     = Sobel L1 magnitude (the certified edge map)
#   weak    = mag > SOBEL_EDGE_T;  strong = mag > CANNY_STRONG_T
#   final   = strong ∪ {weak pixels 8-connected to strong via weak}
#   chk     = sum of (flat_index + 1) over final pixels  (order-free)
# ---------------------------------------------------------------------------

CANNY_STRONG_T = 220_000  # strong-edge gate in luma milli-units


def canny_hysteresis_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """Engine mechanics: vectorized binary propagation — final starts
    at strong and repeatedly ORs in its 8-dilation masked to weak
    until the fixpoint (each sweep advances the frontier one pixel;
    the golden twin runs a scalar BFS flood with a deque instead).
    The fixpoint is the unique connected closure, so both mechanics
    meet exactly.  Returns (n_weak, n_strong, n_final, chk)."""
    mag = sobel_mag(lum_i)
    weak = mag > SOBEL_EDGE_T
    strong = mag > CANNY_STRONG_T
    cur = strong.copy()
    while True:
        z = np.pad(cur, 1, mode="constant")
        dil = (
            z[:-2, :-2] | z[:-2, 1:-1] | z[:-2, 2:]
            | z[1:-1, :-2] | cur | z[1:-1, 2:]
            | z[2:, :-2] | z[2:, 1:-1] | z[2:, 2:]
        )
        nxt = dil & weak
        if (nxt == cur).all():
            break
        cur = nxt
    idx = np.flatnonzero(cur).astype(np.int64)
    return (
        int(weak.sum()), int(strong.sum()), int(cur.sum()),
        int((idx + 1).sum()),
    )


def canny_hysteresis_stats(images: DataFrame) -> DataFrame:
    """Per-image hysteresis edge stats (map-only)."""
    return _int_terrain_op(
        images, canny_hysteresis_kernel,
        ["n_weak", "n_strong", "n_final", "chk"],
        "n_weak bigint, n_strong bigint, n_final bigint, chk bigint",
    )


def hough_lines_stats(images: DataFrame) -> DataFrame:
    """Per-image dominant-line Hough stats (map-only)."""
    return _int_terrain_op(
        images, hough_lines_kernel,
        ["n_edges", "best_votes", "best_theta", "best_rho", "chk"],
        "n_edges bigint, best_votes bigint, best_theta bigint, "
        "best_rho bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Harris corner response (r05 wave 26) — the classical corner detector
# next to FAST-12, ALL INTEGER.  SPEC shared by both twins:
#   g        = milli-luma // 1000 (0..255 gray — keeps every Harris
#              product inside int64: |gx| <= 1020, 3x3 window sums of
#              squares <= 9.4e6, det terms <= ~8.8e13, R in +-2e15)
#   gx, gy   = Sobel on g (1-px border off)
#   Sxx/Syy/Sxy = 3x3 box sums of gx*gx / gy*gy / gx*gy (1 more px off)
#   R        = 20*(Sxx*Syy - Sxy*Sxy) - (Sxx + Syy)^2    (k = 0.05,
#              scaled by 20 so it stays an exact integer)
#   corner   = R > HARRIS_T  AND  R >= all 8 neighbors  AND  R > every
#              raster-EARLIER neighbor (deterministic NMS under ties)
#   evaluated on the 3-px-border interior of the original raster
#   sum_rq   = sum over that interior of max(R, 0) // 65536
#   chk      = sum of (flat_index + 1) over corner pixels (order-free)
# ---------------------------------------------------------------------------

HARRIS_T = 50_000_000  # response gate (scaled-R units; the synthetic
# fixture is smooth — its per-image max responses sit at ~8e7 median /
# 2.5e8 max, so 5e7 fires on real structure and stays off flat areas)


def harris_corner_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Engine mechanics: shifted-slice Sobel + slice-add box sums +
    eight vectorized neighbor comparisons (the golden twin gathers
    gradients through np.ix_ clamp indexes, box-sums via a summed-area
    table, and runs NMS as a scalar loop over candidates — three
    independent mechanisms, same SPEC).  Returns
    (n_interior, n_corners, sum_rq, max_r, chk)."""
    g = lum_i // 1000
    tl, t, tr = g[:-2, :-2], g[:-2, 1:-1], g[:-2, 2:]
    le, r = g[1:-1, :-2], g[1:-1, 2:]
    bl, b, br = g[2:, :-2], g[2:, 1:-1], g[2:, 2:]
    gx = (tr + 2 * r + br) - (tl + 2 * le + bl)
    gy = (bl + 2 * b + br) - (tl + 2 * t + tr)

    def box3(a: np.ndarray) -> np.ndarray:
        return (
            a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
            + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
            + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
        )

    sxx = box3(gx * gx)
    syy = box3(gy * gy)
    sxy = box3(gx * gy)
    resp = 20 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
    core = resp[1:-1, 1:-1]
    hh, ww = resp.shape
    ok = core > HARRIS_T
    for dr, dc in ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                   (0, 1), (1, -1), (1, 0), (1, 1)):
        nb = resp[1 + dr:hh - 1 + dr, 1 + dc:ww - 1 + dc]
        if dr < 0 or (dr == 0 and dc < 0):  # raster-earlier: strict
            ok &= core > nb
        else:
            ok &= core >= nb
    idx = np.flatnonzero(ok).astype(np.int64)
    return (
        int(core.size),
        int(ok.sum()),
        int((np.maximum(core, 0) // 65536).sum()),
        int(core.max()) if core.size else 0,
        int((idx + 1).sum()),
    )


def harris_corner_stats(images: DataFrame) -> DataFrame:
    """Per-image Harris corner stats (map-only)."""
    return _int_terrain_op(
        images, harris_corner_kernel,
        ["n_interior", "n_corners", "sum_rq", "max_r", "chk"],
        "n_interior bigint, n_corners bigint, sum_rq bigint, "
        "max_r bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Zhang-Suen skeletonization (r05 wave 27) — morphological thinning to
# a 1-px skeleton, the classical shape-analysis reduction.  SPEC shared
# by both twins:
#   fg      = (milli-luma // 1000) > SKEL_T   (0/1 raster)
#   neighbors P2..P9 clockwise from North; outside the raster = 0
#   B       = P2+...+P9;  A = # of 0->1 transitions in the circular
#             sequence P2,P3,...,P9,P2
#   sub-pass 1 deletes p when: fg, 2<=B<=6, A==1, P2*P4*P6==0, P4*P6*P8==0
#   sub-pass 2 deletes p when: fg, 2<=B<=6, A==1, P2*P4*P8==0, P2*P6*P8==0
#   deletions are SYNCHRONOUS per sub-pass; iterate full (two-sub-pass)
#   sweeps until a sweep changes nothing; n_iters counts all sweeps
#   (including the final unchanged one) — a deterministic fixpoint
#   chk     = sum of (flat_index + 1) over skeleton pixels (order-free)
# ---------------------------------------------------------------------------

SKEL_T = 128  # binarize gate on the 0..255 gray raster


def _zs_neighbors(fg: np.ndarray):
    """P2..P9 as shifted zero-padded slices (engine mechanics; the
    golden twin packs them into an 8-bit code and drives 256-entry
    LUTs built with scalar loops instead)."""
    z = np.pad(fg, 1)
    return (z[:-2, 1:-1], z[:-2, 2:], z[1:-1, 2:], z[2:, 2:],
            z[2:, 1:-1], z[2:, :-2], z[1:-1, :-2], z[:-2, :-2])


def _zs_luts():
    """256-entry delete-predicate LUTs per sub-pass, built VECTORIZED
    (np.arange bit arithmetic — the golden twin builds its LUTs with
    scalar loops, keeping construction independent).  Bit k of a code
    holds P(2+k).  r05 perf pass: the per-sweep work drops from ~20
    full-raster int64 ops to 8 uint8 shift/ors + one np.take
    (measured 12.3 s -> see BENCH/BASELINE.md on the 417-image
    harness set)."""
    codes = np.arange(256, dtype=np.int64)
    p = [(codes >> k) & 1 for k in range(8)]
    b = sum(p)
    a = sum((p[k] == 0) & (p[(k + 1) % 8] == 1) for k in range(8))
    base = (b >= 2) & (b <= 6) & (a == 1)
    lut0 = base & (p[0] * p[2] * p[4] == 0) & (p[2] * p[4] * p[6] == 0)
    lut1 = base & (p[0] * p[2] * p[6] == 0) & (p[0] * p[4] * p[6] == 0)
    return lut0.astype(np.uint8), lut1.astype(np.uint8)


_ZS_LUT = _zs_luts()


def zhang_suen_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """Returns (n_fg, n_skel, n_iters, chk)."""
    g = lum_i // 1000
    fg = (g > SKEL_T).astype(np.uint8)
    n_fg = int(fg.sum())
    it = 0
    while True:
        changed = False
        for sub in (0, 1):
            nbs = _zs_neighbors(fg)
            code = nbs[0].copy()
            for k in range(1, 8):
                code |= nbs[k] << k
            kill = fg & np.take(_ZS_LUT[sub], code)
            if kill.any():
                fg &= ~kill & 1
                changed = True
        it += 1
        if not changed:
            break
    idx = np.flatnonzero(fg).astype(np.int64)
    return (n_fg, int(fg.sum()), it, int((idx + 1).sum()))


def zhang_suen_stats(images: DataFrame) -> DataFrame:
    """Per-image skeletonization stats (map-only)."""
    return _int_terrain_op(
        images, zhang_suen_kernel,
        ["n_fg", "n_skel", "n_iters", "chk"],
        "n_fg bigint, n_skel bigint, n_iters bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Local Binary Patterns (r05 wave 29) — the classical texture code next
# to GLCM.  SPEC shared by both twins:
#   g       = milli-luma // 1000 (0..255 gray)
#   code(p) = sum over k of 2^k * [neighbor_k(p) >= p], neighbors
#             P2..P9 clockwise from North (interior pixels only)
#   uniform = code whose circular 0<->1 transition count is <= 2
#             (the Ojala uniform-pattern class)
#   chk     = sum of code * ((flat_index % 97) + 1)  (order-free)
# ---------------------------------------------------------------------------


def lbp_texture_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int]:
    """Engine mechanics: 8 shifted-slice comparisons summed with
    bit-shift weights, transitions counted arithmetically (the golden
    twin packs the same comparisons through 256-entry LUTs built with
    scalar loops).  Returns (n_interior, n_uniform, sum_code, chk)."""
    g = lum_i // 1000
    c = g[1:-1, 1:-1]
    nbs = (g[:-2, 1:-1], g[:-2, 2:], g[1:-1, 2:], g[2:, 2:],
           g[2:, 1:-1], g[2:, :-2], g[1:-1, :-2], g[:-2, :-2])
    bits = [(nb >= c).astype(np.int64) for nb in nbs]
    code = sum(b << k for k, b in enumerate(bits))
    trans = sum(
        (bits[k] != bits[(k + 1) % 8]).astype(np.int64) for k in range(8)
    )
    uniform = trans <= 2
    wgt = (np.arange(code.size, dtype=np.int64) % 97) + 1
    return (
        int(code.size),
        int(uniform.sum()),
        int(code.sum()),
        int((wgt * code.ravel()).sum()),
    )


def lbp_texture_stats(images: DataFrame) -> DataFrame:
    """Per-image LBP texture stats (map-only)."""
    return _int_terrain_op(
        images, lbp_texture_kernel,
        ["n_interior", "n_uniform", "sum_code", "chk"],
        "n_interior bigint, n_uniform bigint, sum_code bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Canny directional non-maximum suppression (r05 wave 29) — the thin-
# edge stage between sobel_mag and canny_hysteresis.  SPEC shared by
# both twins (all-integer, cross-multiplied angle tests):
#   gx, gy   = Sobel on milli-luma (the certified gradient)
#   mag      = |gx| + |gy|;  raw edge when mag > SOBEL_EDGE_T
#   direction (22.5-degree sectors, TAN22_FP = 106 ~ tan(22.5)*256):
#     E-W   when 256*|gy| <= 106*|gx|
#     N-S   when 256*|gx| <= 106*|gy|
#     diag 45 (NE-SW) when gx*gy > 0 else diag 135 (NW-SE)
#   survive  = raw edge AND mag > mag(forward nb) AND mag >= mag(back
#              nb) (back = the raster-earlier one — deterministic ties)
#   evaluated on the 2-px-border interior; chk = sum (flat_index+1)
# ---------------------------------------------------------------------------

TAN22_FP = 106  # round(tan(22.5 deg) * 256)


def canny_nms_kernel(lum_i: np.ndarray) -> tuple[int, int, int]:
    """Engine mechanics: vectorized sector masks + four pairs of
    shifted magnitude slices (the golden twin walks candidates with a
    scalar loop resolving each pixel's sector independently).
    Returns (n_raw, n_thin, chk)."""
    tl, t, tr = lum_i[:-2, :-2], lum_i[:-2, 1:-1], lum_i[:-2, 2:]
    le, r = lum_i[1:-1, :-2], lum_i[1:-1, 2:]
    bl, b, br = lum_i[2:, :-2], lum_i[2:, 1:-1], lum_i[2:, 2:]
    gx = (tr + 2 * r + br) - (tl + 2 * le + bl)
    gy = (bl + 2 * b + br) - (tl + 2 * t + tr)
    mag = np.abs(gx) + np.abs(gy)
    ax, ay = np.abs(gx), np.abs(gy)
    ew = 256 * ay <= TAN22_FP * ax
    ns = 256 * ax <= TAN22_FP * ay
    d45 = ~ew & ~ns & (gx * gy > 0)
    d135 = ~ew & ~ns & ~d45
    core = mag[1:-1, 1:-1]
    hh, ww = mag.shape

    def sh(dr, dc):
        return mag[1 + dr:hh - 1 + dr, 1 + dc:ww - 1 + dc]

    # (forward, back) neighbor offsets per sector; back = raster-earlier
    # NOTE image rows grow DOWNWARD: gy>0 means south-brighter, so the
    # 45-degree sector (gx*gy>0) runs along the NE-SW *image* diagonal
    # (-1,+1)/(+1,-1) in (row, col) steps
    pairs = {
        "ew": ((0, 1), (0, -1)),
        "ns": ((1, 0), (-1, 0)),
        "d45": ((1, 1), (-1, -1)),
        "d135": ((1, -1), (-1, 1)),
    }
    sec = {"ew": ew[1:-1, 1:-1], "ns": ns[1:-1, 1:-1],
           "d45": d45[1:-1, 1:-1], "d135": d135[1:-1, 1:-1]}
    raw = core > SOBEL_EDGE_T
    keep = np.zeros_like(raw)
    for s, ((fr, fc), (br_, bc)) in pairs.items():
        m = sec[s] & raw & (core > sh(fr, fc)) & (core >= sh(br_, bc))
        keep |= m
    idx = np.flatnonzero(keep).astype(np.int64)
    return (int(raw.sum()), int(keep.sum()), int((idx + 1).sum()))


def canny_nms_stats(images: DataFrame) -> DataFrame:
    """Per-image thin-edge stats (map-only)."""
    return _int_terrain_op(
        images, canny_nms_kernel,
        ["n_raw", "n_thin", "chk"],
        "n_raw bigint, n_thin bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Floyd-Steinberg dithering (r05 wave 30) — 1-bit halftoning with
# integer error diffusion.  SPEC shared by both twins:
#   g        = milli-luma // 1000 (0..255 gray), int64 working copy
#   scan rows top-down, columns left-to-right; at each pixel
#     on  = value >= 128;  e = value - (255 if on else 0)
#   diffuse with FLOOR division (numpy //, true floor on negatives):
#     right (r, c+1)       += e * 7 // 16
#     below-left (r+1,c-1) += e * 3 // 16
#     below (r+1, c)       += e * 5 // 16
#     below-right (r+1,c+1)+= e * 1 // 16
#   out-of-raster targets are dropped; chk = sum (flat_index + 1) over
#   ON pixels (order-free given the deterministic scan)
# ---------------------------------------------------------------------------


def dither_fs_kernel(lum_i: np.ndarray) -> tuple[int, int, int]:
    """Engine mechanics: plain-Python row lists (the golden twin runs a
    fully scalar dict-free 2-D list walk).  Error diffusion is
    inherently sequential — each pixel's decision depends on its left
    and upper neighbors' residuals — so this stays a per-image kernel
    behind the map-only decode path.  r06: the inner loop was rewritten
    from per-element numpy indexing (``int(cur[c])`` / ``cur[c+1] +=``,
    ~150 ns each) to Python-int list ops with an ``e == 0`` skip —
    bit-identical, measured 3.4× at every fixture raster size (an
    anti-diagonal wavefront vectorization was ALSO bit-identical but
    only broke even: diagonals are ≤ h elements, so per-diagonal numpy
    dispatch overhead swallowed the vector win).
    Returns (n_px, n_on, chk)."""
    g = lum_i // 1000
    h, w = g.shape
    rows = g.tolist()
    cur = rows[0]
    chk = 0
    n_on = 0
    for r in range(h):
        nxt = rows[r + 1] if r + 1 < h else None
        rw1 = r * w + 1
        for c in range(w):
            v = cur[c]
            if v >= 128:
                n_on += 1
                chk += rw1 + c
                e = v - 255
            else:
                e = v
            if e:
                if c + 1 < w:
                    cur[c + 1] += e * 7 // 16
                if nxt is not None:
                    if c:
                        nxt[c - 1] += e * 3 // 16
                    nxt[c] += e * 5 // 16
                    if c + 1 < w:
                        nxt[c + 1] += e * 1 // 16
        if nxt is not None:
            cur = nxt
    return (h * w, n_on, chk)


def dither_fs_stats(images: DataFrame) -> DataFrame:
    """Per-image Floyd-Steinberg dither stats (map-only)."""
    return _int_terrain_op(
        images, dither_fs_kernel,
        ["n_px", "n_on", "chk"],
        "n_px bigint, n_on bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Difference-of-Gaussians blob detection (r05 wave 31) — completes the
# keypoint triad (Harris corners / Canny edges / DoG blobs).  SPEC
# shared by both twins, ALL INTEGER:
#   g     = milli-luma as-is (the extra x1000 resolution matters: the
#           synthetic fixture is smooth, gray-unit DoG rounds to ~2)
#   blur  = separable binomial (1,4,6,4,1) in rows then cols, ONE floor
#           division by 256 at the end (valid interior only: 2 px per
#           blur level, no padding)
#   b1 = blur(g); b2 = blur(b1); dog = b1[2:-2, 2:-2] - b2
#   bright blob: dog > DOG_T  and dog >= all 8 neighbors, > the
#                raster-earlier ones (the Harris NMS rule)
#   dark blob:   dog < -DOG_T and dog <= all 8 neighbors, < earlier
#   evaluated on the 1-px interior of the dog plane
#   chk = sum (flat_index + 1) over blobs of both polarities
# ---------------------------------------------------------------------------

DOG_T = 800  # blob-contrast gate in MILLI-luma units (fixture DoG
# magnitudes reach ~1000 milli at their sparse extrema)


def _binom_blur_valid(a: np.ndarray) -> np.ndarray:
    """(1,4,6,4,1) rows-then-cols with a single // 256 at the end."""
    t = (a[:, :-4] + 4 * a[:, 1:-3] + 6 * a[:, 2:-2]
         + 4 * a[:, 3:-1] + a[:, 4:])
    u = (t[:-4] + 4 * t[1:-3] + 6 * t[2:-2] + 4 * t[3:-1] + t[4:])
    return u // 256


def dog_blob_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Engine mechanics: slice convolutions + vectorized 8-neighbor
    comparisons (the golden twin convolves via np.take gathers and
    resolves candidates with a scalar NMS loop).  Returns
    (n_core, n_bright, n_dark, sum_absdog, chk)."""
    b1 = _binom_blur_valid(lum_i)
    b2 = _binom_blur_valid(b1)
    dog = b1[2:-2, 2:-2] - b2
    core = dog[1:-1, 1:-1]
    hh, ww = dog.shape
    bright = core > DOG_T
    dark = core < -DOG_T
    for dr, dc in ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                   (0, 1), (1, -1), (1, 0), (1, 1)):
        nb = dog[1 + dr:hh - 1 + dr, 1 + dc:ww - 1 + dc]
        if dr < 0 or (dr == 0 and dc < 0):
            bright &= core > nb
            dark &= core < nb
        else:
            bright &= core >= nb
            dark &= core <= nb
    blobs = bright | dark
    idx = np.flatnonzero(blobs).astype(np.int64)
    return (
        int(core.size),
        int(bright.sum()),
        int(dark.sum()),
        int(np.abs(core).sum()),
        int((idx + 1).sum()),
    )


def dog_blob_stats(images: DataFrame) -> DataFrame:
    """Per-image DoG blob stats (map-only)."""
    return _int_terrain_op(
        images, dog_blob_kernel,
        ["n_core", "n_bright", "n_dark", "sum_absdog", "chk"],
        "n_core bigint, n_bright bigint, n_dark bigint, "
        "sum_absdog bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# 2-level integer Haar DWT subband energies (r05 wave 37).  SPEC shared
# by both twins, ALL INTEGER because the transform is UNNORMALIZED
# (sum/difference form — no division anywhere, so it is exact and
# fold-order-free; the scale grows x4 per level, which the energy
# columns simply carry):
#   g = milli-luma // 1000, cropped to dims divisible by 4
#   per 2x2 block (a b / c d):
#     ll = a+b+c+d   h = a-b+c-d   v = a+b-c-d   dd = a-b-c+d
#   level 2 = same transform applied to the level-1 ll plane
#   e_X = sum of squares over the X subband (int64: |coef| <= 4080,
#   coef^2 <= 1.7e7, * 4096 px well inside range)
# ---------------------------------------------------------------------------


def _haar_blocks(g: np.ndarray):
    a = g[0::2, 0::2]
    b = g[0::2, 1::2]
    c = g[1::2, 0::2]
    d = g[1::2, 1::2]
    return a + b + c + d, a - b + c - d, a + b - c - d, a - b - c + d


def haar_energy_kernel(lum_i: np.ndarray) -> tuple[int, ...]:
    """Engine mechanics: strided-slice block arithmetic (the golden
    twin gathers each block corner with scalar loops).  Returns
    (n_px, e_ll2, e_h1, e_v1, e_d1, e_h2, e_v2, e_d2)."""
    g = lum_i // 1000
    hh, ww = (lum_i.shape[0] // 4) * 4, (lum_i.shape[1] // 4) * 4
    g = g[:hh, :ww]
    ll1, h1, v1, d1 = _haar_blocks(g)
    ll2, h2, v2, d2 = _haar_blocks(ll1)
    sq = lambda x: int((x.astype(np.int64) ** 2).sum())  # noqa: E731
    return (hh * ww, sq(ll2), sq(h1), sq(v1), sq(d1),
            sq(h2), sq(v2), sq(d2))


def haar_energy_stats(images: DataFrame) -> DataFrame:
    """Per-image Haar subband energies (map-only)."""
    return _int_terrain_op(
        images, haar_energy_kernel,
        ["n_px", "e_ll2", "e_h1", "e_v1", "e_d1", "e_h2", "e_v2", "e_d2"],
        "n_px bigint, e_ll2 bigint, e_h1 bigint, e_v1 bigint,"
        " e_d1 bigint, e_h2 bigint, e_v2 bigint, e_d2 bigint",
    )


# ---------------------------------------------------------------------------
# Vertical seam carving (r05 wave 37) — the content-aware-resize DP
# (another inherently sequential per-image kernel that parallelizes
# across images, like the dither).  SPEC shared by both twins:
#   g  = milli-luma // 1000
#   E[r][c] = |g[r][min(c+1,w-1)] - g[r][max(c-1,0)]|
#           + |g[min(r+1,h-1)][c] - g[max(r-1,0)][c]|   (clamped grads)
#   M[0] = E[0];  M[r][c] = E[r][c] + min(M[r-1][c-1], M[r-1][c],
#                                         M[r-1][c+1])  (missing = inf)
#   seam bottom = leftmost argmin of M[h-1]; walking up, the parent is
#   the leftmost argmin of the (up to 3) cells above
#   chk = sum over seam rows of (r * w + col_r + 1)
# ---------------------------------------------------------------------------

_SEAM_INF = np.int64(1) << 40


def seam_carve_kernel(lum_i: np.ndarray) -> tuple[int, int, int, int, int]:
    """Engine mechanics: row-vectorized DP (three shifted copies +
    np.minimum per row, argmin backtrack); the golden twin runs the
    whole DP as scalar python ints.  Returns
    (seam_cost, top_col, bottom_col, sum_energy, chk)."""
    g = lum_i // 1000
    h, w = g.shape
    dx = np.abs(g[:, np.minimum(np.arange(w) + 1, w - 1)]
                - g[:, np.maximum(np.arange(w) - 1, 0)])
    dy = np.abs(g[np.minimum(np.arange(h) + 1, h - 1), :]
                - g[np.maximum(np.arange(h) - 1, 0), :])
    e = (dx + dy).astype(np.int64)
    m = np.empty_like(e)
    m[0] = e[0]
    left = np.empty(w, dtype=np.int64)
    right = np.empty(w, dtype=np.int64)
    for r in range(1, h):
        prev = m[r - 1]
        left[0] = _SEAM_INF
        left[1:] = prev[:-1]
        right[-1] = _SEAM_INF
        right[:-1] = prev[1:]
        m[r] = e[r] + np.minimum(np.minimum(left, prev), right)
    bottom = int(np.argmin(m[h - 1]))  # np.argmin = leftmost tie
    cost = int(m[h - 1][bottom])
    col = bottom
    chk = (h - 1) * w + col + 1
    for r in range(h - 2, -1, -1):
        lo = max(col - 1, 0)
        col = lo + int(np.argmin(m[r][lo:min(col + 2, w)]))
        chk += r * w + col + 1
    return (cost, col, bottom, int(e.sum()), chk)


def seam_carve_stats(images: DataFrame) -> DataFrame:
    """Per-image vertical-seam stats (map-only)."""
    return _int_terrain_op(
        images, seam_carve_kernel,
        ["seam_cost", "top_col", "bottom_col", "sum_energy", "chk"],
        "seam_cost bigint, top_col bigint, bottom_col bigint,"
        " sum_energy bigint, chk bigint",
    )


# ---------------------------------------------------------------------------
# Integer template matching (r05 wave 44).  SPEC shared by both twins:
#   g = milli-luma // 1000
#   T = the fixed 8x8 pattern T[r][c] = ((3r + 5c) % 16) * 17  (0..255)
#   SSD(u, v) = sum over (r, c) of (g[u+r][v+c] - T[r][c])^2 — exact
#   int64 at any raster size; best match = min SSD, raster-earlier tie
#   (argmin over the flattened SSD plane).
# ---------------------------------------------------------------------------

TEMPLATE_K = 8


def _match_template() -> np.ndarray:
    r = np.arange(TEMPLATE_K, dtype=np.int64)[:, None]
    c = np.arange(TEMPLATE_K, dtype=np.int64)[None, :]
    return ((3 * r + 5 * c) % 16) * 17


def template_match_kernel(lum_i: np.ndarray) -> tuple[int, ...]:
    """Engine mechanics: one shifted-slice accumulation per template
    cell (64 vectorized adds — the golden twin gathers windows with
    np.take and verifies the argmin with a scalar loop).  Returns
    (n_pos, best_ssd, best_row, best_col, ssd_chk)."""
    g = lum_i // 1000
    t = _match_template()
    hh, ww = g.shape
    oh, ow = hh - TEMPLATE_K + 1, ww - TEMPLATE_K + 1
    ssd = np.zeros((oh, ow), dtype=np.int64)
    for r in range(TEMPLATE_K):
        for c in range(TEMPLATE_K):
            d = g[r:r + oh, c:c + ow] - t[r, c]
            ssd += d * d
    flat = int(np.argmin(ssd))  # leftmost/topmost tie
    return (
        oh * ow,
        int(ssd.flat[flat]),
        flat // ow,
        flat % ow,
        int((ssd % 997).sum()),
    )


def template_match_stats(images: DataFrame) -> DataFrame:
    """Per-image template-match stats (map-only)."""
    return _int_terrain_op(
        images, template_match_kernel,
        ["n_pos", "best_ssd", "best_row", "best_col", "ssd_chk"],
        "n_pos bigint, best_ssd bigint, best_row bigint,"
        " best_col bigint, ssd_chk bigint",
    )


# ---------------------------------------------------------------------------
# Median-cut palette extraction (r05 wave 45).  SPEC shared by both
# twins, ALL INTEGER and fully deterministic:
#   pixels   = RGB uint8 triples of the decoded image
#   start    = one box holding every pixel
#   repeat until 8 boxes (or no splittable box remains):
#     - pick the box with the MOST PIXELS, tie -> earliest created
#       (a box of one distinct color is unsplittable and skipped)
#     - split channel = widest (max - min) range, tie order R, G, B
#     - order the box's DISTINCT colors by (channel value, r, g, b);
#       lower half = the shortest prefix whose pixel count reaches
#       half (>= ceil(total/2)) BUT never the whole box
#   palette entry per box = componentwise SUM DIV COUNT (floor mean)
#   err      = sum over pixels of SSD to their OWN box's palette entry
#   chk      = sum over boxes (creation order i) of
#              (i + 1) * (r * 65536 + g * 256 + b)
# ---------------------------------------------------------------------------

PALETTE_K = 8


def palette_mediancut_kernel(px: np.ndarray) -> tuple[int, int, int, int]:
    """Engine mechanics: distinct colors + counts via np.unique, splits
    by cumulative-count searchsorted on channel-sorted arrays (the
    golden twin walks scalar dicts).  px is the decoded (h, w, 3)
    uint8 raster.  Returns (n_distinct, n_boxes, err, chk).

    r06: colors are PACKED into one int64 (r<<16 | g<<8 | b) so the
    distinct pass is a 1-D np.unique (the axis=0 structured-void sort
    was the kernel's hot spot) and each split is a single-key argsort
    of (channel_value << 24 | packed) — bit-identical ordering, since
    np.unique's packed order IS the (r, g, b) lexicographic order and
    the packed sort key realizes exactly (channel, r, g, b) with all
    keys distinct.  Measured 2.1–4.4× across the fixture raster mix."""
    flat = px.reshape(-1, 3).astype(np.int64)
    packed_all = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    upk, counts = np.unique(packed_all, return_counts=True)
    colors = np.stack(((upk >> 16) & 255, (upk >> 8) & 255, upk & 255),
                      axis=1)
    boxes = [(colors, counts, upk)]  # creation order
    while len(boxes) < PALETTE_K:
        best = -1
        best_n = 0
        for j, (cs, ns, _pk) in enumerate(boxes):
            tot = int(ns.sum())
            if len(cs) > 1 and tot > best_n:
                best, best_n = j, tot
        if best < 0:
            break
        cs, ns, pk = boxes[best]
        ranges = cs.max(axis=0) - cs.min(axis=0)
        ch = int(np.argmax(ranges))  # ties -> lowest index = R,G,B order
        order = np.argsort((cs[:, ch] << 24) | pk)  # (channel, r, g, b)
        cs, ns, pk = cs[order], ns[order], pk[order]
        half = -(-int(ns.sum()) // 2)  # ceil
        cut = int(np.searchsorted(np.cumsum(ns), half))
        cut = min(cut, len(cs) - 2)  # never take the whole box
        boxes[best] = (cs[:cut + 1], ns[:cut + 1], pk[:cut + 1])
        boxes.append((cs[cut + 1:], ns[cut + 1:], pk[cut + 1:]))
    err = 0
    chk = 0
    for i, (cs, ns, _pk) in enumerate(boxes):
        tot = int(ns.sum())
        mean = (cs * ns[:, None]).sum(axis=0) // tot
        d = cs - mean
        err += int(((d * d).sum(axis=1) * ns).sum())
        r, g, b = (int(v) for v in mean)
        chk += (i + 1) * (r * 65536 + g * 256 + b)
    return (len(colors), len(boxes), err, chk)


def palette_mediancut_stats(images: DataFrame) -> DataFrame:
    """Per-image median-cut palette stats (map-only)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sdg_engine.codecs import decode_image

        for pdf in batches:
            out = []
            for rr in pdf.itertuples(index=False):
                img = decode_image(bytes(rr.bytes), rr.fmt, int(rr.w),
                                   int(rr.h))
                out.append((rr.image_id, *palette_mediancut_kernel(img)))
            yield pd.DataFrame(
                out,
                columns=["image_id", "n_distinct", "n_boxes", "err",
                         "chk"],
            )

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _run, "image_id string, n_distinct bigint, n_boxes bigint,"
        " err bigint, chk bigint"
    )
