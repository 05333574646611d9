"""Baseline TIFF 6.0 codec from scratch, pure numpy + zlib (SURVEY.md
§2.8 X1/X2; r04).  The reference's primary raster input is GeoTIFF
(WorldPop population tiles), so reading the TIFF container natively —
not through an image library — closes the last *input format* gap.
Built from the public TIFF 6.0 specification only, the same way
jpeg.py (ITU-T T.81) and the PNG codec were.

Scope — the baseline RGB subset real GeoTIFFs of this class use:

* 8-bit RGB (SamplesPerPixel=3, BitsPerSample=8,8,8), chunky
  (PlanarConfiguration=1)
* BOTH strip and tile organizations (GeoTIFF rasters are usually
  tiled; scans/exports are usually stripped)
* Compression 1 (none) and 8 (zlib/"Adobe deflate" — what GDAL's
  COMPRESS=DEFLATE writes)
* horizontal-differencing predictor (Predictor=2) on decode
* both byte orders on decode ('II' little, 'MM' big); encoder writes
  'II'

GeoTIFF georeferencing tags (ModelPixelScale 33550, ModelTiepoint
33922) are parsed and returned as metadata when present — the engine's
fixture footprints derive from image_id, but a real WorldPop ingest
reads the grid origin/scale from exactly these tags.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_II = b"II"
_MM = b"MM"

# tag ids (TIFF 6.0 §8; GeoTIFF spec appendix)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_TILE_W = 322
_T_TILE_H = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}


def encode_tiff(
    img: np.ndarray,
    compression: str = "deflate",
    layout: str = "strip",
    rows_per_strip: int = 16,
    tile: tuple[int, int] = (64, 64),
    predictor: int = 1,
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float] | None = None,
) -> bytes:
    """8-bit RGB TIFF ('II' order).  ``layout`` 'strip' or 'tile';
    ``compression`` 'none' or 'deflate'.  ``pixel_scale``/``tiepoint``
    write the GeoTIFF grid tags (degrees-per-pixel, raster origin)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    comp_id = {"none": 1, "deflate": 8}[compression]

    def pack_chunk(block: np.ndarray) -> bytes:
        if predictor == 2:
            d = block.astype(np.int16)
            d[:, 1:, :] -= d[:, :-1, :].copy()
            block = (d & 0xFF).astype(np.uint8)
        raw = block.tobytes()
        return zlib.compress(raw, 6) if comp_id == 8 else raw

    chunks: list[bytes] = []
    if layout == "strip":
        for r0 in range(0, h, rows_per_strip):
            chunks.append(pack_chunk(img[r0 : r0 + rows_per_strip]))
    else:
        tw, th = tile
        assert tw % 16 == 0 and th % 16 == 0, "TIFF tiles are multiples of 16"
        for r0 in range(0, h, th):
            for c0 in range(0, w, tw):
                block = np.zeros((th, tw, 3), dtype=np.uint8)
                part = img[r0 : r0 + th, c0 : c0 + tw]
                block[: part.shape[0], : part.shape[1]] = part
                chunks.append(pack_chunk(block))

    # layout: [8-byte header][chunk data][extra values][IFD]
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    offsets = []
    for chk in chunks:
        offsets.append(len(out))
        out.extend(chk)
        if len(out) & 1:
            out.append(0)  # word-align (spec recommendation)

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def add(tag: int, typ: int, values) -> None:
        fmt = {3: "<H", 4: "<I", 12: "<d"}[typ]
        payload = b"".join(struct.pack(fmt, v) for v in values)
        entries.append((tag, typ, len(values), payload))

    add(_T_WIDTH, 4, [w])
    add(_T_HEIGHT, 4, [h])
    add(_T_BITS, 3, [8, 8, 8])
    add(_T_COMPRESSION, 3, [comp_id])
    add(_T_PHOTOMETRIC, 3, [2])
    add(_T_SPP, 3, [3])
    add(_T_PLANAR, 3, [1])
    if predictor != 1:
        add(_T_PREDICTOR, 3, [predictor])
    if layout == "strip":
        add(_T_ROWS_PER_STRIP, 4, [rows_per_strip])
        add(_T_STRIP_OFFSETS, 4, offsets)
        add(_T_STRIP_COUNTS, 4, [len(c_) for c_ in chunks])
    else:
        add(_T_TILE_W, 4, [tile[0]])
        add(_T_TILE_H, 4, [tile[1]])
        add(_T_TILE_OFFSETS, 4, offsets)
        add(_T_TILE_COUNTS, 4, [len(c_) for c_ in chunks])
    if pixel_scale is not None:
        add(_T_PIXEL_SCALE, 12, [pixel_scale[0], pixel_scale[1], 0.0])
    if tiepoint is not None:
        # raster (0,0) maps to model (x, y)
        add(_T_TIEPOINT, 12, [0.0, 0.0, 0.0, tiepoint[0], tiepoint[1], 0.0])

    # out-of-line values
    fixed: list[tuple[int, int, int, bytes]] = []
    for tag, typ, count, payload in sorted(entries):
        if len(payload) > 4:
            off = len(out)
            out.extend(payload)
            if len(out) & 1:
                out.append(0)
            payload = struct.pack("<I", off)
        fixed.append((tag, typ, count, payload.ljust(4, b"\x00")))
    ifd_off = len(out)
    out.extend(struct.pack("<H", len(fixed)))
    for tag, typ, count, val4 in fixed:
        out.extend(struct.pack("<HHI", tag, typ, count) + val4)
    out.extend(struct.pack("<I", 0))  # no next IFD
    struct.pack_into("<I", out, 4, ifd_off)
    return bytes(out)


def _read_ifd(data: bytes, bo: str) -> dict[int, list]:
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, list] = {}
    for k in range(n_entries):
        tag, typ, count = struct.unpack_from(bo + "HHI", data, ifd_off + 2 + 12 * k)
        size = _TYPE_SIZES.get(typ, 1) * count
        voff = ifd_off + 2 + 12 * k + 8
        if size > 4:
            (voff,) = struct.unpack_from(bo + "I", data, voff)
        if typ == 3:
            vals = list(struct.unpack_from(bo + f"{count}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(bo + f"{count}I", data, voff))
        elif typ == 12:
            vals = list(struct.unpack_from(bo + f"{count}d", data, voff))
        elif typ == 5:  # RATIONAL
            raw = struct.unpack_from(bo + f"{2 * count}I", data, voff)
            vals = [raw[2 * j] / raw[2 * j + 1] if raw[2 * j + 1] else 0.0
                    for j in range(count)]
        else:
            vals = list(data[voff : voff + size])
        tags[tag] = vals
    return tags


def _unpredict(block: np.ndarray) -> np.ndarray:
    # horizontal differencing: cumulative sum along x, per channel, mod 256
    return np.cumsum(block.astype(np.uint64), axis=1).astype(np.uint8)


def decode_tiff(data: bytes, return_geo: bool = False):
    """→ (h, w, 3) uint8 RGB; with ``return_geo`` also a dict holding
    the GeoTIFF grid tags (or None) — pixel_scale (sx, sy) and the
    model coordinates of raster (0,0)."""
    if data[:2] == _II:
        bo = "<"
    elif data[:2] == _MM:
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    tags = _read_ifd(data, bo)
    w = tags[_T_WIDTH][0]
    h = tags[_T_HEIGHT][0]
    comp = tags.get(_T_COMPRESSION, [1])[0]
    if comp not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {comp} "
                         "(baseline codec reads 1=none / 8=deflate)")
    if tags.get(_T_SPP, [3])[0] != 3 or tags.get(_T_BITS, [8, 8, 8]) != [8, 8, 8]:
        raise ValueError("only 8-bit RGB (SamplesPerPixel=3) supported")
    if tags.get(_T_PLANAR, [1])[0] != 1:
        raise ValueError("only chunky planar configuration supported")
    predictor = tags.get(_T_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise ValueError(f"unsupported predictor {predictor}")

    def unpack(chunk: bytes, rows: int, cols: int) -> np.ndarray:
        raw = zlib.decompress(chunk) if comp == 8 else chunk
        block = np.frombuffer(raw, dtype=np.uint8, count=rows * cols * 3)
        block = block.reshape(rows, cols, 3)
        return _unpredict(block) if predictor == 2 else block

    img = np.zeros((h, w, 3), dtype=np.uint8)
    if _T_TILE_OFFSETS in tags:
        tw = tags[_T_TILE_W][0]
        th = tags[_T_TILE_H][0]
        offs = tags[_T_TILE_OFFSETS]
        cnts = tags[_T_TILE_COUNTS]
        tiles_across = (w + tw - 1) // tw
        for k, (off, cnt) in enumerate(zip(offs, cnts)):
            r0 = (k // tiles_across) * th
            c0 = (k % tiles_across) * tw
            block = unpack(data[off : off + cnt], th, tw)
            img[r0 : r0 + th, c0 : c0 + tw] = block[
                : min(th, h - r0), : min(tw, w - c0)
            ]
    else:
        rps = tags.get(_T_ROWS_PER_STRIP, [h])[0]
        offs = tags[_T_STRIP_OFFSETS]
        cnts = tags[_T_STRIP_COUNTS]
        for k, (off, cnt) in enumerate(zip(offs, cnts)):
            r0 = k * rps
            rows = min(rps, h - r0)
            img[r0 : r0 + rows] = unpack(data[off : off + cnt], rows, w)
    if not return_geo:
        return img
    geo = None
    if _T_PIXEL_SCALE in tags or _T_TIEPOINT in tags:
        ps = tags.get(_T_PIXEL_SCALE, [0.0, 0.0, 0.0])
        tp = tags.get(_T_TIEPOINT, [0.0] * 6)
        geo = {"pixel_scale": (ps[0], ps[1]),
               "origin": (tp[3], tp[4])}
    return img, geo
