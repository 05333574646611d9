"""From-scratch baseline JPEG (ITU-T T.81) codec in pure numpy — no
PIL/libjpeg in the container (SURVEY.md §2.8 X1/X2; VERDICT r02
"What's missing" #1: a real 100 TB image+caption table is
JPEG-dominated, and the binding ``bytes+fmt`` input schema
(BASELINE.json input_hint) implies arbitrary formats).

Built from the PUBLIC spec the same way codecs.py built PNG from the
zlib spec and mvt.py built MVT from the protobuf wire spec:

* **Encoder**: RGB → JFIF YCbCr → 8×8 FDCT (orthonormal matrix form)
  → quantization (Annex-K tables scaled to ``quality``) → zigzag →
  DC-differential + AC run-length → Huffman (Annex-K typical tables)
  → SOI/APP0/DQT/SOF0/DHT/SOS/EOI marker stream with 0xFF byte
  stuffing.  4:4:4 (no chroma subsampling) — maximal fidelity for the
  PSNR≥40 dB invariant gate.
* **Decoder**: full baseline-sequential: marker parse, DQT/DHT table
  load (tables come from the STREAM, not assumptions), interleaved
  MCU scan with general (h,v) sampling factors (4:2:0 streams decode
  too, via replication upsample), restart markers, receive-and-extend
  magnitude decoding, dequant → IDCT → YCbCr → RGB.

Performance shape (this runs inside Arrow-batched ``mapInPandas`` on
the image hot path, so the per-image work must be vectorized):

* FDCT/IDCT/quantization run as single einsum/multiply calls over the
  (n_blocks, 8, 8) stack — no per-block Python.
* Huffman DECODE is inherently bit-serial, but each step is O(1): the
  bitstream is expanded ONCE into a vectorized sliding 16-bit window
  array (np.unpackbits + strided dot), and every (symbol, length)
  lookup is a flat 2^16 LUT index — the Python loop runs one cheap
  iteration per SYMBOL (≈ a few per nonzero coefficient), not per bit.
* Huffman ENCODE batches (code, nbits) pairs and packs them with a
  vectorized bit-packer at the end.
"""

from __future__ import annotations

import struct

import numpy as np

# --- Annex K.1/K.2 quantization tables (public spec constants) -------------

QTAB_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QTAB_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _scaled_qtab(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → base table, 100 → all-ones."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _zigzag_order() -> np.ndarray:
    """Row-major indices of the 8×8 grid in zigzag scan order."""
    order = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(s - j, j) for j in rng]
        if s % 2 == 1:  # odd diagonals run top-right → bottom-left
            diag.reverse()
        order += [r * 8 + c for r, c in diag]
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()          # block[ZIGZAG] = zigzag sequence
UNZIGZAG = np.argsort(ZIGZAG)     # zigzag sequence[UNZIGZAG] = block

# --- Annex K.3 typical Huffman tables (BITS counts + symbol values) ---------

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits) per the spec's canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for nbits in range(1, 17):
        for _ in range(bits[nbits - 1]):
            codes[vals[k]] = (code, nbits)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- DCT matrices (orthonormal; JPEG FDCT == M @ block @ M.T) ---------------

def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


_DCT_M = _dct_matrix()


# --- bit IO -----------------------------------------------------------------


class _BitWriter:
    """Accumulates (value, nbits) pairs; packs + 0xFF-stuffs at the end."""

    def __init__(self) -> None:
        self._vals: list[int] = []
        self._lens: list[int] = []

    def put(self, value: int, nbits: int) -> None:
        if nbits:
            self._vals.append(value & ((1 << nbits) - 1))
            self._lens.append(nbits)

    def tobytes(self) -> bytes:
        lens = np.array(self._lens, dtype=np.int64)
        vals = np.array(self._vals, dtype=np.int64)
        total = int(lens.sum())
        # expand every code into its bits (vectorized over codes × 16)
        ends = np.cumsum(lens)
        starts = ends - lens
        bits = np.zeros(((total + 7) // 8) * 8, dtype=np.uint8)
        # each code's bits land at start..start+len-1 in order, MSB first
        shift = np.repeat(lens, lens) - 1 - (np.arange(total) - np.repeat(starts, lens))
        bits[:total] = (np.repeat(vals, lens) >> shift) & 1
        bits[total:] = 1  # pad final byte with 1s (spec)
        raw = np.packbits(bits).tobytes()
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing


def _bit_windows(data: bytes) -> tuple[np.ndarray, int]:
    """Vectorized sliding 16-bit windows over an (unstuffed) byte stream.

    W[i] = the 16 bits starting at bit position i, MSB-aligned — the
    O(1) feed for both the Huffman LUT and receive-and-extend."""
    arr = np.frombuffer(data + b"\x00\x00", dtype=np.uint8)
    bits = np.unpackbits(arr).astype(np.uint32)
    n = len(bits) - 16
    w = np.zeros(n, dtype=np.uint32)
    for k in range(16):
        w |= bits[k:k + n] << (15 - k)
    return w, n


def _huff_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """2^16 flat lookup: 16-bit window -> (symbol, code length)."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    code = 0
    k = 0
    for nbits in range(1, 17):
        for _ in range(bits[nbits - 1]):
            base = code << (16 - nbits)
            span = 1 << (16 - nbits)
            sym[base:base + span] = vals[k]
            ln[base:base + span] = nbits
            code += 1
            k += 1
        code <<= 1
    return sym, ln


# --- encoder -----------------------------------------------------------------


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(H, W) → (n_blocks, 8, 8), row-major block order (H, W % 8 == 0)."""
    hh, ww = chan.shape
    return (
        chan.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8).transpose(0, 2, 1, 3).reshape(hh, ww)
    )


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=0)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one zigzag block; returns its DC for prediction."""
    diff = int(zz[0]) - prev_dc
    size = abs(diff).bit_length()  # JPEG magnitude category
    code, nb = dc_codes[size]
    bw.put(code, nb)
    if size:
        bw.put(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, nb = ac_codes[0xF0]  # ZRL
            bw.put(code, nb)
            run -= 16
        size = abs(v).bit_length()
        code, nb = ac_codes[(run << 4) | size]
        bw.put(code, nb)
        bw.put(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        code, nb = ac_codes[0x00]  # EOB
        bw.put(code, nb)
    return int(zz[0])


def encode_jpeg(img: np.ndarray, quality: int = 92,
                subsample: str = "444", interleaved: bool = True) -> bytes:
    """Baseline JFIF encode of an (h, w, 3) uint8 RGB array.

    ``subsample``: "444" (no chroma subsampling — the fidelity default
    for the PSNR≥40 dB gate) or "420" (2×2-averaged chroma, the
    dominant real-world layout — exercises the decoder's general
    sampling-factor path).  ``interleaved=False`` writes one scan per
    component (spec-legal non-interleaved baseline, T.81 §A.2.2 — some
    real-world encoders emit this; exercises the decoder's multi-scan
    path added r04)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    assert subsample in ("444", "420")
    hv = [(1, 1), (1, 1), (1, 1)] if subsample == "444" else \
         [(2, 2), (1, 1), (1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    # pad to full-MCU multiples by edge replication (decoder crops back)
    ph = (-h) % (8 * vmax)
    pw = (-w) % (8 * hmax)
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    hh, ww = img.shape[:2]
    mcux, mcuy = ww // (8 * hmax), hh // (8 * vmax)
    ycc = _rgb_to_ycbcr(img)
    qt = [_scaled_qtab(QTAB_LUMA, quality), _scaled_qtab(QTAB_CHROMA, quality)]

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # per-component plane (subsampled by box average) → FDCT + quantize,
    # vectorized over all blocks; block grid is (mcuy*v, mcux*h)
    comp_zz = []
    grids = []
    for ci in range(3):
        t = 0 if ci == 0 else 1
        cv, cw_ = hv[ci][1], hv[ci][0]
        plane = ycc[ci]
        ry, rx = vmax // cv, hmax // cw_
        if ry > 1 or rx > 1:
            plane = plane.reshape(hh // ry, ry, ww // rx, rx).mean(axis=(1, 3))
        blocks = _to_blocks(plane) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
        q = np.round(coef / qt[t]).astype(np.int32)
        comp_zz.append(q.reshape(-1, 64)[:, ZIGZAG])
        grids.append((mcuy * cv, mcux * cw_))

    if interleaved:
        # interleaved MCU scan: per MCU, h×v blocks per component in
        # raster order within the MCU (spec interleave)
        bw = _BitWriter()
        prev_dc = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(3):
                    t = 0 if ci == 0 else 1
                    ch_, cv = hv[ci]
                    _bh, bw_cols = grids[ci]
                    for by in range(cv):
                        for bx in range(ch_):
                            row = my * cv + by
                            col = mx * ch_ + bx
                            zz = comp_zz[ci][row * bw_cols + col]
                            prev_dc[ci] = _encode_block(
                                bw, zz, prev_dc[ci], dc_codes[t], ac_codes[t]
                            )
        scans = [bw]
    else:
        # one scan per component; T.81 A.2.2: a non-interleaved scan
        # codes exactly ceil(ceil(dim·h_c/hmax)/8) blocks per axis of
        # the DECLARED (unpadded) dimensions — the padded block grid
        # may be wider (420 luma), those blocks are simply not coded
        scans = []
        for ci in range(3):
            t = 0 if ci == 0 else 1
            bwr = _BitWriter()
            _bh, bw_cols = grids[ci]
            x_c = -(-(w * hv[ci][0]) // hmax)  # ceil(w·h_c/hmax)
            y_c = -(-(h * hv[ci][1]) // vmax)
            bw_c = -(-x_c // 8)
            bh_c = -(-y_c // 8)
            prev = 0
            for by in range(bh_c):
                for bx in range(bw_c):
                    zz = comp_zz[ci][by * bw_cols + bx]
                    prev = _encode_block(bwr, zz, prev, dc_codes[t], ac_codes[t])
            scans.append(bwr)

    # --- marker stream ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tab in enumerate(qt):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(x) for x in tab.reshape(64)[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"  # SOF0, 8-bit
    out += struct.pack(">HH", h, w) + b"\x03"
    for ci in range(3):
        out += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1],
                      0 if ci == 0 else 1])
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    if interleaved:
        out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
        for ci in range(3):
            t = 0 if ci == 0 else 1
            out += bytes([ci + 1, (t << 4) | t])
        out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0
        out += scans[0].tobytes()
    else:
        for ci in range(3):
            t = 0 if ci == 0 else 1
            out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01"
            out += bytes([ci + 1, (t << 4) | t])
            out += b"\x00\x3f\x00"
            out += scans[ci].tobytes()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------


def _entropy_segments(scan: bytes) -> list[bytes]:
    """Unstuff FF00 and split on restart markers (segment boundaries
    reset DC prediction + bit alignment)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    end = len(scan)
    while i < end:
        b0 = scan[i]
        if b0 == 0xFF:
            b1 = scan[i + 1] if i + 1 < end else 0xD9
            if b1 == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= b1 <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # next true marker
        cur.append(b0)
        i += 1
    segments.append(bytes(cur))
    return segments


def _decode_block(win, bp, blk, dsym, dlen, asym, alen, prev_dc):
    """Huffman-decode one 8×8 data unit into ``blk`` (zigzag order);
    returns (new bit position, new DC predictor)."""
    wv = int(win[bp])
    s = int(dsym[wv])
    bp += int(dlen[wv])
    if s:
        v = int(win[bp]) >> (16 - s)
        bp += s
        if v < (1 << (s - 1)):
            v -= (1 << s) - 1
    else:
        v = 0
    prev_dc += v
    blk[0] = prev_dc
    k = 1
    while k < 64:
        wv = int(win[bp])
        rs = int(asym[wv])
        bp += int(alen[wv])
        if rs == 0:  # EOB
            break
        run = rs >> 4
        size = rs & 15
        if size == 0:
            k += 16 if run == 15 else 64  # ZRL / EOB-ish
            continue
        k += run
        v = int(win[bp]) >> (16 - size)
        bp += size
        if v < (1 << (size - 1)):
            v -= (1 << size) - 1
        blk[k] = v
        k += 1
    return bp, prev_dc


def _decode_scan_segments(scan, scan_comps, comps, huff, restart_interval,
                          store, mcux, mcuy, hmax, vmax, w, h) -> None:
    """Entropy-decode ONE scan (T.81 §A.2): fully-interleaved (MCU
    loop) or non-interleaved single-component (data-unit raster over
    the component's OWN ceil(x_c/8) × ceil(y_c/8) block grid — which
    may be narrower than the padded MCU grid; uncoded padding blocks
    stay zero and are cropped after IDCT).  r04: multi-scan baseline
    JPEGs (one scan per component) decode through this path."""
    segments = _entropy_segments(scan)
    if len(scan_comps) == len(comps):
        n_units = mcux * mcuy
        done = 0
        for seg in segments:
            if done >= n_units:
                break
            win, nbits = _bit_windows(seg)
            bp = 0
            prev_dc = [0] * len(comps)
            seg_mcus = (
                min(restart_interval, n_units - done)
                if restart_interval
                else n_units - done
            )
            for _ in range(seg_mcus):
                for sc in scan_comps:
                    ci = sc["_k"]  # comps/store index (SOS order may differ)
                    dsym, dlen = huff[(0, sc["td"])]
                    asym, alen = huff[(1, sc["ta"])]
                    for by in range(sc["v"]):
                        for bx in range(sc["h"]):
                            mx = done % mcux
                            my = done // mcux
                            row = my * sc["v"] + by
                            col = mx * sc["h"] + bx
                            blk = store[ci][row * (mcux * sc["h"]) + col]
                            bp, prev_dc[ci] = _decode_block(
                                win, bp, blk, dsym, dlen, asym, alen,
                                prev_dc[ci],
                            )
                done += 1
            if bp > nbits:
                raise ValueError("bitstream overrun")
        return
    # non-interleaved: one component, data units in raster order
    sc = scan_comps[0]
    ci = sc["_k"]
    dsym, dlen = huff[(0, sc["td"])]
    asym, alen = huff[(1, sc["ta"])]
    grid_cols = mcux * sc["h"]
    x_c = -(-(w * sc["h"]) // hmax)
    y_c = -(-(h * sc["v"]) // vmax)
    bw_c = -(-x_c // 8)
    bh_c = -(-y_c // 8)
    n_units = bw_c * bh_c
    done = 0
    for seg in segments:
        if done >= n_units:
            break
        win, nbits = _bit_windows(seg)
        bp = 0
        prev_dc = 0
        seg_units = (
            min(restart_interval, n_units - done)
            if restart_interval
            else n_units - done
        )
        for _ in range(seg_units):
            by, bx = divmod(done, bw_c)
            blk = store[ci][by * grid_cols + bx]
            bp, prev_dc = _decode_block(
                win, bp, blk, dsym, dlen, asym, alen, prev_dc
            )
            done += 1
        if bp > nbits:
            raise ValueError("bitstream overrun")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline-sequential decode → (h, w, 3) uint8 RGB.  Interleaved
    and (r04) non-interleaved multi-scan baseline streams."""
    assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    store: list[np.ndarray] | None = None
    hmax = vmax = mcux = mcuy = 0
    n_scans = 0
    scan_comps: list[dict] = []
    while pos + 4 <= len(data):
        assert data[pos] == 0xFF, f"marker sync lost at {pos}"
        # spec-legal 0xFF fill bytes may pad before any marker (T.81
        # B.1.1.2): the marker byte is the first non-FF after the run
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        payload = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                prec = payload[p] >> 4
                tid = payload[p] & 15
                if prec == 0:
                    tab = np.frombuffer(payload[p + 1:p + 65], dtype=np.uint8)
                    p += 65
                else:
                    tab = np.frombuffer(payload[p + 1:p + 129], dtype=">u2")
                    p += 129
                full = np.zeros(64, dtype=np.int32)
                full[ZIGZAG] = tab.astype(np.int32)
                qt[tid] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                cls = payload[p] >> 4
                tid = payload[p] & 15
                bits = list(payload[p + 1:p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17:p + 17 + nv])
                huff[(cls, tid)] = _huff_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = payload[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0x{marker:02x})")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — decode this scan's entropy data
            ns = payload[0]
            if ns not in (1, len(comps)):
                raise ValueError(
                    f"unsupported scan interleave ({ns} of {len(comps)} "
                    "components; baseline supports fully-interleaved or "
                    "one-component scans)"
                )
            scan_comps = []
            for si in range(ns):
                cid, tt = payload[1 + 2 * si:3 + 2 * si]
                k = next(i_ for i_, c in enumerate(comps) if c["id"] == cid)
                # "_k": index into comps/store — the SOS may list
                # components in a different order than SOF (spec-legal)
                scan_comps.append(
                    {**comps[k], "_k": k, "td": tt >> 4, "ta": tt & 15}
                )
            if store is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                # per-component quantized coefficient store (zigzag)
                store = [
                    np.zeros((mcuy * c["v"] * mcux * c["h"], 64),
                             dtype=np.int32)
                    for c in comps
                ]
            # entropy data runs to the next true marker (FF00 stuffing
            # and RSTn belong to the scan)
            epos = pos
            end = len(data)
            while epos < end:
                if data[epos] == 0xFF and epos + 1 < end:
                    nxt = data[epos + 1]
                    if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                        epos += 2
                        continue
                    break
                epos += 1
            _decode_scan_segments(
                data[pos:epos], scan_comps, comps, huff, restart_interval,
                store, mcux, mcuy, hmax, vmax, w, h,
            )
            n_scans += 1
            pos = epos
        # other markers (APPn, COM): skipped via seglen
    assert n_scans > 0 and comps, "no scan data"

    # dequant + IDCT per component (vectorized over blocks), then upsample
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        coefs = np.zeros((store[ci].shape[0], 64), dtype=np.float64)
        coefs[:, :] = store[ci][:, UNZIGZAG]  # de-zigzag to row-major
        blocks = coefs.reshape(-1, 8, 8) * q
        pix = np.einsum("xu,nuv,yv->nxy", _DCT_M.T, blocks, _DCT_M.T) + 128.0
        ch = mcuy * c["v"] * 8
        cw = mcux * c["h"] * 8
        plane = _from_blocks(pix, ch, cw)
        # upsample to full MCU grid by replication
        ry = (8 * vmax * mcuy) // ch
        rx = (8 * hmax * mcux) // cw
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
