"""Google Encoded Polyline Algorithm Format codec (r05 wave 38) —
the compact ASCII wire format every web-mapping stack uses for
linestrings, built from the PUBLIC algorithm description only
(developers.google.com "Encoded Polyline Algorithm Format"):

    per coordinate: quantize to 1e-5 degrees, delta against the
    previous point, zigzag (left-shift 1, invert if negative), split
    into 5-bit chunks little-endian-first, OR 0x20 onto every chunk
    except the last, add 63, emit as ASCII chars (all in '?'..'~').

Quantization here is round-half-up via FLOOR(v * 1e5 + 0.5) — the
repo-wide convention (gotcha 7: DuckDB CAST rounds, Spark truncates;
FLOOR is the one spelling both engines agree on), mirrored verbatim
in the oracle SQL.  Decode returns the exact quantized integers, so
every aggregate over decoded points is bit-reproducible.
"""

from __future__ import annotations


def _emit(delta: int, out: list) -> None:
    u = ~(delta << 1) if delta < 0 else delta << 1
    while u >= 0x20:
        out.append(chr((0x20 | (u & 0x1F)) + 63))
        u >>= 5
    out.append(chr(u + 63))


def encode_polyline(points) -> str:
    """points: iterable of (x, y) floats (lon, lat order is the
    caller's contract; the codec is axis-agnostic and encodes the
    SECOND value first, matching the spec's lat-then-lng order)."""
    out: list = []
    px = py = 0
    for x, y in points:
        qx = int((x * 1e5 + 0.5) // 1)
        qy = int((y * 1e5 + 0.5) // 1)
        _emit(qy - py, out)
        _emit(qx - px, out)
        px, py = qx, qy
    return "".join(out)


def decode_polyline(s: str):
    """Returns the list of exact quantized integer pairs (qx, qy)."""
    pts = []
    i = 0
    px = py = 0
    n = len(s)
    while i < n:
        vals = []
        for _ in range(2):
            u = 0
            shift = 0
            while True:
                b = ord(s[i]) - 63
                i += 1
                u |= (b & 0x1F) << shift
                if b < 0x20:
                    break
                shift += 5
            vals.append(~(u >> 1) if u & 1 else u >> 1)
        py += vals[0]
        px += vals[1]
        pts.append((px, py))
    return pts
