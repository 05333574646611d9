"""From-scratch baseline TIFF codec (tiff.py, r04) — round-trip and
container-variant coverage.  The reference's primary raster input is
GeoTIFF; these tests pin the subset the engine reads."""

import numpy as np
import pytest

from sdg_engine.fixtures import make_image_pixels
from sdg_engine.tiff import decode_tiff, encode_tiff


def _px(i, w, h):
    return make_image_pixels(i, 3.3, 4.4, w, h)


@pytest.mark.parametrize("compression", ["none", "deflate"])
@pytest.mark.parametrize("layout", ["strip", "tile"])
@pytest.mark.parametrize("size", [(64, 64), (33, 57), (128, 96)])
def test_roundtrip_lossless(compression, layout, size):
    w, h = size
    px = _px(w * h, w, h)
    data = encode_tiff(px, compression=compression, layout=layout)
    assert (decode_tiff(data) == px).all()


def test_roundtrip_predictor2():
    px = _px(7, 48, 40)
    data = encode_tiff(px, compression="deflate", predictor=2)
    assert (decode_tiff(data) == px).all()
    # predictor also applies per-tile
    data = encode_tiff(px, compression="deflate", layout="tile", predictor=2)
    assert (decode_tiff(data) == px).all()


def test_odd_strip_and_tile_edges():
    # heights not divisible by rows_per_strip; sizes not divisible by tile
    px = _px(11, 70, 23)
    assert (decode_tiff(encode_tiff(px, rows_per_strip=5)) == px).all()
    assert (decode_tiff(encode_tiff(px, layout="tile", tile=(16, 32))) == px).all()


def test_big_endian_decode():
    """'MM' byte order: rewrite an 'II' file's header/IFD big-endian by
    re-encoding through a byte-swapped builder (hand-swapped here), or
    simply verify the decoder's swapped-order path on a crafted file."""
    import struct

    px = _px(3, 32, 32)
    # build a minimal MM file by hand: uncompressed single strip
    raw = px.tobytes()
    out = bytearray(b"MM\x00*\x00\x00\x00\x00")
    strip_off = len(out)
    out.extend(raw)
    entries = [
        (256, 4, 1, 32),  # width
        (257, 4, 1, 32),  # height
        (259, 3, 1, 1),  # no compression
        (262, 3, 1, 2),  # RGB
        (273, 4, 1, strip_off),
        (277, 3, 1, 3),
        (278, 4, 1, 32),
        (279, 4, 1, len(raw)),
        (284, 3, 1, 1),
    ]
    # BitsPerSample out-of-line
    bits_off = len(out)
    out.extend(struct.pack(">3H", 8, 8, 8) + b"\x00\x00")
    entries.insert(2, (258, 3, 3, bits_off))
    ifd_off = len(out)
    out.extend(struct.pack(">H", len(entries)))
    for tag, typ, count, val in sorted(entries):
        if typ == 3 and count == 1:
            val4 = struct.pack(">H", val) + b"\x00\x00"
        else:
            val4 = struct.pack(">I", val)
        out.extend(struct.pack(">HHI", tag, typ, count) + val4)
    out.extend(struct.pack(">I", 0))
    struct.pack_into(">I", out, 4, ifd_off)
    assert (decode_tiff(bytes(out)) == px).all()


def test_geotiff_grid_tags_roundtrip():
    px = _px(5, 32, 32)
    data = encode_tiff(px, pixel_scale=(0.001, 0.001), tiepoint=(2.25, 7.75))
    img, geo = decode_tiff(data, return_geo=True)
    assert (img == px).all()
    assert geo["pixel_scale"] == (0.001, 0.001)
    assert geo["origin"] == (2.25, 7.75)
    # files without the tags report geo=None
    _img, geo2 = decode_tiff(encode_tiff(px), return_geo=True)
    assert geo2 is None


def test_unsupported_variants_raise():
    px = _px(9, 32, 32)
    data = bytearray(encode_tiff(px, compression="none"))
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(data[2:]))
    # corrupt the compression tag value to LZW (5): find tag 259 in IFD
    import struct

    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    for k in range(n):
        tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * k)
        if tag == 259:
            struct.pack_into("<H", data, ifd_off + 2 + 12 * k + 8, 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(data))


def test_fixture_integration_via_codecs():
    from sdg_engine.codecs import decode_image, encode_image

    px = _px(21, 64, 64)
    data = encode_image(px, "tif")
    assert (decode_image(data, "tif", 64, 64) == px).all()


def test_geotiff_sink_georeference_roundtrip(spark):
    """S6 full: the forgotten-set GeoTIFF sink rows must decode to the
    original pixels AND carry recoverable georeferencing (grid origin =
    footprint top-left, pixel scale = degrees/pixel)."""
    from sdg_engine.codecs import decode_image
    from sdg_engine.jobs.rai import load_inputs
    from sdg_engine.ops import payload as PL
    from sdg_engine.ops import spatial as SP

    images, _roads = load_inputs(spark, 0.001)
    sub = SP.with_geo(images.limit(12))
    rows = PL.transcode_geotiff(sub).collect()
    assert len(rows) == 12
    src = {r["image_id"]: r for r in sub.collect()}
    for r in rows:
        img, geo = decode_tiff(bytes(r.bytes), return_geo=True)
        s = src[r.image_id]
        want = decode_image(bytes(s.bytes), s.fmt, s.w, s.h)
        assert (img == want).all()
        assert geo is not None
        assert abs(geo["origin"][0] - s.fp_xmin) < 1e-12
        assert abs(geo["origin"][1] - s.fp_ymax) < 1e-12
        assert abs(geo["pixel_scale"][0] - (s.fp_xmax - s.fp_xmin) / s.w) < 1e-15
