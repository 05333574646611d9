"""S7 MVT sink: protobuf wire round-trip + Spark tile-cut sink."""

import numpy as np

from sdg_engine import mvt as MVT


def test_geometry_roundtrip():
    lines = [np.array([[0, 0], [100, 50], [100, 4096]]),
             np.array([[5, 5], [9, 9]])]
    tile = MVT.encode_tile({"roads": [
        {"id": 7, "type": MVT.GEOM_LINESTRING, "lines": lines,
         "tags": {"road_id": 7, "kind": "primary"}},
    ]})
    dec = MVT.decode_tile(tile)
    layer = dec["roads"]
    assert layer["extent"] == MVT.EXTENT and layer["version"] == 2
    ft = layer["features"][0]
    assert ft["id"] == 7
    assert ft["tags"]["road_id"] == 7 and ft["tags"]["kind"] == "primary"
    got = [np.asarray(l) for l in ft["lines"]]
    assert all(np.array_equal(a, b) for a, b in zip(got, lines))


def test_polygon_closepath():
    ring = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    tile = MVT.encode_tile({"areas": [
        {"id": 1, "type": MVT.GEOM_POLYGON, "lines": [ring], "tags": {}},
    ]})
    ft = MVT.decode_tile(tile)["areas"]["features"][0]
    assert np.array_equal(np.asarray(ft["lines"][0]), ring)


def test_write_road_mvt_sink(spark, tmp_path):
    from sdg_engine import fixtures as FX
    from sdg_engine.ops.spatial import road_segments

    roads = spark.createDataFrame(FX.roads_records(0.001))
    segs = road_segments(roads)
    out = str(tmp_path / "tiles")
    tiles = MVT.write_road_mvt(segs, out, level=4)
    back = spark.read.parquet(out).collect()
    assert len(back) > 0
    total = sum(r.n_features for r in back)
    assert total >= segs.count()  # a segment can land in several tiles
    # every blob decodes, coordinates inside extent, ids deterministic
    for r in back[:10]:
        layer = MVT.decode_tile(bytes(r.mvt))["roads"]
        for ft in layer["features"]:
            pts = np.concatenate([np.asarray(l) for l in ft["lines"]])
            assert pts.min() >= 0 and pts.max() <= MVT.EXTENT
    # determinism: re-encoding produces byte-identical blobs
    out2 = str(tmp_path / "tiles2")
    MVT.write_road_mvt(segs, out2, level=4)
    a = {(r.tx, r.ty): bytes(r.mvt) for r in back}
    b = {(r.tx, r.ty): bytes(r.mvt) for r in spark.read.parquet(out2).collect()}
    assert a == b


def test_mbtiles_roundtrip_and_tms_flip(spark, tmp_path):
    """r05 S2 QA-tile source: encode → MbTiles (gzip + TMS rows) →
    distributed rowid-range read → features match a direct decode of
    every blob; xyz_y is the flipped row; dequantized world coords are
    within the encoder's quantization step."""
    import gzip
    import sqlite3

    from sdg_engine import fixtures as FX
    from sdg_engine import osm as OSM
    from sdg_engine.ops.spatial import road_segments

    roads = spark.createDataFrame(FX.roads_records(0.001))
    segs = road_segments(roads)
    tiles = MVT.write_road_mvt(segs, str(tmp_path / "tiles"), level=4)
    mb = str(tmp_path / "roads.mbtiles")
    n = OSM.write_mbtiles(tiles, mb)
    assert n == tiles.count()

    # raw sqlite: blobs are gzip'd MVT, rows keyed TMS, metadata present
    con = sqlite3.connect(mb)
    meta = dict(con.execute("SELECT name, value FROM metadata"))
    assert meta["format"] == "pbf"
    want = {}
    for z, tx, trow, blob in con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
    ):
        dec = MVT.decode_tile(gzip.decompress(blob))
        for ft in dec["roads"]["features"]:
            want[(z, tx, trow, ft["id"])] = ft
    con.close()

    # distributed read (forced multi-split) sees exactly those features
    feats = OSM.read_qatiles(spark, mb, n_splits=5).collect()
    assert len(feats) == len(want)
    for r in feats:
        assert (r.z, r.tx, r.ty, r.feat_id) in want
        assert r.xyz_y == (1 << r.z) - 1 - r.ty  # the TMS flip
        assert r.road_id == want[(r.z, r.tx, r.ty, r.feat_id)]["tags"]["road_id"]

    # world-coordinate fidelity: every vertex within one quantization
    # step of the tile rect it was encoded in
    size = 10.0 / (1 << 4)
    step = size / MVT.EXTENT
    for r in feats[:50]:
        for c in r.coords:
            assert -step <= c.x - (-0.0 + r.tx * size) <= size + step
            assert -step <= c.y - (-0.0 + r.ty * size) <= size + step


def test_mvt_pyramid_all_zooms_decode(spark, tmp_path):
    """r05 S7b: every zoom of the pyramid decodes; tile counts are
    monotone non-decreasing with zoom; per-zoom feature totals are
    each >= the segment count (a segment covers >= 1 tile per zoom)."""
    from sdg_engine import fixtures as FX
    from sdg_engine.ops.spatial import road_segments

    roads = spark.createDataFrame(FX.roads_records(0.001))
    segs = road_segments(roads)
    n_segs = segs.count()
    tiles = MVT.write_road_mvt_pyramid(segs, str(tmp_path / "pyr"), 2, 4)
    rows = tiles.collect()
    by_z = {}
    for r in rows:
        by_z.setdefault(r.z, []).append(r)
    assert sorted(by_z) == [2, 3, 4]
    counts = [len(by_z[z]) for z in (2, 3, 4)]
    assert counts == sorted(counts)
    for z, zrows in by_z.items():
        assert sum(r.n_features for r in zrows) >= n_segs
        for r in zrows[:5]:
            dec = MVT.decode_tile(bytes(r.mvt))["roads"]
            assert len(dec["features"]) == r.n_features
            for ft in dec["features"]:
                pts = np.concatenate([np.asarray(l) for l in ft["lines"]])
                assert pts.min() >= 0 and pts.max() <= MVT.EXTENT
