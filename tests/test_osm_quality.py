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
