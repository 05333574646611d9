"""M2: engine outputs vs versioned numpy-oracle goldens
(BASELINE.json:14 — "matching the reference's join output rows and
tile assignments")."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sdg_engine import fixtures as FX
from sdg_engine.ops import spatial as SP

GOLD = os.path.join(os.path.dirname(__file__), "goldens")
SF = 0.001


def _load(name):
    with open(os.path.join(GOLD, name)) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def images_geo(spark):
    ids = [f"img{i:012d}" for i in range(FX._sizes(SF)[0])]
    return SP.with_geo(spark.createDataFrame(pd.DataFrame({"image_id": ids})))


@pytest.fixture(scope="module")
def segs(spark):
    return SP.road_segments(spark.createDataFrame(FX.roads_records(SF)))


def test_golden_tile_assignments(spark, images_geo):
    want = pd.DataFrame(_load("tile_assignments.json"))
    cells = SP.with_point_cell(images_geo, 12)
    cc = SP.assign_countries(images_geo, FX.get_country_rings(), level=9)
    got = (
        cells.select("image_id", "cell_id")
        .join(cc.select("image_id", "country_code"), "image_id")
        .orderBy("image_id")
        .toPandas()
    )
    want = want.sort_values("image_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["cell_id"].values == want["cell_id"].values).all()
    assert (got["country_code"].values == want["country_code"].values).all()


def test_golden_nearest_road(spark, images_geo, segs):
    want = pd.DataFrame(_load("nearest_road.json")).sort_values("image_id")
    got = (
        SP.knn_nearest_road(images_geo, segs, 60000.0)
        .orderBy("image_id")
        .toPandas()
    )
    assert len(got) == len(want)
    assert (got["image_id"].values == want["image_id"].values).all()
    assert (got["road_id"].values == want["road_id"].values).all()
    assert (abs(got["dist_m"].values - want["dist_m"].values) < 1e-9).all()
    assert (got["k_ring"].values == want["k_ring"].values).all()


def test_golden_join_rows(spark, images_geo, segs):
    want = pd.DataFrame(_load("join_rows.json"))
    pts = SP.with_point_cell(images_geo, 7)
    covered = SP.segments_with_cells(segs, 7)
    got = (
        SP.spatial_join(
            pts.select("cell_id", "image_id"),
            covered.select("cell_id", "road_id"),
        )
        .select("image_id", "road_id", "cell_id")
        .dropDuplicates()
        .orderBy("image_id", "road_id")
        .toPandas()
    )
    want = want.sort_values(["image_id", "road_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def _make_goldens_mod():
    import importlib.util
    import sys

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "scripts", "make_goldens.py")
    spec = importlib.util.spec_from_file_location("make_goldens", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("make_goldens", mod)
    spec.loader.exec_module(mod)
    return mod


def test_chamfer_equals_dijkstra():
    """Certify the 3-4 chamfer DT (engine AND the golden's transposed
    twin) against a genuinely different algorithm: brute-force Dijkstra
    on the 8-neighbour pixel graph with 3/4 edge weights.  The 2-scan
    transform is exact for this metric (Borgefors), so all three must
    agree BIT-FOR-BIT (integer-valued float64 costs, same final /3.0)."""
    import heapq

    import numpy as np

    from sdg_engine.ops.raster import chamfer_distance

    def dijkstra34(mask):
        h, w = mask.shape
        INF = float("inf")
        dist = np.full((h, w), INF)
        pq = []
        for r, c in zip(*np.nonzero(mask)):
            dist[r, c] = 0.0
            heapq.heappush(pq, (0.0, int(r), int(c)))
        while pq:
            d, r, c = heapq.heappop(pq)
            if d > dist[r, c]:
                continue
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    if dr == 0 and dc == 0:
                        continue
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < h and 0 <= cc < w:
                        nd = d + (4.0 if dr and dc else 3.0)
                        if nd < dist[rr, cc]:
                            dist[rr, cc] = nd
                            heapq.heappush(pq, (nd, rr, cc))
        return dist / 3.0

    twin = _make_goldens_mod()._chamfer34_twin
    rng = __import__("numpy").random.default_rng(7)
    for shape, p in [((13, 17), 0.02), ((24, 9), 0.08), ((16, 16), 0.15)]:
        for _ in range(4):
            mask = rng.random(shape) < p
            if not mask.any():
                mask[shape[0] // 2, shape[1] // 2] = True
            want = dijkstra34(mask)
            got_engine = chamfer_distance(mask)
            got_twin = twin(mask[None])[0]
            assert (got_engine == want).all()
            assert (got_twin == want).all()


def test_rai_per_image_twin_matches_engine(spark):
    """The INDEPENDENT per-image RAI twin (the sf0.01 oracle golden's
    generator) must match the distributed engine pipeline bit-exactly at
    sf0.001: same integer-mils pops and same country for every image —
    the end-to-end certification behind the image_rai_summary oracle."""
    from sdg_engine.jobs.rai import load_inputs, rai_summaries

    twin = _make_goldens_mod().rai_per_image_twin(SF)
    want = {r[0]: r[1:] for r in twin}
    images, roads = load_inputs(spark, SF)
    per_image, _ = rai_summaries(spark, images, roads)
    got = per_image.select(
        "image_id", "country_code",
        F.expr("CAST(FLOOR(pop_total * 1000 + 0.5) AS BIGINT)").alias("pt"),
        F.expr("CAST(FLOOR(pop_near * 1000 + 0.5) AS BIGINT)").alias("pn"),
    ).toPandas()
    assert len(got) == len(want)
    bad = []
    for row in got.itertuples(index=False):
        w = want[row.image_id]
        if (row.country_code, row.pt, row.pn) != w:
            bad.append((row.image_id, (row.country_code, row.pt, row.pn), w))
    assert not bad, f"{len(bad)} mismatches, first: {bad[:3]}"


def test_golden_rai_summary(spark):
    """Full image pipeline vs the numpy-oracle per-country summary."""
    from sdg_engine.jobs.rai import load_inputs, rai_summaries

    images, roads = load_inputs(spark, SF)
    _per_image, per_country = rai_summaries(spark, images, roads)
    got = per_country.orderBy("country_code").toPandas()
    want = pd.DataFrame(_load("rai_summary.json"))
    assert (got["country_code"].values == want["country_code"].values).all()
    assert (got["n_images"].values == want["n_images"].values).all()
    assert (got["n_near"].values == want["n_near"].values).all()
    assert (abs(got["pop_total"].values - want["pop_total"].values) < 1e-2).all()
    assert (abs(got["pop_near"].values - want["pop_near"].values) < 1e-2).all()
    assert (abs(got["rai"].values - want["rai"].values) < 1e-6).all()
