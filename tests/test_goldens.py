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
