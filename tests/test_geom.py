"""M0 tests for geometry kernels vs brute-force oracles (SURVEY.md §5.3)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sdg_engine import METERS_PER_DEG
from sdg_engine import geom as G

coord = st.floats(min_value=-5.0, max_value=15.0, allow_nan=False, allow_infinity=False)


def _brute_pip(px, py, ring):
    """Slow winding-number oracle (angle sum)."""
    angles = 0.0
    for i in range(len(ring) - 1):
        ax, ay = ring[i] - np.array([px, py])
        bx, by = ring[i + 1] - np.array([px, py])
        cross = ax * by - ay * bx
        dot = ax * bx + ay * by
        angles += np.arctan2(cross, dot)
    return abs(angles) > np.pi


def _random_simple_polygon(rng, n):
    # star-shaped polygon around a center → always simple
    cx, cy = rng.uniform(2, 8, 2)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = rng.uniform(0.5, 4.0, n)
    pts = np.stack([cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1)
    return np.concatenate([pts, pts[:1]])


@settings(max_examples=60)
@given(st.integers(min_value=0, max_value=10_000))
def test_pip_matches_winding_oracle(seed):
    rng = np.random.default_rng(seed)
    ring = _random_simple_polygon(rng, int(rng.integers(3, 12)))
    px = rng.uniform(0, 10, 20)
    py = rng.uniform(0, 10, 20)
    got = G.points_in_polygon(px, py, ring)
    want = np.array([_brute_pip(x, y, ring) for x, y in zip(px, py)])
    assert np.array_equal(got, want)


def test_pip_square():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    inside = G.points_in_polygon(np.array([2.0, 5.0]), np.array([2.0, 2.0]), ring)
    assert inside.tolist() == [True, False]


@settings(max_examples=80)
@given(coord, coord, coord, coord, coord, coord)
def test_point_segment_dist_vs_sampling(px, py, ax, ay, bx, by):
    d = float(
        G.point_segment_dist_m(
            np.array([px]), np.array([py]), np.array([ax]),
            np.array([ay]), np.array([bx]), np.array([by]),
        )[0]
    )
    t = np.linspace(0, 1, 257)
    sx = ax + t * (bx - ax)
    sy = ay + t * (by - ay)
    sampled = np.sqrt((px - sx) ** 2 + (py - sy) ** 2).min() * METERS_PER_DEG
    assert d <= sampled + 1e-6
    # sampling is a fine upper bound: true min within seg_len/256 of a sample
    seg_len = np.hypot(bx - ax, by - ay) * METERS_PER_DEG
    assert sampled - d <= seg_len / 256 + 1e-6


def test_point_segment_degenerate():
    d = G.point_segment_dist_m(
        np.array([3.0]), np.array([4.0]), np.array([0.0]),
        np.array([0.0]), np.array([0.0]), np.array([0.0]),
    )
    assert abs(d[0] - 5.0 * METERS_PER_DEG) < 1e-6


def test_clip_segments():
    keep, cax, cay, cbx, cby = G.clip_segments_to_rect(
        np.array([-1.0, 5.0, -2.0]),
        np.array([1.0, 5.0, -2.0]),
        np.array([3.0, 6.0, -1.0]),
        np.array([1.0, 5.0, -1.0]),
        0.0, 0.0, 2.0, 2.0,
    )
    assert keep.tolist() == [True, False, False]
    assert cax[0] == 0.0 and cbx[0] == 2.0 and cay[0] == 1.0


def test_polyline_length():
    coords = np.array([[0.0, 0.0], [3.0, 4.0]])
    assert abs(G.polyline_length_m(coords) - 5 * METERS_PER_DEG) < 1e-9


def test_seg_bbox_dist_zero_when_overlap():
    d2 = G.seg_bbox_dist_sq(
        np.array([1.0]), np.array([1.0]), np.array([2.0]), np.array([2.0]),
        0.0, 0.0, 3.0, 3.0,
    )
    assert d2[0] == 0.0


def test_webmercator_roundtrip_and_spark_parity(spark):
    """Forward/inverse round-trip < 1e-9 deg; the Spark JVM expression
    matches numpy to float64 precision on the fixture points."""
    import numpy as np

    from sdg_engine.geom import (
        lonlat_to_webmercator,
        webmercator_to_lonlat,
        with_webmercator,
    )

    rng = np.random.default_rng(3)
    lon = rng.uniform(-179, 179, 2000)
    lat = rng.uniform(-84, 84, 2000)
    x, y = lonlat_to_webmercator(lon, lat)
    lon2, lat2 = webmercator_to_lonlat(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # known anchor: (0,0) -> (0,0); 180° -> ~20037508.34 m
    ax, _ = lonlat_to_webmercator(np.array([180.0]), np.array([0.0]))
    assert abs(ax[0] - 20037508.342789244) < 1e-6
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    got = with_webmercator(df).orderBy("lon").toPandas()
    order = np.argsort(lon)
    assert np.abs(got["merc_x"].to_numpy() - x[order]).max() < 1e-6
    assert np.abs(got["merc_y"].to_numpy() - y[order]).max() < 1e-6
