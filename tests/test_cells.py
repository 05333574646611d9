"""M0 property + unit tests for the quadtree cell index (SURVEY.md §5.3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sdg_engine import WORLD_MIN, WORLD_SIZE
from sdg_engine import cells as C


@given(
    st.integers(min_value=0, max_value=C.MAX_LEVEL),
    st.integers(min_value=0, max_value=2**26 - 1),
    st.integers(min_value=0, max_value=2**26 - 1),
)
def test_pack_unpack_roundtrip(level, ix, iy):
    n = 1 << level
    ix %= n
    iy %= n
    cid = C.pack(level, np.array([ix]), np.array([iy]))
    lvl2, ix2, iy2 = C.unpack(cid)
    assert (lvl2[0], ix2[0], iy2[0]) == (level, ix, iy)
    assert cid[0] >= 0  # stays in positive int64 domain


def test_morton_ordering_locality():
    # children of a cell are contiguous in code space
    cid = C.pack(3, np.array([2]), np.array([5]))
    ch = C.children(cid)[0]
    codes = ch & ((np.int64(1) << 54) - 1)
    assert list(codes) == list(range(int(codes[0]), int(codes[0]) + 4))
    for c in ch:
        assert C.parent(np.array([c]))[0] == cid[0]


@given(st.floats(0.0, 9.999999), st.floats(0.0, 9.999999),
       st.integers(min_value=1, max_value=20))
def test_point_cell_contains_point(x, y, level):
    cid = C.point_cell(np.array([x]), np.array([y]), level)
    xmin, ymin, xmax, ymax = C.cell_bounds(cid)
    assert xmin[0] <= x < xmax[0] + 1e-12
    assert ymin[0] <= y < ymax[0] + 1e-12


def test_cover_bbox_exact():
    # bbox spanning exactly 2x3 cells at level 2 (cell size 2.5)
    row, cid = C.cover_bbox(
        np.array([1.0]), np.array([1.0]), np.array([3.0]), np.array([6.0]), 2
    )
    assert (row == 0).all()
    lvl, ix, iy = C.unpack(cid)
    assert sorted(zip(ix.tolist(), iy.tolist())) == [
        (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)
    ]


def test_cover_bbox_multi_row_offsets():
    row, cid = C.cover_bbox(
        np.array([0.1, 5.1]),
        np.array([0.1, 5.1]),
        np.array([0.2, 9.9]),
        np.array([0.2, 9.9]),
        2,
    )
    assert (np.bincount(row) == [1, 4]).all()


@settings(max_examples=50)
@given(
    st.lists(
        st.tuples(st.floats(0.0, 9.9), st.floats(0.0, 9.9)),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=2, max_value=12),
)
def test_compact_uncompact_roundtrip(points, level):
    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    base = np.unique(C.point_cell(xs, ys, level))
    comp = C.compact(base)
    back = np.sort(C.uncompact(comp, level))
    assert np.array_equal(back, base)
    assert len(comp) <= len(base)


def test_compact_merges_full_quartet():
    # all 4 children of one parent → compacts to the parent
    par = C.pack(4, np.array([3]), np.array([9]))
    ch = C.children(par)[0]
    comp = C.compact(ch)
    assert np.array_equal(comp, par)


def test_range_at_level_covers_descendants():
    par = C.pack(3, np.array([1]), np.array([2]))
    lo, hi = C.range_at_level(par, 6)
    desc = C.uncompact(par, 6)
    assert desc.min() == lo[0] and desc.max() == hi[0] - 1
    assert len(desc) == 4 ** 3


@given(
    st.integers(min_value=1, max_value=14),
    st.floats(0.0, 9.99),
    st.floats(0.0, 9.99),
    st.integers(min_value=0, max_value=3),
)
def test_kring_symmetry(level, x, y, k):
    a = C.point_cell(np.array([x]), np.array([y]), level)
    _, ring_a = C.kring(a, k)
    for b in ring_a:
        _, ring_b = C.kring(np.array([b]), k)
        assert a[0] in ring_b  # b ∈ kring(a,k) ⇔ a ∈ kring(b,k)


def test_kring_size_interior():
    a = C.point_cell(np.array([5.0]), np.array([5.0]), 10)
    row, cids = C.kring(a, 2)
    assert len(cids) == 25
    assert len(np.unique(cids)) == 25


def test_ring_is_hollow():
    a = C.point_cell(np.array([5.0]), np.array([5.0]), 10)
    _, full = C.kring(a, 2)
    _, inner = C.kring(a, 1)
    _, shell = C.ring(a, 2)
    assert sorted(shell) == sorted(set(full) - set(inner))


def test_kring_clips_world_edge():
    a = C.point_cell(np.array([0.0]), np.array([0.0]), 10)  # corner cell
    _, cids = C.kring(a, 1)
    assert len(cids) == 4  # 2x2 corner neighborhood


def test_hex_cell_nearest_center():
    """Every point's assigned hex center is the nearest hex center
    (within float ties) and within the circumradius."""
    import numpy as np

    from sdg_engine import cells as C

    rng = np.random.default_rng(5)
    size = 0.05
    x = rng.uniform(0, 10, 5000)
    y = rng.uniform(0, 10, 5000)
    h = C.hex_cell(x, y, size)
    cx, cy = C.hex_center(h, size)
    d_own = np.hypot(x - cx, y - cy)
    assert (d_own <= size + 1e-9).all()
    # nearest among the 7-cell neighborhood (own + 6 axial neighbors)
    q = h // 16384 - 8192
    r = h % 16384 - 8192
    best = d_own.copy()
    for dq, dr in ((1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)):
        nid = ((q + dq) + 8192) * 16384 + ((r + dr) + 8192)
        nx, ny = C.hex_center(nid, size)
        best = np.minimum(best, np.hypot(x - nx, y - ny))
    assert (d_own <= best + 1e-9).all()


def test_compact_overlapping_mixed_level_input():
    """r03 review: a parent present ALONGSIDE its own children must not
    be duplicated (and must not inflate the next level's sibling count
    into compacting an incomplete quartet)."""
    import numpy as np

    from sdg_engine import cells as C

    p = C.pack(2, np.array([1]), np.array([1]))  # one level-2 cell
    kids = C.children(p).ravel()
    out = C.compact(np.concatenate([p, kids]))
    assert out.tolist() == sorted(p.tolist())  # just the parent, once

    # parent + children of sibling A, plus siblings B, C (sibling D
    # absent): the cover must NOT merge up to the grandparent
    g = C.pack(1, np.array([0]), np.array([0]))
    a, b, c, _d = C.children(g).ravel()
    a_kids = C.children(np.array([a])).ravel()
    got = C.compact(np.concatenate([[a], a_kids, [b], [c]]))
    assert got.tolist() == sorted([int(a), int(b), int(c)])


def test_pyramid_rollup_conserves_counts(spark):
    """C1b (r04): every pyramid level's per-cell counts must sum to the
    point total, and each level's cell ids must carry that level in the
    packed high bits."""
    from pyspark.sql import functions as F

    from sdg_engine.queries import QUERIES

    df = QUERIES["spatial_pyramid"](spark, "/root/testdata/sf0.001")
    per_level = {
        r["level"]: r["total"]
        for r in df.groupBy("level").agg(F.sum("n_points").alias("total")).collect()
    }
    assert set(per_level) == {9, 10, 11, 12}
    assert len(set(per_level.values())) == 1  # same total at every level
    bad = df.filter(F.expr("(cell >> 54) != level")).count()
    assert bad == 0
