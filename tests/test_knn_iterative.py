"""J4 unbounded ring-expansion kNN vs brute force; F1/F2 tag filters."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sdg_engine import METERS_PER_DEG
from sdg_engine import fixtures as FX
from sdg_engine.geom import point_segment_dist_sq
from sdg_engine.ops import spatial as SP

N = 150


def test_knn_ring_iterative_exact(spark):
    ids = [f"img{i:012d}" for i in range(N)]
    geo = SP.with_geo(spark.createDataFrame(pd.DataFrame({"image_id": ids})))
    lons, lats = FX.lonlat_batch(np.array(ids))
    recs = FX.roads_records(0.001)
    segs = SP.road_segments(spark.createDataFrame(recs))
    got = (
        SP.knn_ring_iterative(geo, segs, level=6)
        .orderBy("image_id")
        .toPandas()
    )
    assert len(got) == N  # no cutoff: every point gets a nearest road

    seg_list, seg_ids = [], []
    for r in recs:
        pts = np.array([[p["x"], p["y"]] for p in r["coords"]])
        for s_ in range(len(pts) - 1):
            seg_list.append((pts[s_, 0], pts[s_, 1], pts[s_ + 1, 0], pts[s_ + 1, 1]))
            seg_ids.append((r["road_id"], s_))
    seg_arr = np.array(seg_list)
    seg_ids = np.array(seg_ids)
    for j, iid in enumerate(ids):
        d = np.sqrt(
            point_segment_dist_sq(
                lons[j], lats[j], seg_arr[:, 0], seg_arr[:, 1],
                seg_arr[:, 2], seg_arr[:, 3],
            )
        ) * METERS_PER_DEG
        order = np.lexsort((seg_ids[:, 1], seg_ids[:, 0], d))
        best = order[0]
        row = got[got.image_id == iid].iloc[0]
        assert row.road_id == seg_ids[best, 0], (iid, row.road_id, seg_ids[best, 0])
        assert abs(row.dist_m - d[best]) < 1e-9
    # the ring schedule should settle most points before the fallback
    assert (got["k_settled"] > 0).mean() > 0.5


def test_road_tag_filters(spark):
    roads = spark.createDataFrame(FX.roads_records(0.001))
    filtered = SP.filter_roads(roads)
    assert filtered.count() == roads.count()  # fixture kinds are all roads
    tagged = SP.with_all_season(filtered)
    counts = dict(
        tagged.groupBy("all_season").count().collect()[i][0:2] for i in range(2)
    )
    # fixture surfaces cycle asphalt/concrete/gravel/dirt/unpaved/paved:
    # 3 paved, 3 unpaved of every 6 -> both classes present
    assert counts[True] > 0 and counts[False] > 0
    # surface drives the predicate when known
    one = tagged.filter(F.expr("tags['surface']") == "asphalt").select("all_season")
    assert all(r.all_season for r in one.collect())
