"""INDEPENDENT invariant gates for the wave-21 operators."""

import math
from collections import deque

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _pdf(df) -> pd.DataFrame:
    return df.toPandas()


def test_graph_diameter_matches_python_bfs(spark):
    from sdg_engine.queries_r5 import _BFS_NODE
    from sdg_engine.queries_r5e import roads_graph_diameter
    from sdg_engine.queries_ext import _fixture_images

    out = _pdf(roads_graph_diameter(spark, SF)).iloc[0]
    rp = _pdf(_fixture_images(spark, SF, pin_sf=0.01)[1])
    adj: dict = {}
    for r in rp.itertuples():
        nds = [
            (int(math.floor(c["x"] * 10 + 0.5)) + 100) * 1000
            + (int(math.floor(c["y"] * 10 + 0.5)) + 100)
            for c in r.coords
        ]
        for a, b in zip(nds, nds[1:]):
            if a != b:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)

    def bfs(src):
        hops = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in hops:
                    hops[v] = hops[u] + 1
                    q.append(v)
        return hops

    hub = min(adj, key=lambda n: (-len(adj[n]), n))
    assert int(out.hub) == hub
    h1 = bfs(hub)
    e1 = max(h1.values())
    u = min(n for n, d in h1.items() if d == e1)
    assert (int(out.ecc_hub), int(out.u)) == (e1, u)
    h2 = bfs(u)
    e2 = max(h2.values())
    v = min(n for n, d in h2.items() if d == e2)
    assert (int(out.diameter_lb), int(out.v)) == (e2, v)
    assert int(out.n_reachable) == len(h2)
    assert int(out.chk) == sum(h2)
    # double-sweep invariant: the second eccentricity dominates
    assert e2 >= e1


def test_fast_kernel_detects_synthetic_corner():
    from sdg_engine.ops.payload import fast_corner_kernel

    # flat image: no corners anywhere
    lum = np.full((16, 16), 100_000, dtype=np.int64)
    assert fast_corner_kernel(lum)[1] == 0
    # a single bright dot: its 16-circle is uniformly DARKER than the
    # center -> a dark-arc corner at exactly the dot pixel
    lum2 = lum.copy()
    lum2[8, 8] = 200_000
    n_int, n_c, n_b, n_d, chk = fast_corner_kernel(lum2)
    assert (n_c, n_b, n_d) == (1, 0, 1)
    # a bright half-plane edge: every boundary-adjacent interior pixel
    # sees a contiguous bright/dark arc of 8, never 12 -> no corners
    lum3 = lum.copy()
    lum3[:, 8:] += 50_000
    assert fast_corner_kernel(lum3)[1] == 0
    # a 90-degree quadrant corner shows only an 11-long darker arc —
    # FAST-12 correctly rejects it (the reason FAST-9 exists)
    lum4 = lum.copy()
    lum4[:8, :8] += 50_000
    assert fast_corner_kernel(lum4)[1] == 0
    # a 2x2 bright blob: every blob pixel's full 16-circle lies outside
    # the blob -> 4 dark-arc corners
    lum5 = lum.copy()
    lum5[8:10, 8:10] = 200_000
    n_int, n_c, n_b, n_d, chk = fast_corner_kernel(lum5)
    assert (n_c, n_b, n_d) == (4, 0, 4)


def test_seasonal_decompose_matches_pandas(spark):
    from sdg_engine.queries_r5e import events_seasonal_decompose

    out = _pdf(events_seasonal_decompose(spark, SF)).set_index("dow")
    ev = _pdf(spark.read.parquet(f"{SF}/events.parquet"))
    us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    ev = ev.assign(d=us // 86_400_000_000,
                   cents=np.floor(ev.value * 100 + 0.5).astype(np.int64))
    daily = ev.groupby("d").cents.sum()
    d0, d1 = int(daily.index.min()), int(daily.index.max())
    dense = daily.reindex(range(d0, d1 + 1), fill_value=0)
    v = dense.to_numpy()
    days = np.arange(d0, d1 + 1)

    def tdiv(a, b):
        return int(np.sign(a)) * (abs(int(a)) // b)

    det, dow = [], []
    for i in range(3, len(v) - 3):
        trend = tdiv(int(v[i - 3:i + 4].sum()), 7)
        det.append(int(v[i]) - trend)
        dow.append(int(days[i] % 7))
    det = np.array(det)
    dow = np.array(dow)
    for w in sorted(set(dow)):
        sel = det[dow == w]
        seas = tdiv(int(sel.sum()), len(sel))
        row = out.loc[w]
        assert int(row.n_days) == len(sel)
        assert int(row.seasonal_cents) == seas
        r = sel - seas
        assert int(row.sum_resid_sq) == int((r * r).sum())
        assert int(row.sum_resid) == int(r.sum())
