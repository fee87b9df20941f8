"""Hub-key skew: a triple repeated across half the input must not
funnel raw rows into one task — the block-local combiner collapses it
to ≤ one row per block before any shuffle (SURVEY.md §5.4)."""

import numpy as np
import pandas as pd
import pytest


def test_hub_triple_dedup(ray_session):
    import ray.data
    from uckg_ray.stages.materialize import distinct_edges
    n = 200_000
    rng = np.random.default_rng(3)
    # 50% hub triple, 50% long tail
    hub = rng.random(n) < 0.5
    tail_ids = rng.integers(0, 20_000, n)
    df = pd.DataFrame({
        "subj": np.where(hub, "uco#HUB", [f"uco#T{i}" for i in tail_ids]),
        "pred": "rdf:type",
        "obj": np.where(hub, "uco#CVE", [f"uco#C{i % 7}" for i in tail_ids]),
        "obj_is_literal": False,
        "obj_datatype": "",
    })
    ds = ray.data.from_pandas(df).repartition(16)
    out = distinct_edges(ds, sort=True)
    rows = out.take_all()
    keys = [(r["subj"], r["pred"], r["obj"]) for r in rows]
    want = set(zip(df.subj, df.pred, df.obj))
    assert len(keys) == len(set(keys)) == len(want)
    assert keys == sorted(keys)
    assert ("uco#HUB", "rdf:type", "uco#CVE") in set(keys)


def test_hub_subject_node_aggregation(ray_session):
    import ray.data
    from uckg_ray.stages.materialize import node_table
    n = 50_000
    # one subject holds 90% of edges (distinct objs), rest spread out
    df = pd.DataFrame({
        "subj": ["uco#HUB" if i % 10 else f"uco#S{i}" for i in range(n)],
        "pred": "uco#p",
        "obj": [f"v{i}" for i in range(n)],
        "obj_is_literal": True,
        "obj_datatype": "xsd:string",
    })
    ds = ray.data.from_pandas(df).repartition(16)
    rows = node_table(ds).take_all()
    by_subj = {r["subj"]: r for r in rows}
    assert by_subj["uco#HUB"]["n_edges"] == sum(1 for i in range(n) if i % 10)
    assert len(rows) == 1 + sum(1 for i in range(n) if i % 10 == 0)


def _skewed_events(n=20_000, seed=11):
    """One hot user holds 50% of events, spread over many time buckets."""
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < 0.5
    users = np.where(hot, 1, rng.integers(2, 500, n))
    ts_us = rng.integers(0, 30 * 86_400_000_000, n)  # 30 days of micros
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": users.astype(np.int64),
        "event_type": np.where(rng.random(n) < 0.5, "click", "view"),
        "ts": pd.to_datetime(ts_us, unit="us"),
        "value": rng.random(n).round(3),
    })


def test_asof_join_hot_key_bucketed(ray_session):
    """Time-range bucketing must reproduce the single-group merge_asof
    exactly — including matches that cross bucket boundaries — while a
    hot key spreads across (key, bucket) tasks instead of one."""
    import ray.data
    from uckg_ray.stages.joins import asof_join_events
    df = _skewed_events()
    ds = ray.data.from_pandas(df).repartition(8)
    rows = asof_join_events(ds, left_type="click", right_type="view",
                            bucket_minutes=60).take_all()
    got = {r["left_id"]: r["right_id"] for r in rows}
    # pandas oracle: per-user backward merge_asof
    want = {}
    for u, g in df.groupby("user_id"):
        left = g[g.event_type == "click"].sort_values(["ts", "event_id"])
        right = g[g.event_type == "view"].sort_values(["ts", "event_id"])
        for _, lr in left.iterrows():
            prior = right[right.ts <= lr.ts]
            want[int(lr.event_id)] = (int(prior.iloc[-1].event_id)
                                      if len(prior) else None)
    assert got == want


def test_sessionize_hot_key_bucketed(ray_session):
    """Fragment-stitch sessionization == single-group sessionization,
    including sessions spanning bucket boundaries."""
    import ray.data
    from uckg_ray.stages.windows import sessionize
    df = _skewed_events(n=10_000, seed=12)
    ds = ray.data.from_pandas(df).repartition(8)
    rows = sessionize(ds, gap_minutes=30, bucket_minutes=60).take_all()
    got = {(r["user_id"], r["session_start_us"]):
           (r["n_events"], r["duration_us"]) for r in rows}
    want = {}
    gap_us = 30 * 60 * 1_000_000
    for u, g in df.groupby("user_id"):
        ts = np.sort(g.ts.astype("datetime64[us]").astype("int64").to_numpy())
        brk = np.ones(len(ts), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(brk) - 1
        for s in np.unique(sid):
            m = ts[sid == s]
            want[(int(u), int(m[0]))] = (len(m), int(m[-1] - m[0]))
    assert got == want
