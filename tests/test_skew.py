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
