"""Distributed union-find vs single-process oracle, incl. hub skew."""

import pandas as pd
import pytest

from uckg_ray.stages.canonicalize import (canonical_map, connected_components,
                                          union_find_oracle)


def _pairs_ds(ray, pairs):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame(pairs, columns=["alias", "entity_id"]))


def test_union_find_oracle_basic():
    canon = union_find_oracle([("a", "e2"), ("a", "e1"), ("b", "e3")])
    assert canon == {"e1": "e1", "e2": "e1", "e3": "e3"}


def test_chain_merge(ray_session):
    # e1—a—e2, e2—b—e3: all three merge through distinct aliases
    pairs = [("a", "e1"), ("a", "e2"), ("b", "e2"), ("b", "e3"), ("c", "e9")]
    got = canonical_map(_pairs_ds(ray_session, pairs))
    want = union_find_oracle(pairs)
    assert dict(zip(got["entity_id"], got["canonical_id"])) == want


def test_hub_entity(ray_session):
    # one hub entity with 60 aliases + a chain hanging off one alias
    pairs = [(f"al{i}", "hub") for i in range(60)]
    pairs += [("al0", "other"), ("x", "other"), ("x", "third")]
    got = canonical_map(_pairs_ds(ray_session, pairs))
    want = union_find_oracle(pairs)
    assert dict(zip(got["entity_id"], got["canonical_id"])) == want
    assert want["third"] == "hub"  # transitively merged


def test_connected_components_labels(ray_session):
    import ray.data
    edges = ray.data.from_pandas(pd.DataFrame(
        [("n1", "n2"), ("n2", "n3"), ("n5", "n6")], columns=["src", "dst"]))
    cc = connected_components(edges, "src", "dst")
    labels = {r["node"]: r["label"] for r in cc.take_all()}
    assert labels == {"n1": "n1", "n2": "n1", "n3": "n1", "n5": "n5", "n6": "n5"}


def test_fixture_alias_graph(ray_session, sf_small_fixtures):
    """The generated alias dictionary must exercise real merges."""
    import os
    import pyarrow.parquet as pq
    tbl = pq.read_table(os.path.join(sf_small_fixtures, "alias_dict.parquet"))
    pairs = list(zip(tbl.column("block_key").to_pylist(),
                     tbl.column("entity_id").to_pylist()))
    want = union_find_oracle(pairs)
    # portscanner bridges nmap and masscan
    assert want["tool:masscan"] == want["tool:nmap"]
    # cracker bridges john and hashcat; bruteforcer bridges hydra and john
    assert want["tool:hashcat"] == want["tool:hydra"]
    got = canonical_map(_pairs_ds(ray_session, pairs))
    assert dict(zip(got["entity_id"], got["canonical_id"])) == want


def test_salted_cc_identical(ray_session):
    """Explicit hub salting must not change results — hub graph with 200
    aliases plus chain merges, salted vs unsalted."""
    pairs = [(f"al{i}", "hub") for i in range(200)]
    pairs += [("al0", "other"), ("x", "other"), ("x", "third"), ("y", "lone")]
    ds = _pairs_ds(ray_session, pairs)
    unsalted = canonical_map(ds, salt=1)
    salted = canonical_map(_pairs_ds(ray_session, pairs), salt=4)
    assert dict(zip(unsalted["entity_id"], unsalted["canonical_id"])) == \
           dict(zip(salted["entity_id"], salted["canonical_id"])) == \
           union_find_oracle(pairs)
