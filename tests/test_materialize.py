"""node_props edge cases surfaced by review: literal-free blocks
(schema stability) and cross-block value merges."""

import pandas as pd
import pytest


def _edges_ds(ray, rows, parts):
    import ray.data
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj",
                                     "obj_is_literal", "obj_datatype"])
    return ray.data.from_pandas(df).repartition(parts)


def test_props_with_literal_free_block(ray_session):
    from uckg_ray.stages.materialize import node_props
    rows = [("s1", "p", "v1", True, "xsd:string")]
    # many IRI-only rows → some blocks have zero literal rows
    rows += [("s2", "rdf:type", f"C{i}", False, "") for i in range(40)]
    out = node_props(_edges_ds(ray_session, rows, 8)).take_all()
    assert out == [{"subj": "s1", "pred": "p", "vals": "v1"}]


def test_props_cross_block_merge(ray_session):
    from uckg_ray.stages.materialize import node_props
    # same (subj,pred) key with values scattered over 6 blocks, with dups
    rows = [("s", "p", f"v{i % 4}", True, "xsd:string") for i in range(12)]
    rows += [("t", "q", "only", True, "xsd:string")]
    out = {(r["subj"], r["pred"]): r["vals"]
           for r in node_props(_edges_ds(ray_session, rows, 6)).take_all()}
    assert out[("s", "p")] == "v0;;v1;;v2;;v3"
    assert out[("t", "q")] == "only"


def test_distinct_edges_rejects_null_key_fields(ray_session):
    """Null key fields would encode to null sort keys and silently
    collapse distinct rows — both encoders must raise instead."""
    import ray.data

    from uckg_ray.stages.materialize import distinct_edges

    df = pd.DataFrame({
        "subj": ["a", "b"], "pred": ["p", "p"], "obj": ["x", "y"],
        "obj_is_literal": [False, False],
        "obj_datatype": ["", None],      # one null field
    })
    for sort in (True, False):
        with pytest.raises(Exception, match="null"):
            distinct_edges(ray.data.from_pandas(df), sort=sort).materialize()
