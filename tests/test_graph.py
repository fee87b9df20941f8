"""Graph operators: triangle enumeration."""

import pyarrow as pa

from uckg_ray import namespaces as ns


def _edges_ds(ray_session, rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows],
        "obj_is_literal": pa.array([r[3] for r in rows], pa.bool_()),
        "obj_datatype": [""] * len(rows)}))


def test_triangles(ray_session):
    from uckg_ray.stages.graph import triangles
    P = "http://x/rel"
    rows = [
        # triangle a-b-c (one edge reversed to test undirection)
        ("a", P, "b", False), ("c", P, "b", False), ("a", P, "c", False),
        # wedge only: a-d, b-d but no a-b dup needed (a-b exists → a,b,d
        # is a triangle ONLY if b-d and a-d both exist... they do → yes)
        ("d", P, "a", False), ("b", P, "d", False),
        # dangling edge + literal + self-loop + type edge — all ignored
        ("e", P, "f", False), ("a", P, "name", True),
        ("g", P, "g", False),
        ("a", ns.RDF_TYPE, "T", False), ("b", ns.RDF_TYPE, "T", False),
        ("c", ns.RDF_TYPE, "T", False),
    ]
    got = {(r["a"], r["b"], r["c"])
           for r in triangles(_edges_ds(ray_session, rows)).take_all()}
    assert got == {("a", "b", "c"), ("a", "b", "d")}


def test_triangles_duplicate_edges_collapse(ray_session):
    from uckg_ray.stages.graph import triangles
    P, Q = "http://x/p", "http://x/q"
    rows = [("a", P, "b", False), ("b", Q, "a", False),
            ("b", P, "c", False), ("a", P, "c", False)]
    got = [(r["a"], r["b"], r["c"])
           for r in triangles(_edges_ds(ray_session, rows)).take_all()]
    assert got == [("a", "b", "c")]  # multi-pred parallel edges dedupe
