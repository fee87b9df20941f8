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


def test_bfs_levels_min_hop_and_exclusions(ray_session):
    """BFS assigns the MINIMUM directed hop count from the seed-typed
    nodes; rdf:type / literal edges never expand; the hop cap holds;
    unreachable nodes are absent."""
    from uckg_ray.stages.graph import bfs_levels
    P = "http://x/rel"
    T = "http://x/Seed"
    rows = [
        ("s1", ns.RDF_TYPE, T, False), ("s2", ns.RDF_TYPE, T, False),
        # s1 -> a -> b -> c -> d (d is beyond the 3-hop cap)
        ("s1", P, "a", False), ("a", P, "b", False),
        ("b", P, "c", False), ("c", P, "d", False),
        # s2 -> b gives b a SHORTER path (lvl 1, not 2)
        ("s2", P, "b", False),
        # back-edge into a seed: seed stays lvl 0
        ("a", P, "s2", False),
        # literal and rdf:type objects never become frontier nodes
        ("s1", P, "lit", True), ("x", ns.RDF_TYPE, "y", False),
        # unreachable component
        ("u", P, "v", False),
    ]
    got = {r["node"]: r["lvl"]
           for r in bfs_levels(_edges_ds(ray_session, rows), T,
                               max_hops=3).take_all()}
    assert got == {"s1": 0, "s2": 0, "a": 1, "b": 1, "c": 2, "d": 3}
    # tighter cap prunes the tail
    got2 = {r["node"]: r["lvl"]
            for r in bfs_levels(_edges_ds(ray_session, rows), T,
                                max_hops=1).take_all()}
    assert got2 == {"s1": 0, "s2": 0, "a": 1, "b": 1}


def test_predicate_components(ray_session):
    """CC restricted to ONE predicate: other predicates never merge
    components; labels are the component-minimum node id; direction is
    ignored; self-loops contribute nothing."""
    from uckg_ray.stages.graph import predicate_components
    P, Q = "http://x/rel", "http://x/other"
    rows = [
        ("b", P, "a", False), ("b", P, "c", False),   # {a,b,c} -> a
        ("e", P, "d", False),                          # {d,e}   -> d
        ("c", Q, "d", False),                          # Q must NOT merge
        ("f", P, "f", False),                          # self-loop ignored
        ("a", ns.RDF_TYPE, "T", False),
    ]
    got = {r["node"]: r["comp"]
           for r in predicate_components(
               _edges_ds(ray_session, rows), P).take_all()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_clustering_counts(ray_session):
    """tri_cnt counts the triangles each node sits in; wedge_cnt is
    d*(d-1)/2 of the undirected dedup'd degree; degree-1 nodes and
    literal/type/self-loop edges are excluded."""
    from uckg_ray.stages.graph import clustering_counts
    P = "http://x/rel"
    rows = [
        # triangle a-b-c, plus pendant a-d (a has deg 3)
        ("a", P, "b", False), ("b", P, "c", False), ("c", P, "a", False),
        ("a", P, "d", False),
        # parallel/reversed duplicate collapses in the und distinct
        ("b", P, "a", False),
        # excluded: dangling pair, literal, self-loop, type edges
        ("e", P, "f", False), ("a", P, "lit", True),
        ("g", P, "g", False), ("a", ns.RDF_TYPE, "T", False),
    ]
    got = {r["node"]: (r["tri_cnt"], r["wedge_cnt"])
           for r in clustering_counts(_edges_ds(ray_session, rows),
                                      num_partitions=3).take_all()}
    # degrees: a=3 (b,c,d), b=2, c=2, d=1, e=1, f=1
    assert got == {"a": (1, 3), "b": (1, 1), "c": (1, 1)}


def test_reciprocal_pairs(ray_session):
    """Both directions required; literals, rdf:type and self-loops
    excluded; each unordered pair counted once per predicate."""
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import reciprocal_pairs

    def e(s, p, o, lit=False):
        return {"subj": s, "pred": p, "obj": o,
                "obj_is_literal": lit, "obj_datatype": ""}

    rows = [
        e("a", "p1", "b"), e("b", "p1", "a"),      # reciprocal pair
        e("a", "p1", "c"),                          # one direction only
        e("x", "p2", "y"), e("y", "p2", "x"),
        e("y", "p2", "z"), e("z", "p2", "y"),       # two pairs for p2
        e("a", "p3", "a"),                          # self-loop ignored
        e("a", "p4", "lit", lit=True),              # literal ignored
        e("a", ns.RDF_TYPE, "T"), e("T", ns.RDF_TYPE, "a"),  # type ignored
    ]
    got = {r["pred"]: r["n_pairs"]
           for r in reciprocal_pairs(
               ray.data.from_items(rows).repartition(4)).take_all()}
    assert got == {"p1": 1, "p2": 2}


def test_predicate_stats(ray_session):
    """Per-predicate VoID profile: counts, literal counts, distinct
    subject/object cardinalities."""
    import ray.data

    from uckg_ray.stages.graph import predicate_stats

    rows = [
        {"subj": "a", "pred": "p", "obj": "x", "obj_is_literal": False},
        {"subj": "a", "pred": "p", "obj": "y", "obj_is_literal": False},
        {"subj": "b", "pred": "p", "obj": "x", "obj_is_literal": False},
        {"subj": "a", "pred": "q", "obj": "lit", "obj_is_literal": True},
        {"subj": "b", "pred": "q", "obj": "lit", "obj_is_literal": True},
        {"subj": "b", "pred": "q", "obj": "z", "obj_is_literal": False},
    ]
    got = {r["pred"]: (r["n_edges"], r["n_literal_obj"],
                       r["n_distinct_subj"], r["n_distinct_obj"])
           for r in predicate_stats(
               ray.data.from_items(rows).repartition(3)).take_all()}
    assert got == {"p": (3, 0, 2, 2), "q": (3, 2, 2, 2)}


def test_degree_histogram(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.graph import degree_histogram

    edges = ray.data.from_arrow(pa.table({
        "subj": ["a", "a", "a", "b", "b", "c"],
        "pred": ["p"] * 6,
        "obj": ["x", "y", "z", "x", "y", "x"],
        "obj_is_literal": [False] * 6}))
    got = {r["degree"]: r["n_nodes"]
           for r in degree_histogram(edges).take_all()}
    assert got == {3: 1, 2: 1, 1: 1}


def test_class_sizes(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import class_sizes

    edges = ray.data.from_arrow(pa.table({
        "subj": ["a", "b", "c", "a"],
        "pred": [ns.RDF_TYPE, ns.RDF_TYPE, ns.RDF_TYPE, "other"],
        "obj": ["T1", "T1", "T2", "T1"]}))
    got = {r["class_iri"]: r["n_instances"]
           for r in class_sizes(edges).take_all()}
    assert got == {"T1": 2, "T2": 1}


def test_untyped_nodes(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import untyped_nodes

    edges = ray.data.from_arrow(pa.table({
        "subj": ["a", "a", "b", "c"],
        "pred": [ns.RDF_TYPE, "likes", "likes", ns.RDF_TYPE],
        "obj": ["T", "b", "a", "T"]})).repartition(3)
    got = {r["subj"] for r in untyped_nodes(edges).take_all()}
    assert got == {"b"}


def test_comention_lift(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.graph import comention_lift

    # 4 convs; A+B co-occur in 2, A+C in 1 (below min_pairs)
    m = pd.DataFrame({
        "conv_id": ["c1", "c1", "c1", "c2", "c2", "c3", "c3", "c4"],
        "ent_id":  ["A",  "B",  "B",  "A",  "B",  "A",  "C",  "D"]})
    ds = ray.data.from_pandas(m).repartition(3)
    rows = comention_lift(ds, min_pairs=2).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert (r["ent_a"], r["ent_b"], r["n_ab"]) == ("A", "B", 2)
    assert (r["n_a"], r["n_b"]) == (3, 2)
    # lift = 2 * 4 convs * 1e6 // (3*2)
    assert r["lift_ppm"] == 2 * 4 * 1_000_000 // 6


def test_characteristic_sets(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.graph import characteristic_sets

    edges = ray.data.from_arrow(pa.table({
        "subj": ["a", "a", "a", "b", "b", "c"],
        "pred": ["p1", "p2", "p1", "p1", "p2", "p1"],
        "obj":  ["x", "y", "z", "x", "y", "x"]})).repartition(3)
    got = {r["char_set"]: r["n_subjects"]
           for r in characteristic_sets(edges).take_all()}
    assert got == {"p1;;p2": 2, "p1": 1}


def test_dangling_refs(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import dangling_refs

    edges = ray.data.from_arrow(pa.table({
        "subj": ["a", "a", "b", "a"],
        "pred": ["likes", "likes", "likes", ns.RDF_TYPE],
        # d is referenced twice and never a subject; b is referenced
        # but IS a subject; T is a type object (excluded); lit is a
        # literal (excluded)
        "obj": ["d", "d", "d", "T"],
        "obj_is_literal": [False, False, False, False]})) \
        .union(ray.data.from_arrow(pa.table({
            "subj": ["b"], "pred": ["note"], "obj": ["lit"],
            "obj_is_literal": [True]})))
    rows = dangling_refs(edges).take_all()
    assert rows == [{"obj": "d", "n_refs": 3}]


def test_comention_lift_forced_shuffle_path(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.graph import comention_lift

    m = pd.DataFrame({
        "conv_id": ["c1", "c1", "c2", "c2", "c3", "c3", "c4", "c4"],
        "ent_id":  ["A",  "B",  "A",  "B",  "A",  "C",  "A",  "C"]})
    ds = ray.data.from_pandas(m).repartition(3)
    broad = sorted(
        (r["ent_a"], r["ent_b"], r["n_ab"], r["n_a"], r["n_b"],
         r["lift_ppm"])
        for r in comention_lift(ds, min_pairs=2).take_all())
    shuf = sorted(
        (r["ent_a"], r["ent_b"], r["n_ab"], r["n_a"], r["n_b"],
         r["lift_ppm"])
        for r in comention_lift(ds, min_pairs=2,
                                broadcast_max=0).take_all())
    assert broad == shuf
    assert broad == [("A", "B", 2, 4, 2, 1_000_000),
                     ("A", "C", 2, 4, 2, 1_000_000)]


def test_star_query_all_patterns_required(ray_session):
    import ray.data

    from uckg_ray.stages.graph import star_query

    e = pa.table({
        "subj": ["s1", "s1", "s1", "s2", "s2", "s3", "s3", "s3"],
        "pred": ["type", "p", "q", "type", "p", "type", "q", "q"],
        "obj":  ["C",   "x", "y", "C",    "z", "D",    "y", "w"],
    })
    ds = ray.data.from_arrow(e).repartition(3)
    # bound type + two any-object patterns: only s1 has all three
    got = sorted(r["subj"] for r in star_query(
        ds, [("type", "C"), ("p", None), ("q", None)]).take_all())
    assert got == ["s1"]
    # two patterns: s1 and s2 (typed C with a p edge)
    got2 = sorted(r["subj"] for r in star_query(
        ds, [("type", "C"), ("p", None)]).take_all())
    assert got2 == ["s1", "s2"]


def test_shacl_min_counts(ray_session):
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import shacl_min_counts

    e = pa.table({
        "subj": ["a", "a", "a", "b", "c", "c", "c", "c"],
        "pred": [ns.RDF_TYPE, "p", "p", ns.RDF_TYPE,
                 ns.RDF_TYPE, "p", "p", "p"],
        # a: typed C, 1 distinct p value (dup collapsed); b: typed C,
        # zero p; c: typed C, 2 distinct values
        "obj":  ["C", "x", "x", "C", "C", "y", "y", "z"],
    })
    ds = ray.data.from_arrow(e).repartition(3)
    got = {(r["shape"], r["focus"]): r["n_values"]
           for r in shacl_min_counts(
               ds, [("need1", "C", "p", 1),
                    ("need2", "C", "p", 2)]).take_all()}
    assert got == {("need1", "b"): 0,
                   ("need2", "a"): 1, ("need2", "b"): 0}


def test_class_property_fill(ray_session):
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import class_property_fill

    e = pa.table({
        "subj": ["a", "a", "a", "b", "b", "c", "c"],
        "pred": [ns.RDF_TYPE, "p", "p", ns.RDF_TYPE, "q",
                 ns.RDF_TYPE, "p"],
        "obj":  ["C", "x", "y", "C", "z", "D", "w"],
    })
    got = {(r["cls"], r["pred"]): r["n_subjects"]
           for r in class_property_fill(
               ray.data.from_arrow(e).repartition(3),
               num_partitions=4).take_all()}
    # a and b are C; only a has p, only b has q; c is D with p
    assert got == {("C", "p"): 1, ("C", "q"): 1, ("D", "p"): 1}


def test_negative_samples_cyclic_successor(ray_session):
    import ray.data

    from uckg_ray import namespaces as ns
    from uckg_ray.stages.graph import negative_samples

    e = pa.table({
        "subj": ["s1", "s2", "s3", "s4", "s5", "s6"],
        "pred": ["p", "p", "p", "q", ns.RDF_TYPE, "lit"],
        "obj":  ["o1", "o2", "o1", "z", "C", "text"],
        "obj_is_literal": [False, False, False, False, False, True],
    })
    got = {(r["subj"], r["pred"], r["obj"]): r["obj_neg"]
           for r in negative_samples(
               ray.data.from_arrow(e).repartition(3),
               num_partitions=4).take_all()}
    # two objects form a 2-cycle: each one's successor is the other
    assert got[("s1", "p", "o1")] == "o2"
    assert got[("s2", "p", "o2")] == "o1"
    assert got[("s3", "p", "o1")] == "o2"
    # single-object predicate q: no negative; type/literal edges excluded
    assert ("s4", "q", "z") not in got
    assert ("s5", ns.RDF_TYPE, "C") not in got
    assert ("s6", "lit", "text") not in got


def test_predicate_cooccurrence_pairs(ray_session):
    import ray.data

    from uckg_ray.stages.graph import predicate_cooccurrence

    e = pa.table({
        "subj": ["a", "a", "a", "b", "b", "c"],
        "pred": ["p", "q", "q", "p", "q", "p"],
        "obj":  ["1", "2", "3", "4", "5", "6"],
    })
    got = {(r["pred_a"], r["pred_b"]): r["n_subjects"]
           for r in predicate_cooccurrence(
               ray.data.from_arrow(e).repartition(3),
               num_partitions=4).take_all()}
    # a and b carry both p and q (a's duplicate q collapses); c only p
    assert got == {("p", "q"): 2}
