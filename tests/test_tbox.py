"""TBox subclass closure + type inference (SURVEY.md §2.5 T3)."""

import pyarrow as pa

from uckg_ray import namespaces as ns
from uckg_ray.tbox import TBOX_EDGES, UCO_THING, closure_pairs, tbox_closure


def test_closure_transitive_multilevel():
    c = tbox_closure([("a", "b"), ("b", "c"), ("c", "d")])
    assert c["a"] == ["b", "c", "d"]
    assert c["b"] == ["c", "d"]
    assert c["c"] == ["d"]


def test_closure_cycle_tolerated():
    c = tbox_closure([("a", "b"), ("b", "a")])
    assert c["a"] == ["b"] and c["b"] == ["a"]  # never lists itself


def test_reference_tbox_depth():
    c = tbox_closure()
    # uco2.ttl consequence chain reaches UCOThing through 3 hops
    assert c[ns.UCO + "ExcessForks"] == sorted([
        ns.UCO + "DenialOfService", ns.UCO + "Consequence",
        ns.UCO + "MeansOrConsequence", UCO_THING])
    # every engine-emitted class resolves to UCOThing
    for cls in ns.ENTITY_CLASS_IRI.values():
        assert UCO_THING in c[cls]
    assert all(s for _, s in closure_pairs())


def test_infer_types_dataset(ray_session):
    import ray.data

    from uckg_ray.stages.materialize import infer_types
    edges = pa.table({
        "subj": ["n1", "n1", "n2"],
        "pred": [ns.RDF_TYPE, ns.UCO + "name", ns.RDF_TYPE],
        "obj": [ns.UCO + "CVE", "x", ns.UCO + "ExcessForks"],
        "obj_is_literal": [False, True, False],
        "obj_datatype": ["", "xsd:string", ""]})
    got = {(r["node"], r["type_iri"])
           for r in infer_types(ray.data.from_arrow(edges)).take_all()}
    assert got == {
        ("n1", ns.UCO + "CVE"), ("n1", UCO_THING),
        ("n2", ns.UCO + "ExcessForks"), ("n2", ns.UCO + "DenialOfService"),
        ("n2", ns.UCO + "Consequence"), ("n2", ns.UCO + "MeansOrConsequence"),
        ("n2", UCO_THING)}
