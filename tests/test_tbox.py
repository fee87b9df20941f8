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


def test_full_snapshot_tbox_breadth():
    """The subclass table mirrors the full uco2.ttl snapshot (99 axioms
    over 102 classes) plus ucoex entries; every class in the closure
    resolves to UCOThing (the snapshot is single-rooted)."""
    from uckg_ray.tbox import TBOX_DOMAIN, TBOX_RANGE
    assert len(TBOX_EDGES) >= 110
    assert len(TBOX_DOMAIN) == 120 and len(TBOX_RANGE) == 49
    c = tbox_closure()
    for cls in c:
        assert UCO_THING in c[cls], cls
    # spot checks straight from the snapshot text
    assert ns.UCO + "LogicExploit" in c[ns.UCO + "AtError"]
    assert (ns.UCO + "InputValidationError") in c[ns.UCO + "BoundaryCondition"]


def test_infer_types_domain_range(ray_session):
    """rdfs2/rdfs3: hasCVE_ID domains Vulnerability / ranges CVE (both
    snapshot axioms), composed with the subclass closure; literal
    objects never get range-typed; multi-domain axioms all fire."""
    import ray.data

    from uckg_ray.stages.materialize import infer_types_domain_range
    edges = pa.table({
        "subj": ["v1", "v1", "e1"],
        "pred": [ns.UCO + "hasCVE_ID", ns.UCO + "name",
                 ns.UCO + "hasVulnerability"],
        "obj": ["c1", "lit", "v9"],
        "obj_is_literal": [False, True, False],
        "obj_datatype": ["", "xsd:string", ""]})
    got = {(r["node"], r["type_iri"])
           for r in infer_types_domain_range(
               ray.data.from_arrow(edges)).take_all()}
    U = ns.UCO
    assert got == {
        ("v1", U + "Vulnerability"), ("v1", UCO_THING),
        ("c1", U + "CVE"), ("c1", UCO_THING),
        # hasVulnerability has THREE domain axioms — each entails, and
        # Means ⊑ MeansOrConsequence closes upward
        ("e1", U + "ExploitTarget"), ("e1", U + "Means"),
        ("e1", U + "MeansOrConsequence"),
        ("e1", U + "Product"), ("e1", UCO_THING),
        ("v9", U + "Vulnerability"), ("v9", UCO_THING)}


def test_subprop_closure_and_entailment(ray_session):
    """rdfs7: edges under child properties entail super-property
    triples; non-child predicates entail nothing; output is the
    entailed delta only, distinct."""
    import ray.data

    from uckg_ray.stages.materialize import entail_subproperties
    from uckg_ray.tbox import subprop_closure
    U = ns.UCO
    c = subprop_closure()
    # snapshot axioms + graft CVSS umbrella
    assert c[U + "hasIPv4Address"] == [U + "hasIPAddress"]
    assert c[U + "baseSeverity"] == [U + "hasSeverityScore"]
    assert (U + "hasMeans") in c[U + "hasAttacker"]
    edges = pa.table({
        "subj": ["v1", "v1", "v1", "v2"],
        "pred": [U + "baseSeverity", U + "vectorString", U + "name",
                 U + "baseSeverity"],
        "obj": ["HIGH", "CVSS:3.1/AV:N", "x", "LOW"],
        "obj_is_literal": [True, True, True, True],
        "obj_datatype": ["xsd:string"] * 4})
    got = {(r["subj"], r["pred"], r["obj"])
           for r in entail_subproperties(
               ray.data.from_arrow(edges)).take_all()}
    assert got == {
        ("v1", U + "hasSeverityScore", "HIGH"),
        ("v1", U + "hasSeverityScore", "CVSS:3.1/AV:N"),
        ("v2", U + "hasSeverityScore", "LOW")}


def test_entail_owl_semantics(ray_session):
    """owl:inverseOf / owl:SymmetricProperty / owl:TransitiveProperty
    entailment: swaps both directions, closes chains, excludes literal
    objects, and subtracts triples the input already asserts."""
    import ray.data

    from uckg_ray.stages.materialize import entail_owl
    edges = pa.table({
        "subj": ["a", "x", "m", "c1", "c2", "c3"],
        "pred": ["p", "s", "s", "t", "t", "t"],
        "obj": ["b", "y", "x", "c2", "c3", "c4"],
        "obj_is_literal": [False] * 6,
        "obj_datatype": [""] * 6})
    # add a literal-object row under an axiom predicate: must entail
    # nothing, and an already-asserted symmetric pair (m,s,x)/(x,s,m)?
    edges = pa.concat_tables([edges, pa.table({
        "subj": ["a"], "pred": ["p"], "obj": ["lit"],
        "obj_is_literal": [True], "obj_datatype": ["xsd:string"]})])
    got = {(r["subj"], r["pred"], r["obj"])
           for r in entail_owl(ray.data.from_arrow(edges),
                               inverse=[("p", "q")], symmetric=["s"],
                               transitive=["t"]).take_all()}
    assert got == {
        ("b", "q", "a"),            # inverseOf
        ("y", "s", "x"),            # symmetric (x,s,y)
        # symmetric (m,s,x) entails (x,s,m) — not asserted, so kept
        ("x", "s", "m"),
        # transitive closure adds the 2- and 3-hop paths only
        ("c1", "t", "c3"), ("c1", "t", "c4"), ("c2", "t", "c4")}


def test_entail_owl_squaring_path_identity(ray_session):
    """Forcing the distributed repeated-squaring closure
    (driver_max_pairs=0) yields byte-identical triples to the
    driver-side semi-naive path on a long chain plus a cycle."""
    import ray.data

    from uckg_ray.stages.materialize import entail_owl
    n = 12
    subs = [f"n{i}" for i in range(n)] + ["z"]
    objs = [f"n{i + 1}" for i in range(n)] + ["n0"]  # cycle back
    edges = pa.table({
        "subj": subs, "pred": ["t"] * len(subs), "obj": objs,
        "obj_is_literal": [False] * len(subs),
        "obj_datatype": [""] * len(subs)})
    ds = ray.data.from_arrow(edges)
    kw = dict(inverse=[], symmetric=[], transitive=["t"])
    drv = {(r["subj"], r["pred"], r["obj"])
           for r in entail_owl(ds, **kw).take_all()}
    sqr = {(r["subj"], r["pred"], r["obj"])
           for r in entail_owl(ds, driver_max_pairs=0, **kw).take_all()}
    assert drv == sqr and len(drv) > n  # closure added real rows
    assert ("n0", "t", f"n{n}") in drv  # full-chain hop present


def test_entail_owl_squaring_duplicate_base_rows(ray_session):
    """Regression: duplicate (subj,pred,obj) rows in the base (same
    triple under two obj_datatype values) must not mask first-round
    growth in the repeated-squaring fixpoint — the closure previously
    compared against the NON-distinct base count and could stop early."""
    import ray.data

    from uckg_ray.stages.materialize import entail_owl
    # chain a→b→c under 't', with a→b duplicated (two datatype strings);
    # one new path (a,t,c) is added while one dup collapses: counts are
    # equal, growth is real
    edges = pa.table({
        "subj": ["a", "a", "b"], "pred": ["t"] * 3,
        "obj": ["b", "b", "c"],
        "obj_is_literal": [False] * 3,
        "obj_datatype": ["", "xsd:anyURI", ""]})
    got = {(r["subj"], r["pred"], r["obj"])
           for r in entail_owl(ray.data.from_arrow(edges),
                               inverse=[], symmetric=[], transitive=["t"],
                               driver_max_pairs=0).take_all()}
    assert got == {("a", "t", "c")}


def test_functional_violations(ray_session):
    """Only subjects with >1 DISTINCT value under a functional predicate
    are reported; duplicate datatype variants of one value don't count."""
    import ray.data

    from uckg_ray.stages.materialize import functional_violations
    edges = pa.table({
        "subj": ["v1", "v1", "v1", "v2", "v2", "v3"],
        "pred": ["fp", "fp", "other", "fp", "fp", "fp"],
        "obj": ["a", "b", "c", "x", "x", "y"],
        "obj_is_literal": [True] * 6,
        # v2 carries the SAME value under two datatypes → not a violation
        "obj_datatype": ["", "", "", "xsd:string", "xsd:anyURI", ""]})
    rows = functional_violations(ray.data.from_arrow(edges),
                                 functional=["fp"]).take_all()
    assert [(r["subj"], r["pred"], r["n_values"])
            for r in rows] == [("v1", "fp", 2)]


def test_entail_equivalent_classes(ray_session):
    """Named-equivalence groups entail mutual rdf:type membership,
    closed over multi-way groups, minus asserted assertions."""
    import ray.data

    from uckg_ray.namespaces import RDF_TYPE
    from uckg_ray.stages.materialize import entail_equivalent_classes
    edges = pa.table({
        "subj": ["x", "y", "y"],
        "pred": [RDF_TYPE] * 3,
        "obj": ["A", "B", "C"],
        "obj_is_literal": [False] * 3,
        "obj_datatype": [""] * 3})
    groups = {"A": ["B", "C"], "B": ["A", "C"], "C": ["A", "B"]}
    got = {(r["subj"], r["obj"])
           for r in entail_equivalent_classes(
               ray.data.from_arrow(edges), groups=groups).take_all()}
    # x:A entails x:B, x:C; y asserts B AND C so only y:A is new
    assert got == {("x", "B"), ("x", "C"), ("y", "A")}


def test_entail_min1_restrictions(ray_session):
    """QUALIFIED min-cardinality-1 classification: the object must be
    typed into the owl:onClass qualifier; already-typed subjects are
    subtracted; unqualified objects and other predicates classify
    nothing; duplicate properties across axioms both fire."""
    import ray.data

    from uckg_ray.namespaces import RDF_TYPE
    from uckg_ray.stages.materialize import entail_min1_restrictions
    edges = pa.table({
        "subj": ["a",    "a",    "b",    "b",      "c",     "o1",
                 "o3",   "o9"],
        "pred": ["hasX", "hasX", "hasX", RDF_TYPE, "other", RDF_TYPE,
                 RDF_TYPE, RDF_TYPE],
        "obj":  ["o1",   "o2",   "o3",   "Cls",    "o9",    "Q",
                 "Q",    "Q2"],
        "obj_is_literal": [False] * 8,
        "obj_datatype": [""] * 8})
    got = {(r["subj"], r["pred"], r["obj"])
           for r in entail_min1_restrictions(
               ray.data.from_arrow(edges),
               restrictions=[("hasX", "Q", "Cls"),
                             ("hasX", "Q2", "Cls2")]).take_all()}
    # a: o1 typed Q → Cls (o2 untyped contributes nothing);
    # b: o3 typed Q → Cls but b already asserts Cls → subtracted;
    # c: wrong predicate; the Q2 axiom never fires (no hasX→Q2 object)
    assert got == {("a", RDF_TYPE, "Cls")}
    # duplicate-property axiom fires when its qualifier matches
    edges2 = pa.table({
        "subj": ["x", "y"], "pred": ["hasX", RDF_TYPE],
        "obj": ["y", "Q2"],
        "obj_is_literal": [False] * 2, "obj_datatype": [""] * 2})
    got2 = {(r["subj"], r["obj"])
            for r in entail_min1_restrictions(
                ray.data.from_arrow(edges2),
                restrictions=[("hasX", "Q", "Cls"),
                              ("hasX", "Q2", "Cls2")]).take_all()}
    assert got2 == {("x", "Cls2")}
