"""TBox (ontology schema) tables + subclass closure (SURVEY.md §2.5 T3).

The reference loads the UCO ontology snapshots into Neo4j/n10s, where
``rdfs:subClassOf`` axioms sit beside the instance data
(``data/UCKG_Snapshots/uco2.ttl``, ``uco_extended.ttl``). The graft
keeps the TBox as a small in-code edge table — the documented small
side of a broadcast join — and materializes:

- ``tbox_closure()``  — class → ALL strict superclasses (transitive),
  computed driver-side (the TBox is bounded by the ontology, hundreds
  of classes, never data-scale);
- ``infer_types(distinct_edges)`` (stages/materialize.py) — the
  data-scale step: every ``rdf:type`` assertion broadcast-joined
  against the closure inside ``map_batches``, yielding inferred
  supertype assertions (the n10s entailment analogue).

Axioms mirror the reference snapshots:
``uco2.ttl`` (ucoVulnerability/ucoCVE/ucoCWE/ucoExploitTarget ⊑
ucoUCOThing; the Consequence chain ucoExcessForks ⊑ ucoDenialOfService
⊑ ucoConsequence ⊑ ucoMeansOrConsequence ⊑ ucoUCOThing) and
``uco_extended.ttl:11-31`` (ucoexCPE/MITRED3FEND/MITREATTACK/CAPEC ⊑
ucoUCOThing). Graft-added ucoex classes follow the same convention.
"""

from __future__ import annotations

from uckg_ray import namespaces as ns

_U, _X = ns.UCO, ns.UCOEX

UCO_THING = _U + "UCOThing"

# (class, direct superclass) — rdfs:subClassOf edge table
TBOX_EDGES: list[tuple[str, str]] = [
    # uco2.ttl core classes the engine instantiates
    (_U + "Vulnerability", UCO_THING),
    (_U + "CVE", UCO_THING),
    (_U + "CWE", UCO_THING),
    (_U + "ExploitTarget", UCO_THING),
    # uco2.ttl multi-level consequence chain (closure depth > 1)
    (_U + "ExcessForks", _U + "DenialOfService"),
    (_U + "DenialOfService", _U + "Consequence"),
    (_U + "Consequence", _U + "MeansOrConsequence"),
    (_U + "MeansOrConsequence", UCO_THING),
    # uco_extended.ttl:11-31
    (_X + "CPE", UCO_THING),
    (_X + "MITRED3FEND", UCO_THING),
    (_X + "MITREATTACK", UCO_THING),
    (_X + "CAPEC", UCO_THING),
    # graft-added ucoex classes, same convention as uco_extended.ttl
    (_X + "ObservedExample", UCO_THING),
    (_X + "Tool", UCO_THING),
    (_X + "MITIGATIONS", UCO_THING),
    (_X + "CAMPAIGNS", UCO_THING),
    (_X + "GROUPS", UCO_THING),
    (_X + "SOFTWARE", UCO_THING),
    (_X + "TACTICS", UCO_THING),
]


def tbox_closure(edges: list[tuple[str, str]] | None = None
                 ) -> dict[str, list[str]]:
    """class → sorted list of ALL strict superclasses (transitive
    rdfs:subClassOf closure). Iterative fixpoint over the (bounded)
    ontology edge table; cycles are tolerated (a class never lists
    itself)."""
    edges = TBOX_EDGES if edges is None else edges
    supers: dict[str, set[str]] = {}
    for c, s in edges:
        supers.setdefault(c, set()).add(s)
    changed = True
    while changed:
        changed = False
        for c, ss in supers.items():
            add = set()
            for s in ss:
                add |= supers.get(s, set())
            add -= ss
            add.discard(c)
            if add:
                ss |= add
                changed = True
    return {c: sorted(ss) for c, ss in supers.items()}


def closure_pairs(edges: list[tuple[str, str]] | None = None
                  ) -> list[tuple[str, str]]:
    """Flat (class, superclass) closure rows, sorted — the shape the
    DuckDB oracle's recursive CTE produces."""
    return sorted((c, s) for c, ss in tbox_closure(edges).items() for s in ss)
