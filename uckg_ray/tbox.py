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

# (class, direct superclass) — rdfs:subClassOf edge table.
# Full mirror of the reference snapshot data/UCKG_Snapshots/uco2.ttl
# (99 subclass axioms over 102 owl:Class declarations, mechanically
# extracted; classes with no superclass axiom — e.g. UCOThing — appear
# only as targets) plus uco_extended.ttl:11-31 and the graft-added
# ucoex classes. User-added templates over ANY snapshot class now
# inherit entailment without code edits (SURVEY §2.5 T3 breadth).
TBOX_EDGES: list[tuple[str, str]] = [
    (_U + "Address", _U + "UCOThing"),
    (_U + "AtError", _U + "LogicExploit"),
    (_U + "Attack", _U + "UCOThing"),
    (_U + "AttackPattern", _U + "UCOThing"),
    (_U + "Attacker", _U + "UCOThing"),
    (_U + "Backdoor", _U + "MaliciousCodeExecution"),
    (_U + "BaseGroup", _U + "UCOThing"),
    (_U + "BotnetAttack", _U + "Consequence"),
    (_U + "BoundaryCondition", _U + "InputValidationError"),
    (_U + "BufferOverFlow", _U + "Means"),
    (_U + "CCE", _U + "UCOThing"),
    (_U + "CVE", _U + "UCOThing"),
    (_U + "CVSSScoreType", _U + "UCOThing"),
    (_U + "CWE", _U + "UCOThing"),
    (_U + "Campaign", _U + "UCOThing"),
    (_U + "ConfidenceType", _U + "UCOThing"),
    (_U + "ConfigurationError", _U + "Means"),
    (_U + "Consequence", _U + "MeansOrConsequence"),
    (_U + "CourseofAction", _U + "UCOThing"),
    (_U + "DataCorruption", _U + "LossOfIntegrity"),
    (_U + "DenialOfService", _U + "Consequence"),
    (_U + "DirectoryExposure", _U + "LossOfConf"),
    (_U + "DistributedCode", _U + "MaliciousCodeExecution"),
    (_U + "DomainExpert", _U + "Source"),
    (_U + "EnvironmentalGroup", _U + "UCOThing"),
    (_U + "ExICMPEchoReq", _U + "Means"),
    (_U + "ExIPPacketSize", _U + "Means"),
    (_U + "ExceptionCondition", _U + "LogicExploit"),
    (_U + "ExcessForks", _U + "DenialOfService"),
    (_U + "Exploit", _U + "UCOThing"),
    (_U + "ExploitTarget", _U + "UCOThing"),
    (_U + "File", _U + "UCOThing"),
    (_U + "Hardware", _U + "UCOThing"),
    (_U + "IDPS", _U + "Source"),
    (_U + "IPAddress", _U + "Address"),
    (_U + "IPFrag", _U + "Means"),
    (_U + "IPv4Address", _U + "IPAddress"),
    (_U + "IPv6Address", _U + "IPAddress"),
    (_U + "Incident", _U + "UCOThing"),
    (_U + "Indicator", _U + "UCOThing"),
    (_U + "InputValidationError", _U + "Means"),
    (_U + "KernelModule", _U + "Software"),
    (_U + "KillChain", _U + "UCOThing"),
    (_U + "KillChainPhase", _U + "UCOThing"),
    (_U + "Logic", _U + "TriggeredCode"),
    (_U + "LogicExploit", _U + "Logic"),
    (_U + "LossOfConf", _U + "Consequence"),
    (_U + "LossOfIntegrity", _U + "Consequence"),
    (_U + "MACAddress", _U + "Address"),
    (_U + "MalformedInput", _U + "InputValidationError"),
    (_U + "MaliciousCodeExecution", _U + "Means"),
    (_U + "Malware", _U + "UCOThing"),
    (_U + "Means", _U + "MeansOrConsequence"),
    (_U + "MeansOrConsequence", _U + "UCOThing"),
    (_U + "MemoryConsumption", _U + "DenialOfService"),
    (_U + "MitnickAttack", _U + "Consequence"),
    (_U + "NetFlood", _U + "DenialOfService"),
    (_U + "NetworkState", _U + "UCOThing"),
    (_U + "OSVDB", _U + "UCOThing"),
    (_U + "Observable", _U + "UCOThing"),
    (_U + "OperatingSystem", _U + "Software"),
    (_U + "OtherTechnicalTerms", _U + "UCOThing"),
    (_U + "ParisiticCode", _U + "MaliciousCodeExecution"),
    (_U + "PingOfDeath", _U + "DenialOfService"),
    (_U + "PingScan", _U + "Probe"),
    (_U + "PrivilegeEsc", _U + "LossOfConf"),
    (_U + "Probe", _U + "Means"),
    (_U + "Process", _U + "UCOThing"),
    (_U + "Product", _U + "UCOThing"),
    (_U + "RSTProbe", _U + "Probe"),
    (_U + "RaceCondition", _U + "LogicExploit"),
    (_U + "RemoteAccess", _U + "Consequence"),
    (_U + "Rootkit", _U + "MaliciousCodeExecution"),
    (_U + "SelfPropagatingCode", _U + "MaliciousCodeExecution"),
    (_U + "SerialError", _U + "LogicExploit"),
    (_U + "Software", _U + "UCOThing"),
    (_U + "Source", _U + "UCOThing"),
    (_U + "StatementType", _U + "UCOThing"),
    (_U + "SynFlood", _U + "Means"),
    (_U + "SynScan", _U + "Probe"),
    (_U + "SysCrash", _U + "DenialOfService"),
    (_U + "System", _U + "UCOThing"),
    (_U + "TCPConnect", _U + "Probe"),
    (_U + "TCPPortScan", _U + "Probe"),
    (_U + "TTP", _U + "UCOThing"),
    (_U + "TemporalGroup", _U + "UCOThing"),
    (_U + "ThreatActor", _U + "UCOThing"),
    (_U + "Time", _U + "TriggeredCode"),
    (_U + "TriggeredCode", _U + "MaliciousCodeExecution"),
    (_U + "Trojans", _U + "MaliciousCodeExecution"),
    (_U + "UnauthRoot", _U + "PrivilegeEsc"),
    (_U + "UnauthUser", _U + "PrivilegeEsc"),
    (_U + "UserEnumeration", _U + "Means"),
    (_U + "Virus", _U + "SelfPropagatingCode"),
    (_U + "Vulnerability", _U + "UCOThing"),
    (_U + "Web", _U + "Source"),
    (_U + "WebBrowser", _U + "Software"),
    (_U + "Worm", _U + "SelfPropagatingCode"),
    (_U + "rstProbe", _U + "Probe"),
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

# rdfs:domain / rdfs:range axiom tables — full mirror of the snapshot's
# property axioms (94 properties; multi-domain axioms each entail
# independently per RDFS rule rdfs2/rdfs3). Property IRIs follow the
# engine's uco# convention (snapshot `ucohasCVE_ID` = uco#hasCVE_ID).
TBOX_DOMAIN: list[tuple[str, str]] = [
    (_U + "affectsProduct", _U + "Vulnerability"),
    (_U + "anomolousDataOutFlow", _U + "NetworkState"),
    (_U + "associatedCampaigns", _U + "Campaign"),
    (_U + "behaviour", _U + "TTP"),
    (_U + "chgGid", _U + "Process"),
    (_U + "chgPPid", _U + "Process"),
    (_U + "chgSUid", _U + "Process"),
    (_U + "chgUid", _U + "Process"),
    (_U + "commonConsequences", _U + "CWE"),
    (_U + "connectedTo", _U + "System"),
    (_U + "cweExtendedSummary", _U + "CWE"),
    (_U + "cweID", _U + "CWE"),
    (_U + "cweName", _U + "CWE"),
    (_U + "cweSummary", _U + "CWE"),
    (_U + "dataSize", _U + "Process"),
    (_U + "description", _U + "CWE"),
    (_U + "discoveryTime", _U + "Vulnerability"),
    (_U + "exploitsVulnerability", _U + "Means"),
    (_U + "hasAccessComplexity", _U + "Vulnerability"),
    (_U + "hasAccessVector", _U + "Vulnerability"),
    (_U + "hasAssociatedCampaign", _U + "Attacker"),
    (_U + "hasAssociatedCampaign", _U + "Campaign"),
    (_U + "hasAttacker", _U + "Attack"),
    (_U + "hasAuthentication", _U + "Vulnerability"),
    (_U + "hasAvailabilityImpact", _U + "Vulnerability"),
    (_U + "hasCOAType", _U + "CourseofAction"),
    (_U + "hasCVE_ID", _U + "Vulnerability"),
    (_U + "hasCVSSScore", _U + "Vulnerability"),
    (_U + "hasCampaign", _U + "Indicator"),
    (_U + "hasCodeSize", _U + "Process"),
    (_U + "hasConfidenceValue", _U + "Attack"),
    (_U + "hasConfidenceValue", _U + "Attacker"),
    (_U + "hasConfidenceValue", _U + "Campaign"),
    (_U + "hasConfidenceValue", _U + "Indicator"),
    (_U + "hasConfidenceValue", _U + "StatementType"),
    (_U + "hasConfidentialityImpact", _U + "Vulnerability"),
    (_U + "hasConfiguration", _U + "ExploitTarget"),
    (_U + "hasConsequence", _U + "Vulnerability"),
    (_U + "hasCost", _U + "CourseofAction"),
    (_U + "hasDataSize", _U + "Process"),
    (_U + "hasEfficacy", _U + "CourseofAction"),
    (_U + "hasIPAddress", _U + "System"),
    (_U + "hasImpact", _U + "CourseofAction"),
    (_U + "hasImpact", _U + "Indicator"),
    (_U + "hasIncident", _U + "Campaign"),
    (_U + "hasIndicator", _U + "Attack"),
    (_U + "hasIndicator", _U + "Campaign"),
    (_U + "hasIntegrityImpact", _U + "Vulnerability"),
    (_U + "hasIntendedEffect", _U + "Attacker"),
    (_U + "hasIntendedEffect", _U + "Campaign"),
    (_U + "hasIntendedEffect", _U + "Means"),
    (_U + "hasKernel", _U + "OperatingSystem"),
    (_U + "hasKillChain", _U + "Means"),
    (_U + "hasKillChainPhase", _U + "Indicator"),
    (_U + "hasKillChainPhase", _U + "Means"),
    (_U + "hasLibSize", _U + "Process"),
    (_U + "hasMACAddress", _U + "System"),
    (_U + "hasMeans", _U + "Attack"),
    (_U + "hasMeans", _U + "Campaign"),
    (_U + "hasMeans", _U + "Indicator"),
    (_U + "hasMeans", _U + "Vulnerability"),
    (_U + "hasMitigation", _U + "Vulnerability"),
    (_U + "hasMotivation", _U + "Attacker"),
    (_U + "hasOSVDB", _U + "Vulnerability"),
    (_U + "hasObservable", _U + "Attack"),
    (_U + "hasObservable", _U + "Indicator"),
    (_U + "hasObservable", _U + "Vulnerability"),
    (_U + "hasObservedMeans", _U + "Attacker"),
    (_U + "hasParameterObservables", _U + "CourseofAction"),
    (_U + "hasProduct", _U + "System"),
    (_U + "hasRelatedCOA", _U + "CourseofAction"),
    (_U + "hasRelatedIncident", _U + "Attacker"),
    (_U + "hasRelatedIndicator", _U + "Indicator"),
    (_U + "hasRelatedMeans", _U + "Means"),
    (_U + "hasRequestedCOA", _U + "Attack"),
    (_U + "hasSoftware", _U + "Observable"),
    (_U + "hasSophistication", _U + "Attacker"),
    (_U + "hasSource", _U + "Attack"),
    (_U + "hasSource", _U + "Vulnerability"),
    (_U + "hasStage", _U + "CourseofAction"),
    (_U + "hasStatus", _U + "Campaign"),
    (_U + "hasSuggestedCOA", _U + "Indicator"),
    (_U + "hasTakenCOA", _U + "Attack"),
    (_U + "hasTerms", _U + "Web"),
    (_U + "hasTime", _U + "Attack"),
    (_U + "hasTitle", _U + "Attacker"),
    (_U + "hasTitle", _U + "Campaign"),
    (_U + "hasTitle", _U + "Consequence"),
    (_U + "hasTitle", _U + "CourseofAction"),
    (_U + "hasTitle", _U + "Indicator"),
    (_U + "hasTitle", _U + "Means"),
    (_U + "hasTitle", _U + "Vulnerability"),
    (_U + "hasType", _U + "Attacker"),
    (_U + "hasVendor", _U + "Product"),
    (_U + "hasVulnerability", _U + "ExploitTarget"),
    (_U + "hasVulnerability", _U + "Means"),
    (_U + "hasVulnerability", _U + "Product"),
    (_U + "hasVulnerabilityTerm", _U + "Web"),
    (_U + "hasWeakness", _U + "ExploitTarget"),
    (_U + "isLaunchedBy", _U + "Attack"),
    (_U + "isLaunchedBy", _U + "Campaign"),
    (_U + "isNew", _U + "Hardware"),
    (_U + "isNew", _U + "KernelModule"),
    (_U + "isResultOf", _U + "Consequence"),
    (_U + "isUnderAttack", _U + "System"),
    (_U + "lastModifiedDateTime", _U + "Vulnerability"),
    (_U + "newDestIP", _U + "NetworkState"),
    (_U + "newPortsOpened", _U + "NetworkState"),
    (_U + "numChildProcesses", _U + "Process"),
    (_U + "numOpenFiles", _U + "Process"),
    (_U + "numProcessesRunning", _U + "System"),
    (_U + "opensPort", _U + "Process"),
    (_U + "publishedDateTime", _U + "Vulnerability"),
    (_U + "resultsIn", _U + "Means"),
    (_U + "score", _U + "Vulnerability"),
    (_U + "selfDist", _U + "Process"),
    (_U + "showsInfectionSigns", _U + "Process"),
    (_U + "summary", _U + "Vulnerability"),
    (_U + "timeOfIntroduction", _U + "CWE"),
    (_U + "usesAttacks", _U + "Campaign"),
]

TBOX_RANGE: list[tuple[str, str]] = [
    (_U + "affectsProduct", _U + "Product"),
    (_U + "associatedCampaigns", _U + "Campaign"),
    (_U + "connectedTo", _U + "System"),
    (_U + "exploitsVulnerability", _U + "Vulnerability"),
    (_U + "hasAssociatedCampaign", _U + "Campaign"),
    (_U + "hasAttacker", _U + "Attacker"),
    (_U + "hasCVE_ID", _U + "CVE"),
    (_U + "hasCVSSScore", _U + "CVSSScoreType"),
    (_U + "hasCampaign", _U + "Campaign"),
    (_U + "hasConfidenceValue", _U + "ConfidenceType"),
    (_U + "hasConfiguration", _U + "CCE"),
    (_U + "hasConsequence", _U + "Consequence"),
    (_U + "hasCost", _U + "StatementType"),
    (_U + "hasEfficacy", _U + "StatementType"),
    (_U + "hasIPAddress", _U + "IPAddress"),
    (_U + "hasImpact", _U + "StatementType"),
    (_U + "hasIncident", _U + "Incident"),
    (_U + "hasIndicator", _U + "Indicator"),
    (_U + "hasIntendedEffect", _U + "StatementType"),
    (_U + "hasKernel", _U + "KernelModule"),
    (_U + "hasKillChainPhase", _U + "KillChainPhase"),
    (_U + "hasMeans", _U + "Means"),
    (_U + "hasMitigation", _U + "CourseofAction"),
    (_U + "hasMotivation", _U + "StatementType"),
    (_U + "hasOSVDB", _U + "OSVDB"),
    (_U + "hasObservable", _U + "Observable"),
    (_U + "hasObservedMeans", _U + "Means"),
    (_U + "hasParameterObservables", _U + "Consequence"),
    (_U + "hasProduct", _U + "Product"),
    (_U + "hasRelatedCOA", _U + "CourseofAction"),
    (_U + "hasRelatedIncident", _U + "Incident"),
    (_U + "hasRelatedIndicator", _U + "Indicator"),
    (_U + "hasRelatedMeans", _U + "Means"),
    (_U + "hasRequestedCOA", _U + "CourseofAction"),
    (_U + "hasSoftware", _U + "Software"),
    (_U + "hasSophistication", _U + "StatementType"),
    (_U + "hasSource", _U + "Source"),
    (_U + "hasSuggestedCOA", _U + "CourseofAction"),
    (_U + "hasTakenCOA", _U + "CourseofAction"),
    (_U + "hasTerms", _U + "OtherTechnicalTerms"),
    (_U + "hasType", _U + "StatementType"),
    (_U + "hasVulnerability", _U + "Vulnerability"),
    (_U + "hasWeakness", _U + "CWE"),
    (_U + "isLaunchedBy", _U + "Attacker"),
    (_U + "isResultOf", _U + "Means"),
    (_U + "isUnderAttack", _U + "Attack"),
    (_U + "isUnderAttack", _U + "Consequence"),
    (_U + "resultsIn", _U + "Consequence"),
    (_U + "usesAttacks", _U + "Attack"),
]


# rdfs:subPropertyOf axiom table (property hierarchy, RDFS rule rdfs7:
# (s p o) ∧ p ⊑ q ⟹ (s q o)). The 12 non-trivial snapshot axioms
# (uco2.ttl; `owl:topObjectProperty` parents are omitted as vacuous),
# plus graft-added axioms that put the engine's modern CVSS literal
# properties under the snapshot's own severity umbrella — the exact
# pattern uco2.ttl:411-428 uses for the CVSS-v1 generation
# (ucohasAccessComplexity/ucohasAccessVector/… ⊑ ucohasSeverityScore).
TBOX_SUBPROP: list[tuple[str, str]] = [
    # uco2.ttl snapshot axioms
    (_U + "generated-on-datetime", _U + "hasSeverityScore"),
    (_U + "hasAccessComplexity", _U + "hasSeverityScore"),
    (_U + "hasAccessVector", _U + "hasSeverityScore"),
    (_U + "hasAttacker", _U + "hasMeans"),
    (_U + "hasAuthentication", _U + "hasSeverityScore"),
    (_U + "hasAvailabilityImpact", _U + "hasSeverityScore"),
    (_U + "hasConfidentialityImpact", _U + "hasSeverityScore"),
    (_U + "hasIPv4Address", _U + "hasIPAddress"),
    (_U + "hasIPv6Address", _U + "hasIPAddress"),
    (_U + "hasIntegrityImpact", _U + "hasSeverityScore"),
    (_U + "hasSource", _U + "hasSeverityScore"),
    (_U + "score", _U + "hasSeverityScore"),
    # graft-added: the modern CVSS properties the engine emits inherit
    # the same severity umbrella as the snapshot's v1 properties
    (_U + "baseSeverity", _U + "hasSeverityScore"),
    (_U + "vectorString", _U + "hasSeverityScore"),
    (_U + "exploitabilityScore", _U + "hasSeverityScore"),
    (_U + "impactScore", _U + "hasSeverityScore"),
]


# OWL-lite property axioms beyond RDFS — the fragment of the
# reference's optional HermiT ``sync_reasoner()`` pass
# (reference/process/ontology_updater.py:69-74) that the snapshot
# actually exercises, plus graft-added axioms over engine-emitted
# predicates (the same convention as TBOX_SUBPROP's CVSS additions).
#
# owl:inverseOf — (s p o) ⟹ (o q s) and (s q o) ⟹ (o p s):
TBOX_INVERSE: list[tuple[str, str]] = [
    # uco2.ttl:324-325 (ucoisResultOf owl:inverseOf ucoresultsIn)
    (_U + "isResultOf", _U + "resultsIn"),
    # graft-added: the engine's CWE observed-example cross link is
    # asserted in one direction per pair; the inverse completes it
    (_X + "hasObservedExample", _X + "exampleObservedIn"),
]

# owl:SymmetricProperty — (s p o) ⟹ (o p s):
TBOX_SYMMETRIC: list[str] = [
    _U + "connectedTo",                 # uco2.ttl:38-40
    # graft-added: CAPEC related_attack_patterns references are mutual
    _X + "hasRelatedAttackPattern",
]

# owl:TransitiveProperty — (a p b) ∧ (b p c) ⟹ (a p c). The snapshot
# declares none; the graft adds the CWE related-weakness chain (the
# ChildOf-style hierarchy the CWE self equi-join J3 traverses), whose
# subgraph is bounded by the CWE dictionary — ontology-scale, not
# data-scale.
TBOX_TRANSITIVE: list[str] = [
    _U + "relatedWeakness",
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


def subprop_closure() -> dict[str, list[str]]:
    """property → ALL strict super-properties (transitive
    rdfs:subPropertyOf closure) — same fixpoint as ``tbox_closure``
    over the property axiom table."""
    return tbox_closure(TBOX_SUBPROP)


# owl:FunctionalProperty — a subject may carry at most ONE value; more
# is an inconsistency a DL reasoner would surface via sameAs collision.
# uco2.ttl asserts two (ucohasMACAddress uco2.ttl:175,466, ucohasTerms
# :294 — neither predicate is emitted by this engine's templates,
# so they audit clean by construction); the graft adds the two emitted
# predicates whose duplication IS the interesting data-quality signal:
# a CVE mentioned at different timestamps / with different summaries.
TBOX_FUNCTIONAL: list[str] = [
    _U.replace("#", "") + "hasMACAddress",   # http://purl.org/cyber/uco…
    _U.replace("#", "") + "hasTerms",
    _U + "publishedDateTime",
    _U + "summary",
]


# owl:equivalentClass — the snapshot's NAMED-class equivalences
# (uco2.ttl:576-608; prefixes cap:=capec.mitre.org/capec_v1#,
# cbx:=cybox.mitre.org/cybox_v1#). The restriction-class equivalences
# on ucoAttack (owl:Restriction bnodes) are OWL-DL and stay out of
# scope; the named pairs entail mutual rdf:type membership, with
# equivalence GROUPS formed by closure (cap:Observable ≡ cbx:Observable
# ≡ ucoObservable is one three-way group).
_CAP = "http://capec.mitre.org/capec_v1#"
_CBX = "http://cybox.mitre.org/cybox_v1#"
TBOX_EQUIVALENT: list[tuple[str, str]] = [
    (_CAP + "Indicator", _U + "Indicator"),     # uco2.ttl:577
    (_CAP + "Observable", _CBX + "Observable"),  # uco2.ttl:583
    (_CAP + "Weakness", _U + "CWE"),             # uco2.ttl:588
    (_CBX + "Observable", _U + "Observable"),    # uco2.ttl:593
    (_U + "Attack", _U + "Incident"),            # uco2.ttl:606
]


def equivalence_groups(pairs: list[tuple[str, str]] | None = None
                       ) -> dict[str, list[str]]:
    """class → sorted OTHER members of its equivalence group (the
    union-find closure of the named owl:equivalentClass pairs)."""
    pairs = TBOX_EQUIVALENT if pairs is None else pairs
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[str, set[str]] = {}
    for x in list(parent):
        groups.setdefault(find(x), set()).add(x)
    return {c: sorted(g - {c})
            for g in groups.values() if len(g) > 1 for c in g}


# owl:Restriction / owl:minQualifiedCardinality 1 — the ONE OWL-DL
# class-expression construct the snapshot actually uses (uco2.ttl:
# 605-616: ucoAttack ≡ [≥1 ucohasConsequence . ucoConsequence] ≡
# [≥1 ucohasMeans . ucoMeans]): an individual with at least one edge
# under the property WHOSE OBJECT IS TYPED into the owl:onClass
# qualifier is classified into the class. Triples are
# (property, on_class, class); property IRIs follow the engine's
# uco# convention like every other axiom table (snapshot
# `ucohasConsequence` = uco#hasConsequence — TBOX_DOMAIN precedent).
# The snapshot pair classifies nothing on the fixture (the engine's
# templates never emit those predicates — a user template that does
# inherits the rule); the graft adds the analogous axiom over an
# emitted predicate, same convention as TBOX_SUBPROP's CVSS addition:
# a vulnerability with ≥1 typed CPE configuration is a configured
# product.
TBOX_MIN1_RESTRICTIONS: list[tuple[str, str, str]] = [
    (_U + "hasConsequence", _U + "Consequence", _U + "Attack"),
    (_U + "hasMeans", _U + "Means", _U + "Attack"),
    (_X + "hasCPE", _X + "CPE", _X + "ConfiguredProduct"),
]
