"""IRI namespaces and template helpers.

Mirrors the reference's RML template grammar (SURVEY.md §2.4):

- ``uco:``   = http://purl.org/cyber/uco#       (mapping/cve/cve_rml.ttl:10-13)
- ``ucoex:`` = http://example.com/ucoex#        (mapping/cve/cve_rml.ttl:14)
- CAPEC subjects are *URLs*: https://capec.mitre.org/data/definitions/{ID}.html
  (mapping/capec/capec_rml.ttl:24-27 — a reference parity quirk kept on purpose)

All template functions are trivial string formatters so they can be
applied vectorized (numpy char ops / list comprehension over an Arrow
column) and mirrored exactly in the DuckDB oracle SQL via ``||``.
"""

from __future__ import annotations

UCO = "http://purl.org/cyber/uco#"
UCOEX = "http://example.com/ucoex#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"

XSD_STRING = "xsd:string"
XSD_DATETIME = "xsd:dateTime"
XSD_BOOLEAN = "xsd:boolean"
RDF_JSON = "rdf:JSON"
IRI = ""  # obj_datatype value for IRI objects

CAPEC_URL = "https://capec.mitre.org/data/definitions/{num}.html"


def vuln_iri(cve_id: str) -> str:
    """uco#VULN-{id} — mapping/cve/cve_rml.ttl:29."""
    return f"{UCO}VULN-{cve_id}"


def cve_iri(cve_id: str) -> str:
    """uco#{id} — mapping/cve/cve_rml.ttl:70."""
    return f"{UCO}{cve_id}"


def cwe_iri(cwe_id: str) -> str:
    """uco#{id} — mapping/cwe/cwe_rml.ttl:66."""
    return f"{UCO}{cwe_id}"


def exploit_target_iri(cwe_id: str) -> str:
    """uco#ExploitTarget-{id} — mapping/cve/cve_rml.ttl:207."""
    return f"{UCO}ExploitTarget-{cwe_id}"


def capec_iri(capec_id: str) -> str:
    """URL subject — mapping/capec/capec_rml.ttl:24-27. Takes 'CAPEC-123'."""
    num = capec_id.split("-", 1)[1]
    return CAPEC_URL.format(num=num)


def attack_iri(technique_id: str) -> str:
    """ucoex#{ID} — mapping/attack/attack_rml.ttl:25."""
    return f"{UCOEX}{technique_id}"


def d3fend_iri(d3_id: str) -> str:
    """ucoex#{@id} — mapping/d3fend/d3fend_rml.ttl:24."""
    return f"{UCOEX}{d3_id}"


def cpe_iri(cpe_name: str) -> str:
    """ucoex#{cpeName} — mapping/cve/cve_rml.ttl:152."""
    return f"{UCOEX}{cpe_name}"


def tool_iri(tool_name: str) -> str:
    """ucoex#tool-{name} — graft addition for transcript tool turns."""
    return f"{UCOEX}tool-{tool_name}"


def observed_example_iri(cwe_id: str, reference: str) -> str:
    """Compound key ucoex#{cwe_id}-{Reference} — mapping/cwe/cwe_rml.ttl:24-27."""
    return f"{UCOEX}{cwe_id}-{reference}"


# Entity-type → IRI constructor for the alias linker (FIXTURES.md §2.3).
def entity_iri(entity_id: str, entity_type: str) -> str:
    if entity_type == "cve":
        return cve_iri(entity_id)
    if entity_type == "cwe":
        return cwe_iri(entity_id)
    if entity_type == "capec":
        return capec_iri(entity_id)
    if entity_type == "attack":
        return attack_iri(entity_id)
    if entity_type == "d3fend":
        return d3fend_iri(entity_id)
    if entity_type == "cpe":
        return cpe_iri(entity_id)
    if entity_type == "tool":
        # entity ids look like "tool:nmap"
        return tool_iri(entity_id.split(":", 1)[1])
    raise ValueError(f"unknown entity_type {entity_type!r}")


ENTITY_CLASS_IRI = {
    "cve": UCO + "CVE",
    "cwe": UCO + "CWE",
    "capec": UCOEX + "CAPEC",
    "attack": UCOEX + "MITREATTACK",
    "d3fend": UCOEX + "MITRED3FEND",
    "cpe": UCOEX + "CPE",
    "tool": UCOEX + "Tool",
}

# ATT&CK node-kind → class IRI — the six node maps of
# mapping/attack/attack_rml.ttl:21-249 (R10).
ATTACK_KIND_CLASS = {
    "technique": UCOEX + "MITREATTACK",
    "mitigation": UCOEX + "MITIGATIONS",
    "campaign": UCOEX + "CAMPAIGNS",
    "group": UCOEX + "GROUPS",
    "software": UCOEX + "SOFTWARE",
    "tactic": UCOEX + "TACTICS",
}

# ATT&CK relationship predicate table — mapping/attack/attack_rml.ttl:253-403
# (source type, target type) → predicate IRI. Seven maps in the reference.
ATTACK_REL_PRED = {
    ("mitigation", "technique"): UCOEX + "MITIGATES",
    ("campaign", "group"): UCOEX + "ATTRIBUTEDTO",
    ("campaign", "software"): UCOEX + "CampaignUsesSoftware",
    ("campaign", "technique"): UCOEX + "CampaignUsesTechnique",
    ("group", "software"): UCOEX + "GroupUsesSoftware",
    ("group", "technique"): UCOEX + "GroupUsesTechnique",
    ("software", "technique"): UCOEX + "SoftwareUsesTechnique",
}
