"""Single-process pure-Python oracle for the KG pipeline.

Independent re-implementation of the template semantics (separate
per-type regex scans, plain dict/set lookups, no Arrow, no Ray) used by
the pytest suite to compute (subj, pred, obj) precision/recall of the
distributed pipeline (BASELINE.md target: P/R ≥ 0.95; we assert 1.0).
Shares only the namespace constants with the engine — those are the
spec, not the implementation.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pyarrow.parquet as pq

from uckg_ray import namespaces as ns
from uckg_ray import patterns as px

_RX = {name: re.compile(rx) for name, rx in px.MENTION_TYPES}
_FRAC = re.compile(r"\.\d{4,}$")


def _fmt_ts(ts) -> str:
    # ts is a python datetime from pyarrow; truncate micros to millis
    s = ts.strftime("%Y-%m-%dT%H:%M:%S.%f")
    return s[:23]


def _fix_frac(s: str) -> str:
    return _FRAC.sub("", s)


def _titles(titles) -> str:
    # lang-keyed compact JSON, entries sorted by (lang, title); raw UTF-8
    return json.dumps(dict(sorted((t["lang"], t["title"]) for t in (titles or []))),
                      separators=(",", ":"), ensure_ascii=False)


def _cjson(obj):
    return None if obj is None else json.dumps(obj, separators=(",", ":"),
                                               ensure_ascii=False)


def _dedup_keep_order(xs):
    seen, out = set(), []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


def oracle_triples(transcripts_dir: str, fixture_dir: str,
                   canonicalize: bool = False) -> set[tuple[str, str, str]]:
    """Distinct (subj, pred, obj) set the pipeline must emit."""
    cwe = pq.read_table(os.path.join(fixture_dir, "cwe_dict.parquet")).to_pylist()
    cwe_names = {r["id_value"]: r["name"] for r in cwe}
    cpe = pq.read_table(os.path.join(fixture_dir, "cpe_dict.parquet")).to_pylist()
    cpe_lut = {r["cpeName"]: r for r in cpe}
    alias = pq.read_table(os.path.join(fixture_dir, "alias_dict.parquet")).to_pylist()

    # best alias candidate: max prior, tie → min entity_id
    best: dict[str, tuple[float, str, str]] = {}
    for r in alias:
        cur = best.get(r["block_key"])
        cand = (-r["prior"], r["entity_id"], r["entity_type"])
        if cur is None or cand < cur:
            best[r["block_key"]] = cand

    T: set[tuple[str, str, str]] = set()
    UCO, UCOEX, RT, RL = ns.UCO, ns.UCOEX, ns.RDF_TYPE, ns.RDFS_LABEL

    files = sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))
    for f in files:
        for row in pq.read_table(f).to_pylist():
            txt = row["text"]
            tsf = _fmt_ts(row["ts"])
            cves = _dedup_keep_order(_RX["cve"].findall(txt))
            cwes = [w for w in _dedup_keep_order(_RX["cwe"].findall(txt))
                    if w in cwe_names]
            capecs = _dedup_keep_order(_RX["capec"].findall(txt))
            attacks = _dedup_keep_order(_RX["attack"].findall(txt))
            d3s = _dedup_keep_order(_RX["d3fend"].findall(txt))
            cpes = _dedup_keep_order(_RX["cpe"].findall(txt))
            for v in cves:
                T.add((UCO + "VULN-" + v, RT, UCO + "Vulnerability"))
                T.add((UCO + "VULN-" + v, UCO + "hasCVE_ID", UCO + v))
                T.add((UCO + "VULN-" + v, UCO + "publishedDateTime", tsf))
                T.add((UCO + v, RT, UCO + "CVE"))
                T.add((UCO + v, RL, v))
            for w in cwes:
                T.add((UCO + "ExploitTarget-" + w, RT, UCO + "ExploitTarget"))
                T.add((UCO + "ExploitTarget-" + w, UCO + "hasWeakness", UCO + w))
                T.add((UCO + w, RT, UCO + "CWE"))
                T.add((UCO + w, UCO + "name", cwe_names[w]))
                for v in cves:
                    T.add((UCO + "ExploitTarget-" + w, UCO + "hasVulnerability",
                           UCO + "VULN-" + v))
            for p in capecs:
                pi = "https://capec.mitre.org/data/definitions/" + p.split("-")[1] + ".html"
                T.add((pi, RT, UCOEX + "CAPEC"))
                T.add((pi, RL, p))
                for w in cwes:
                    T.add((pi, UCOEX + "hasRelatedWeakness", UCO + w))
            for a in attacks:
                T.add((UCOEX + a, RT, UCOEX + "MITREATTACK"))
            for d in d3s:
                T.add((UCOEX + d, RT, UCOEX + "MITRED3FEND"))
                for a in attacks:
                    T.add((UCOEX + d, UCOEX + "hasMITREATTACK", UCOEX + a))
            for x in cpes:
                xi = UCOEX + x
                T.add((xi, RT, UCOEX + "CPE"))
                r = cpe_lut.get(x)
                if r is not None:
                    T.add((xi, UCOEX + "cpeNameId", r["cpeNameId"]))
                    T.add((xi, UCOEX + "lastModified", _fix_frac(r["lastModified"])))
                    # unconditional on a dict hit ("{}" possible), like the
                    # engine and the SQL oracle
                    T.add((xi, UCOEX + "titles", _titles(r["titles"])))
                    T.add((xi, UCOEX + "dictionaryFound", "true"))
                else:
                    T.add((xi, UCOEX + "dictionaryFound", "false"))
            if cpes:
                for v in cves:
                    T.add((UCO + v, UCOEX + "hasCPE", UCOEX + cpes[0]))
            if row["role"] == "tool" and row["tool"]:
                T.add((UCOEX + "tool-" + row["tool"], RT, UCOEX + "Tool"))
                T.add((UCOEX + "tool-" + row["tool"], RL, row["tool"]))
            for tok in _dedup_keep_order(txt.lower().split(" ")):
                b = best.get(tok)
                if b is not None:
                    _, eid, etype = b
                    T.add((ns.entity_iri(eid, etype), RT,
                           ns.ENTITY_CLASS_IRI[etype]))

    # side tables
    for r in cwe:
        ci = UCO + r["id_value"]
        T.add((UCO + "ExploitTarget-" + r["id_value"], RT, UCO + "ExploitTarget"))
        T.add((UCO + "ExploitTarget-" + r["id_value"], UCO + "hasWeakness", ci))
        T.add((ci, RT, UCO + "CWE"))
        T.add((ci, UCO + "name", r["name"]))
        T.add((ci, UCO + "cweID", r["id_value"]))
        T.add((ci, UCO + "description", r["description"]))
        T.add((ci, UCO + "cweSummary", r["description"]))
        T.add((ci, UCO + "abstraction", r["abstraction"]))
        T.add((ci, UCO + "structure", r["structure"]))
        T.add((ci, UCO + "status", r["status"]))
        T.add((ci, UCO + "timeOfIntroduction", _fix_frac(r["time_of_introduction"])))
        if r["extended_summary"] is not None:
            T.add((ci, UCO + "cweExtendedSummary", r["extended_summary"]))
        if r["likelihood_of_exploit"] is not None:
            T.add((ci, UCO + "likelihoodOfExploit", r["likelihood_of_exploit"]))
        for pred, col in (("commonConsequences", "common_consequences"),
                          ("applicablePlatform", "applicable_platforms"),
                          ("modesOfIntroduction", "modes_of_introduction"),
                          ("detectionMethods", "detection_methods"),
                          ("potentialMitigations", "potential_mitigations"),
                          ("references", "references"),
                          ("mappingNotes", "mapping_notes"),
                          ("relatedAttackPatterns", "related_attack_patterns")):
            j = _cjson(r[col])
            if j is not None:
                T.add((ci, UCO + pred, j))
        if r["demonstrative_examples"] is not None:
            T.add((ci, UCO + "demonstrativeExamples", r["demonstrative_examples"]))
        for rw in r["related_weaknesses"] or ():
            T.add((ci, UCO + "relatedWeakness", UCO + rw["ID"]))
        for ob in r["observed_examples"] or ():
            oi = UCOEX + r["id_value"] + "-" + ob["Reference"]
            T.add((oi, RT, UCOEX + "ObservedExample"))
            T.add((oi, UCOEX + "DESCRIPTION", ob["Description"]))
            T.add((oi, UCOEX + "exampleObservedIn", UCO + ob["Reference"]))
            T.add((ci, UCOEX + "hasObservedExample", oi))
        for ap in r["related_attack_patterns"] or ():
            pi = ("https://capec.mitre.org/data/definitions/"
                  + ap.split("-")[1] + ".html")
            T.add((ci, UCOEX + "hasRelatedAttackPattern", pi))

    cved = pq.read_table(os.path.join(fixture_dir, "cve_dict.parquet")).to_pylist()
    for r in cved:
        vi, ci = UCO + "VULN-" + r["cve_id"], UCO + r["cve_id"]
        T.add((vi, RT, UCO + "Vulnerability"))
        T.add((vi, UCO + "publishedDateTime", _fix_frac(r["published"])))
        T.add((vi, UCO + "lastModifiedDateTime", _fix_frac(r["last_modified"])))
        for d in r["descriptions"] or ():
            T.add((vi, UCO + "summary", d["value"]))
        T.add((vi, UCO + "hasCVE_ID", ci))
        T.add((ci, RT, UCO + "CVE"))
        T.add((ci, RL, r["cve_id"]))
        T.add((ci, UCO + "vulnStatus", r["vuln_status"]))
        T.add((ci, UCO + "vectorString", r["vector_string"]))
        T.add((ci, UCO + "baseSeverity", r["base_severity"]))
        T.add((ci, UCO + "exploitabilityScore", r["exploitability_score"]))
        T.add((ci, UCO + "impactScore", r["impact_score"]))
        T.add((ci, UCO + "obtainAllPrivilege",
               "true" if r["obtain_all_privilege"] else "false"))
        T.add((ci, UCO + "userInteractionRequired",
               "true" if r["user_interaction_required"] else "false"))
        T.add((ci, UCO + "evaluatorSolution", r["evaluator_solution"]))

    capd = pq.read_table(os.path.join(fixture_dir, "capec_dict.parquet")).to_pylist()
    for r in capd:
        num = r["id_num"]
        pi = "https://capec.mitre.org/data/definitions/" + num + ".html"
        T.add((pi, RT, UCOEX + "CAPEC"))
        T.add((pi, RL, "CAPEC-" + num + ": " + r["name"]))
        T.add((pi, UCOEX + "CAPEC_id", num))
        T.add((pi, UCOEX + "CAPEC_name", r["name"]))
        T.add((pi, UCOEX + "Abstraction", r["abstraction"]))
        T.add((pi, UCOEX + "Likelihood", r["likelihood"]))
        T.add((pi, UCOEX + "Severity", r["severity"]))
        T.add((pi, UCOEX + "Description", r["description"]))
        for x in r["extended_description"] or ():
            T.add((pi, UCOEX + "ExtendedDescription", x))
        for x in r["related_attack_patterns"] or ():
            T.add((pi, UCOEX + "RelatedAttPattern", x))
        for st in r["execution_flow"] or ():
            if not (st["Step"].strip() and st["Phase"].strip()
                    and st["Description"].strip()):
                continue
            parts = [f"STEP-{st['Step'].strip()} ({st['Phase'].strip()}): "
                     f"{st['Description'].strip()}"]
            for k, tech in enumerate(st["Techniques"] or (), 1):
                if tech.strip():
                    parts.append(f"TECHNIQUE-{k}: {tech.strip()}")
            T.add((pi, UCOEX + "ExecutionFlowTechnique", " | ".join(parts)))
        for x in r["prerequisites"] or ():
            T.add((pi, UCOEX + "Prerequisites", x))
        for sk in r["skills"] or ():
            # reference-exact truthiness (parse.py:353-360): Level tested
            # and emitted RAW, Description stripped before test+emission
            level = sk["Level"] or ""
            desc = (sk["Description"] or "").strip()
            if level and desc:
                T.add((pi, UCOEX + "Skills_Required",
                       f"Level:{level} - Description:{desc}"))
        for x in r["resources"] or ():
            T.add((pi, UCOEX + "Resources_Required", x))
        for x in r["mitigations"] or ():
            T.add((pi, UCOEX + "Mitigations", x))
        for x in r["examples"] or ():
            T.add((pi, UCOEX + "Example", x))
        for c in r["consequences"] or ():
            # reference-exact truthiness (parse.py:374-392): pre-strip
            # Impact/scope-item tests; kept scopes stripped after
            scope_items = c["Scope"] or ()
            impact_raw = c["Impact"] or ""
            if not (len(scope_items) and impact_raw):
                continue
            sc = [s.strip() for s in scope_items if s]
            if sc:
                T.add((pi, UCOEX + "Consequences",
                       f"SCOPE:{','.join(sc)} - IMPACT:{impact_raw.strip()}"))
        for w in r["related_weaknesses"] or ():
            T.add((pi, UCOEX + "RelatedWeaknesses", w))
            T.add((pi, UCOEX + "hasRelatedWeakness", UCO + w))
            T.add((UCO + w, RT, UCO + "CWE"))
        for t in r["taxonomy_mappings"] or ():
            T.add((pi, UCOEX + "TaxonomyMappingATTACK", t))
            T.add((pi, UCOEX + "hasTaxonomyMapping", UCOEX + t))
            T.add((UCOEX + t, RT, UCOEX + "MITREATTACK"))

    d3d = pq.read_table(os.path.join(fixture_dir, "d3fend_dict.parquet")).to_pylist()
    for r in d3d:
        di = UCOEX + r["id"]
        T.add((di, RT, UCOEX + "MITRED3FEND"))
        T.add((di, UCOEX + "MITRED3FEND_ID", r["id"]))
        T.add((di, UCOEX + "MITRED3FEND_LABEL", r["label"]))
        T.add((di, UCOEX + "MITRED3FEND_DEFINITION", r["definition"]))
        if r["off_tech_id"] is not None:
            T.add((di, UCOEX + "hasMITREATTACK", UCOEX + r["off_tech_id"]))
            T.add((UCOEX + r["off_tech_id"], RT, UCOEX + "MITREATTACK"))

    nodes = pq.read_table(os.path.join(fixture_dir, "attack_nodes.parquet")).to_pylist()
    rels = pq.read_table(
        os.path.join(fixture_dir, "attack_relationships.parquet")).to_pylist()
    nk = {(n["ID"], n["kind"]) for n in nodes}
    for n in nodes:
        ni = UCOEX + n["ID"]
        T.add((ni, RT, ns.ATTACK_KIND_CLASS[n["kind"]]))
        T.add((ni, UCOEX + "NAME", n["name"]))
        T.add((ni, UCOEX + "DESCRIPTION", n["description"]))
        T.add((ni, UCOEX + "URL", n["url"]))
        T.add((ni, UCOEX + "DOMAIN", n["domain"]))
    for r in rels:
        if r["source_id"] is None:
            continue
        if (r["target_id"], r["target_type"]) not in nk:
            continue
        pred = ns.ATTACK_REL_PRED.get((r["source_type"], r["target_type"]))
        if pred:
            T.add((UCOEX + r["source_id"], pred, UCOEX + r["target_id"]))

    if canonicalize:
        from uckg_ray.stages.canonicalize import union_find_oracle
        # observed aliases only
        observed = set()
        for f in files:
            for row in pq.read_table(f, columns=["text"]).to_pylist():
                for tok in row["text"].lower().split(" "):
                    observed.add(tok)
        pairs = [(r["block_key"], r["entity_id"]) for r in alias
                 if r["block_key"] in observed]
        canon = union_find_oracle(pairs)
        etype = {r["entity_id"]: r["entity_type"] for r in alias}
        iri_map = {}
        for eid, c in canon.items():
            if eid != c:
                iri_map[ns.entity_iri(eid, etype[eid])] = ns.entity_iri(c, etype[c])
        T = {(iri_map.get(s, s), p, iri_map.get(o, o)) for s, p, o in T}
    return T


def precision_recall(got: set, want: set) -> tuple[float, float]:
    if not got or not want:
        return (0.0, 0.0)
    tp = len(got & want)
    return tp / len(got), tp / len(want)
