"""Deterministic synthetic transcript + dictionary fixtures (FIXTURES.md).

The graft input is a Parquet table of multi-turn conversation/agent
transcripts ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])`` — BASELINE.json ``input_hint``. The driver's
testdata has no such table, so we synthesise it deterministically (fixed
seed, no wall-clock) at a size keyed to the scale factor, plus the
dictionary side tables the KG stages consume:

- ``cwe_dict``      — mirrors the parsed CWE dictionary
                      (reference ``mapping/cwe/cwes.json`` record shape,
                      ``data_collection/cwe_collection.py:98-392``)
- ``cpe_dict``      — mirrors the SQLite ``cpe_data`` lookup table
                      (``data_collection/cve_collection.py:85-92``)
- ``alias_dict``    — entity-linking aliases (graft addition; single-token
                      surface forms so the DuckDB oracle can match by word)
- ``attack_nodes`` / ``attack_relationships`` — mirrors ``parse.py:113-249``

Everything is derived from ``numpy.random.default_rng`` with fixed seeds;
generation is idempotent and cached under ``/tmp/uckg_ray_fixtures/<sf>``
(atomic rename, versioned manifest). Re-running with the same GEN_VERSION
is a no-op; bumping GEN_VERSION invalidates the cache.

A fixed "coverage conversation" exercising every template branch (empty
text, dict-miss CWE/CPE, first-CPE-only rule, alias collisions, union-find
merges, >3-digit datetime fractions, duplicate text) is appended at every
scale so sf0.01 driver correctness runs hit all branches.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

GEN_VERSION = 10
SEED = 42
FIXTURE_ROOT = "/tmp/uckg_ray_fixtures"

from uckg_ray.schema import TRANSCRIPT_SCHEMA  # single source of truth

_FILLER = (
    "scan target host port service version banner probe result output command "
    "run shell session payload exploit patch advisory vendor report finding "
    "severity risk impact detail summary note check step plan next done ok fail "
    "error retry log trace packet request response header body token auth user "
    "admin config file path dir read write exec net dns http tls cert key hash"
).split()

_TOOLS = (
    "nmap curl grep sqlmap hydra nikto metasploit wireshark tcpdump masscan "
    "gobuster ffuf burp nessus openvas john hashcat aircrack netcat zap"
).split()

_STOP_EN = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]
_STOP_DE = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"]
_STOP_FR = ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"]


def n_turns_for_sf(sf_name: str) -> int:
    """sf0.001→6k, sf0.01→60k turns; the bench tier (sf ≥ 0.05) is ×16
    (sf0.1→9.6M turns) so map compute dominates fixed scheduling costs
    in the scaling measurement (FIXTURES.md §4: 'sf-bench ~600,000+';
    round 2 doubled the tier after the props/ artifact raised the
    fixed-cost share)."""
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        return 2_000
    mult = 96_000_000 if sf >= 0.05 else 6_000_000
    return max(2_000, int(round(mult * sf)))


# ---------------------------------------------------------------------------
# mention pools (all deterministic)
# ---------------------------------------------------------------------------

def _mention_pools():
    rng = np.random.default_rng([SEED, 1])
    years = rng.integers(2015, 2025, size=200)
    nums = rng.integers(1000, 9_999_999, size=200)
    cves = [f"CVE-{y}-{n}" for y, n in zip(years, nums)]
    cves[0] = "CVE-2021-44228"  # hub CVE (log4shell) — skew knob

    cwe_ids_in_dict = sorted(rng.choice(np.arange(1, 1400), size=300, replace=False).tolist())
    cwe_ids_out = sorted(rng.choice(np.arange(1400, 1600), size=50, replace=False).tolist())
    cwes_in = [f"CWE-{i}" for i in cwe_ids_in_dict]
    cwes_out = [f"CWE-{i}" for i in cwe_ids_out]

    capecs = [f"CAPEC-{i}" for i in sorted(rng.choice(np.arange(1, 700), size=80, replace=False).tolist())]

    t_base = sorted(rng.choice(np.arange(1000, 1700), size=120, replace=False).tolist())
    attacks = []
    for i, t in enumerate(t_base):
        if i % 3 == 0:
            attacks.append(f"T{t}.{(i % 3) + 1:03d}")
        else:
            attacks.append(f"T{t}")

    letters = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    d3s = []
    for i in range(40):
        ln = 2 + int(rng.integers(0, 6))
        d3s.append("D3-" + "".join(letters[j] for j in rng.integers(0, 26, size=ln)))
    d3s = sorted(set(d3s))

    vendors = [f"vendor{i}" for i in range(30)]
    products = [f"product{i}" for i in range(40)]
    parts = ["a", "o", "h"]
    cpe_pool = []
    for i in range(250):
        p = parts[int(rng.integers(0, 3))]
        v = vendors[int(rng.integers(0, 30))]
        pr = products[int(rng.integers(0, 40))]
        ver = f"{int(rng.integers(0, 9))}.{int(rng.integers(0, 20))}"
        cpe_pool.append(f"cpe:2.3:{p}:{v}:{pr}:{ver}")
    cpe_pool = sorted(set(cpe_pool))
    n_hit = int(len(cpe_pool) * 0.8)
    cpe_hits, cpe_misses = cpe_pool[:n_hit], cpe_pool[n_hit:]

    return {
        "cves": cves,
        "cwes_in": cwes_in,
        "cwes_out": cwes_out,
        "capecs": capecs,
        "attacks": attacks,
        "d3s": d3s,
        "cpe_hits": cpe_hits,
        "cpe_misses": cpe_misses,
    }


# ---------------------------------------------------------------------------
# dictionaries
# ---------------------------------------------------------------------------

def _build_cwe_dict(pools) -> pa.Table:
    """One row per dictionary CWE — the parsed-record shape of
    ``cwe_collection.py:98-392`` (every section the reference parser keeps
    AND the RML maps, ``cwe_rml.ttl:86-278``). Nested sections are Arrow
    struct/list columns; nullable columns (None) suppress the predicate."""
    rng = np.random.default_rng([SEED, 2])
    rows = {k: [] for k in (
        "id_value", "name", "abstraction", "structure", "status", "description",
        "extended_summary", "likelihood_of_exploit", "time_of_introduction",
        "related_weaknesses", "observed_examples", "related_attack_patterns",
        "applicable_platforms", "common_consequences", "modes_of_introduction",
        "detection_methods", "potential_mitigations", "demonstrative_examples",
        "references", "mapping_notes")}
    abstr = ["Base", "Variant", "Class", "Compound"]
    status = ["Stable", "Draft", "Incomplete"]
    phases = ["Architecture and Design", "Implementation", "Operation", "Testing"]
    scopes = ["Confidentiality", "Integrity", "Availability", "Access Control"]
    impacts = ["Read Application Data", "Execute Unauthorized Code",
               "DoS: Crash", "Bypass Protection Mechanism"]
    methods = ["Automated Static Analysis", "Fuzzing", "Manual Analysis"]
    langs_pf = ["C", "C++", "Java", "PHP", "Python"]
    cwes, cves, capecs = pools["cwes_in"], pools["cves"], pools["capecs"]
    for i, cid in enumerate(cwes):
        rows["id_value"].append(cid)
        rows["name"].append(f"Weakness {cid.split('-')[1]} name")
        rows["abstraction"].append(abstr[int(rng.integers(0, 4))])
        rows["structure"].append("Simple" if rng.random() < 0.8 else "Chain")
        rows["status"].append(status[int(rng.integers(0, 3))])
        # one non-ASCII description: raw-UTF-8 parity for plain literals
        # AND the compact-JSON sections both sides (ensure_ascii=False)
        rows["description"].append(
            f"description of {cid} — detaillierte Schwäche „zitiert“"
            if i == 0 else f"description of {cid}")
        rows["extended_summary"].append(
            f"extended summary of {cid}" if rng.random() < 0.7 else None)
        rows["likelihood_of_exploit"].append(
            ["High", "Medium", "Low"][int(rng.integers(0, 3))]
            if rng.random() < 0.6 else None)
        # date-only → T00:00:00 promotion (cwe_collection.py:335-336); some with
        # long fractions to exercise truncation (ontology_updater.py:7-30)
        r = rng.random()
        if r < 0.5:
            rows["time_of_introduction"].append(f"20{10 + i % 15:02d}-0{1 + i % 9}-1{i % 9}T00:00:00")
        else:
            rows["time_of_introduction"].append(
                f"20{10 + i % 15:02d}-0{1 + i % 9}-1{i % 9}T0{i % 9}:30:00.{int(rng.integers(0, 999999)):06d}"
            )
        nrel = int(rng.integers(0, 3))
        rel = [{"ID": cwes[int(rng.integers(0, len(cwes)))], "Nature": "ChildOf"} for _ in range(nrel)]
        rows["related_weaknesses"].append(rel)
        nobs = int(rng.integers(0, 3))
        obs = [
            {"Reference": cves[int(rng.integers(0, len(cves)))], "Description": f"observed in the wild {j}"}
            for j in range(nobs)
        ]
        rows["observed_examples"].append(obs)
        nap = int(rng.integers(0, 3))
        rows["related_attack_patterns"].append(
            [capecs[int(rng.integers(0, len(capecs)))] for _ in range(nap)]
        )
        rows["applicable_platforms"].append(
            [{"Type": "Language", "Class": langs_pf[int(rng.integers(0, 5))],
              "Prevalence": "Often" if rng.random() < 0.5 else "Sometimes"}
             for _ in range(int(rng.integers(1, 3)))]
            if rng.random() < 0.6 else None)
        cc_note = ("gefährlich — \"quoted\" délicat" if i == 0
                   else f"note {i}")  # row 0: non-ASCII inside a JSON literal
        rows["common_consequences"].append(
            [{"Scope": [scopes[int(j)] for j in
                        rng.choice(4, size=int(rng.integers(1, 3)), replace=False)],
              "Impact": [impacts[int(rng.integers(0, 4))]],
              "Note": cc_note if (i == 0 or rng.random() < 0.4) else None}
             for _ in range(int(rng.integers(1, 3)))]
            if (i == 0 or rng.random() < 0.7) else None)
        rows["modes_of_introduction"].append(
            [{"Phase": phases[int(rng.integers(0, 4))],
              "Note": f"introduced note {i}" if rng.random() < 0.3 else None}
             for _ in range(int(rng.integers(1, 3)))]
            if rng.random() < 0.6 else None)
        rows["detection_methods"].append(
            [{"Method": methods[int(rng.integers(0, 3))],
              "Description": f"detect {cid} via review",
              "Effectiveness": "High" if rng.random() < 0.5 else None}
             for _ in range(int(rng.integers(1, 3)))]
            if rng.random() < 0.5 else None)
        rows["potential_mitigations"].append(
            [{"Phase": phases[int(rng.integers(0, 4))],
              "Description": f"mitigate {cid} step {j}"}
             for j in range(int(rng.integers(1, 3)))]
            if rng.random() < 0.6 else None)
        rows["demonstrative_examples"].append(
            f"demonstrative example text for {cid}" if rng.random() < 0.4 else None)
        rows["references"].append(
            [{"External_Reference_ID": f"REF-{int(rng.integers(1, 1400))}"}
             for _ in range(int(rng.integers(1, 3)))]
            if rng.random() < 0.5 else None)
        rows["mapping_notes"].append(
            {"usage": ["Allowed", "Discouraged", "Prohibited"][int(rng.integers(0, 3))],
             "rationale": f"rationale {i}" if rng.random() < 0.5 else None}
            if rng.random() < 0.6 else None)
    schema = pa.schema([
        ("id_value", pa.string()), ("name", pa.string()), ("abstraction", pa.string()),
        ("structure", pa.string()), ("status", pa.string()), ("description", pa.string()),
        ("extended_summary", pa.string()), ("likelihood_of_exploit", pa.string()),
        ("time_of_introduction", pa.string()),
        ("related_weaknesses", pa.list_(pa.struct([("ID", pa.string()), ("Nature", pa.string())]))),
        ("observed_examples", pa.list_(pa.struct([("Reference", pa.string()), ("Description", pa.string())]))),
        ("related_attack_patterns", pa.list_(pa.string())),
        ("applicable_platforms", pa.list_(pa.struct(
            [("Type", pa.string()), ("Class", pa.string()), ("Prevalence", pa.string())]))),
        ("common_consequences", pa.list_(pa.struct(
            [("Scope", pa.list_(pa.string())), ("Impact", pa.list_(pa.string())),
             ("Note", pa.string())]))),
        ("modes_of_introduction", pa.list_(pa.struct(
            [("Phase", pa.string()), ("Note", pa.string())]))),
        ("detection_methods", pa.list_(pa.struct(
            [("Method", pa.string()), ("Description", pa.string()),
             ("Effectiveness", pa.string())]))),
        ("potential_mitigations", pa.list_(pa.struct(
            [("Phase", pa.string()), ("Description", pa.string())]))),
        ("demonstrative_examples", pa.string()),
        ("references", pa.list_(pa.struct([("External_Reference_ID", pa.string())]))),
        ("mapping_notes", pa.struct([("usage", pa.string()), ("rationale", pa.string())])),
    ])
    return pa.Table.from_pydict(rows, schema=schema)


def _build_cve_dict(pools) -> pa.Table:
    """One row per known CVE — the per-record projection of
    ``cve_collection.py:427-446`` (vulnStatus, CVSS v2 fields, privilege
    booleans, evaluatorSolution, multi-lang descriptions)."""
    rng = np.random.default_rng([SEED, 6])
    ids = list(dict.fromkeys(pools["cves"] + ["CVE-2014-0160"]))
    av = ["AV:N/AC:L/Au:N/C:P/I:P/A:P", "AV:L/AC:M/Au:S/C:C/I:C/A:C",
          "AV:N/AC:H/Au:N/C:N/I:P/A:N", "AV:A/AC:L/Au:N/C:P/I:N/A:N"]
    vstat = ["Analyzed", "Modified", "Awaiting Analysis", "Deferred"]
    sev = ["LOW", "MEDIUM", "HIGH"]
    langs = ["en", "es", "fr"]
    rows = {k: [] for k in (
        "cve_id", "published", "last_modified", "vuln_status", "vector_string",
        "base_severity", "exploitability_score", "impact_score",
        "obtain_all_privilege", "user_interaction_required",
        "evaluator_solution", "descriptions")}
    for i, cid in enumerate(ids):
        rows["cve_id"].append(cid)
        if rng.random() < 0.5:
            rows["published"].append(f"20{10 + i % 15:02d}-0{1 + i % 9}-0{1 + i % 9}T1{i % 9}:00:00")
        else:
            rows["published"].append(
                f"20{10 + i % 15:02d}-0{1 + i % 9}-0{1 + i % 9}T1{i % 9}:00:00.{int(rng.integers(0, 999999)):06d}")
        if rng.random() < 0.5:
            rows["last_modified"].append(f"20{12 + i % 13:02d}-0{1 + i % 9}-1{i % 9}T0{i % 9}:45:10")
        else:
            rows["last_modified"].append(
                f"20{12 + i % 13:02d}-0{1 + i % 9}-1{i % 9}T0{i % 9}:45:10.{int(rng.integers(1000, 999999)):06d}")
        rows["vuln_status"].append(vstat[int(rng.integers(0, 4))])
        rows["vector_string"].append(av[int(rng.integers(0, 4))])
        rows["base_severity"].append(sev[int(rng.integers(0, 3))])
        rows["exploitability_score"].append(f"{rng.integers(10, 100) / 10:.1f}")
        rows["impact_score"].append(f"{rng.integers(10, 100) / 10:.1f}")
        rows["obtain_all_privilege"].append(bool(rng.random() < 0.15))
        rows["user_interaction_required"].append(bool(rng.random() < 0.4))
        rows["evaluator_solution"].append(
            f"apply vendor patch for {cid}" if rng.random() < 0.3 else "")
        nd = 1 + int(rng.integers(0, 3))
        chosen = rng.choice(3, size=nd, replace=False)
        rows["descriptions"].append(
            [{"lang": langs[j], "value": f"{langs[j]} description of {cid}"}
             for j in sorted(chosen.tolist())])
    schema = pa.schema([
        ("cve_id", pa.string()), ("published", pa.string()),
        ("last_modified", pa.string()), ("vuln_status", pa.string()),
        ("vector_string", pa.string()), ("base_severity", pa.string()),
        ("exploitability_score", pa.string()), ("impact_score", pa.string()),
        ("obtain_all_privilege", pa.bool_()), ("user_interaction_required", pa.bool_()),
        ("evaluator_solution", pa.string()),
        ("descriptions", pa.list_(pa.struct([("lang", pa.string()), ("value", pa.string())]))),
    ])
    return pa.Table.from_pydict(rows, schema=schema)


def _build_capec_dict(pools) -> pa.Table:
    """One row per CAPEC pattern — the parsed-record shape of
    ``parse.py:253-432`` (execution flow steps with techniques, skills,
    consequences, taxonomy mappings, related weaknesses/patterns). Some
    flow steps / skills are deliberately incomplete to exercise the
    formatter skip rules (parse.py:334,358,388)."""
    rng = np.random.default_rng([SEED, 7])
    abstr = ["Meta", "Standard", "Detailed"]
    lik = ["High", "Medium", "Low", ""]
    sev = ["Very High", "High", "Medium", "Low", ""]
    nature = ["ChildOf", "ParentOf", "CanPrecede"]
    phases = ["Explore", "Experiment", "Exploit"]
    levels = ["High", "Medium", "Low"]
    cscopes = ["Confidentiality", "Integrity", "Availability", "Authorization"]
    cwes_all = pools["cwes_in"] + pools["cwes_out"]
    attacks = pools["attacks"]
    capecs = pools["capecs"]
    rows = {k: [] for k in (
        "id_num", "name", "abstraction", "status", "likelihood", "severity",
        "description", "extended_description", "related_attack_patterns",
        "execution_flow", "prerequisites", "skills", "resources",
        "mitigations", "examples", "consequences", "related_weaknesses",
        "taxonomy_mappings")}
    for i, cap in enumerate(capecs):
        num = cap.split("-", 1)[1]
        rows["id_num"].append(num)
        rows["name"].append(f"Attack Pattern {num}")
        rows["abstraction"].append(abstr[int(rng.integers(0, 3))])
        rows["status"].append("Stable" if rng.random() < 0.7 else "Draft")
        rows["likelihood"].append(lik[int(rng.integers(0, 4))])
        rows["severity"].append(sev[int(rng.integers(0, 5))])
        rows["description"].append(f"description of {cap}")
        rows["extended_description"].append(
            [f"extended paragraph {j} of {cap}" for j in range(int(rng.integers(0, 3)))])
        rows["related_attack_patterns"].append(
            [f"{nature[int(rng.integers(0, 3))]} "
             f"{capecs[int(rng.integers(0, len(capecs)))]}"
             for _ in range(int(rng.integers(0, 3)))])
        flow = []
        for s in range(int(rng.integers(0, 4))):
            complete = rng.random() > 0.15   # ~15% skipped by the formatter
            techs = [f"technique {t + 1} for step {s + 1}"
                     for t in range(int(rng.integers(0, 3)))]
            if techs and rng.random() < 0.2:
                # empty technique FIRST: enumeration must still count it
                # (parse.py:338-343 indexes before the emptiness check)
                techs.insert(0, "")
            flow.append({
                "Step": str(s + 1),
                "Phase": phases[min(s, 2)] if complete else "",
                "Description": f"step {s + 1} action for {cap}",
                "Techniques": techs,
            })
        rows["execution_flow"].append(flow)
        rows["prerequisites"].append(
            [f"prerequisite {j} of {cap}" for j in range(int(rng.integers(0, 3)))])
        skills = []
        for j in range(int(rng.integers(0, 3))):
            # ~10% empty Level (skipped by the formatter) and ~10%
            # whitespace-only Level (EMITTED raw under the reference's
            # pre-strip truthiness, parse.py:353-360) so both edge rules
            # are exercised
            r = rng.random()
            lvl = levels[int(rng.integers(0, 3))] if r > 0.2 else \
                ("" if r > 0.1 else " ")
            skills.append({"Level": lvl,
                           "Description": f"skill {j} needed for {cap}"})
        rows["skills"].append(skills)
        rows["resources"].append(
            [f"resource {j} for {cap}" for j in range(int(rng.integers(0, 2)))])
        rows["mitigations"].append(
            [f"mitigation {j} for {cap}" for j in range(int(rng.integers(0, 3)))])
        rows["examples"].append(
            [f"example instance {j} of {cap}" for j in range(int(rng.integers(0, 2)))])
        cons = []
        for j in range(int(rng.integers(0, 3))):
            # ~8% empty Impact (skipped) and ~7% whitespace-only Impact
            # (emits '... - IMPACT:' under the reference's pre-strip
            # truthiness, parse.py:374-392); ~10% of scope lists get a
            # whitespace-only item (contributes an empty comma-join slot)
            r = rng.random()
            impact = f"impact {j} of {cap}" if r > 0.15 else \
                ("" if r > 0.07 else " ")
            scope = [cscopes[int(k)] for k in
                     rng.choice(4, size=int(rng.integers(1, 3)), replace=False)]
            if rng.random() < 0.1:
                scope.insert(int(rng.integers(0, len(scope) + 1)), " ")
            cons.append({"Scope": scope, "Impact": impact})
        rows["consequences"].append(cons)
        rows["related_weaknesses"].append(
            [cwes_all[int(rng.integers(0, len(cwes_all)))]
             for _ in range(int(rng.integers(0, 3)))])
        rows["taxonomy_mappings"].append(
            [attacks[int(rng.integers(0, len(attacks)))]
             for _ in range(int(rng.integers(0, 3)))])
    schema = pa.schema([
        ("id_num", pa.string()), ("name", pa.string()), ("abstraction", pa.string()),
        ("status", pa.string()), ("likelihood", pa.string()), ("severity", pa.string()),
        ("description", pa.string()),
        ("extended_description", pa.list_(pa.string())),
        ("related_attack_patterns", pa.list_(pa.string())),
        ("execution_flow", pa.list_(pa.struct(
            [("Step", pa.string()), ("Phase", pa.string()),
             ("Description", pa.string()), ("Techniques", pa.list_(pa.string()))]))),
        ("prerequisites", pa.list_(pa.string())),
        ("skills", pa.list_(pa.struct([("Level", pa.string()), ("Description", pa.string())]))),
        ("resources", pa.list_(pa.string())),
        ("mitigations", pa.list_(pa.string())),
        ("examples", pa.list_(pa.string())),
        ("consequences", pa.list_(pa.struct(
            [("Scope", pa.list_(pa.string())), ("Impact", pa.string())]))),
        ("related_weaknesses", pa.list_(pa.string())),
        ("taxonomy_mappings", pa.list_(pa.string())),
    ])
    return pa.Table.from_pydict(rows, schema=schema)


def _build_d3fend_dict(pools) -> pa.Table:
    """One row per D3FEND technique — the flattened d3fend.json record of
    ``d3fend_collection.py`` / ``d3fend_rml.ttl:20-57`` (id, label,
    definition, offensive-technique link; ~20% have no ATT&CK link)."""
    rng = np.random.default_rng([SEED, 8])
    attacks = pools["attacks"]
    ids, labels, defs, offs = [], [], [], []
    for d in pools["d3s"]:
        ids.append(d)
        labels.append(f"Defense {d}")
        defs.append(f"definition of defensive technique {d}")
        offs.append(attacks[int(rng.integers(0, len(attacks)))]
                    if rng.random() < 0.8 else None)
    return pa.Table.from_pydict(
        {"id": ids, "label": labels, "definition": defs, "off_tech_id": offs},
        schema=pa.schema([("id", pa.string()), ("label", pa.string()),
                          ("definition", pa.string()), ("off_tech_id", pa.string())]),
    )


def _build_cpe_dict(pools) -> pa.Table:
    rng = np.random.default_rng([SEED, 3])
    names = list(pools["cpe_hits"])
    # extra dictionary-only entries never mentioned in transcripts
    extra = [f"cpe:2.3:a:extravendor{i}:extraproduct{i}:{i % 7}.{i % 11}" for i in range(200)]
    names = names + extra
    langs = ["en", "de", "fr", "es", "ja"]
    rows = {"cpeName": [], "cpeNameId": [], "lastModified": [], "titles": []}
    for i, name in enumerate(names):
        rows["cpeName"].append(name)
        rows["cpeNameId"].append("".join(f"{b:02x}" for b in rng.integers(0, 256, size=16)))
        # ~half with >3 fractional digits → P6 truncation path
        if rng.random() < 0.5:
            rows["lastModified"].append(
                f"20{15 + i % 10}-0{1 + i % 9}-2{i % 8}T1{i % 9}:05:33.{int(rng.integers(1000, 999999)):06d}"
            )
        else:
            rows["lastModified"].append(f"20{15 + i % 10}-0{1 + i % 9}-2{i % 8}T1{i % 9}:05:33.{int(rng.integers(0, 999)):03d}")
        ntit = 1 + int(rng.integers(0, 3))
        chosen = rng.choice(len(langs), size=ntit, replace=False)
        titles = [{"lang": langs[j], "title": f"title {langs[j]} {name.split(':')[3]}"}
                  for j in sorted(chosen.tolist())]
        if i == 0:
            # exercised by the coverage conversation at every sf:
            # duplicate lang (last-sorted/max title wins on both sides)
            # + non-ASCII (raw-UTF-8 JSON parity)
            titles.append({"lang": titles[0]["lang"], "title": "zz dup-lang wins"})
            titles.append({"lang": "ja", "title": "タイトル 「引用」 \\ テスト"})
        elif i == 1:
            titles.append({"lang": "es", "title": "título español — café"})
        rows["titles"].append(titles)
    schema = pa.schema([
        ("cpeName", pa.string()), ("cpeNameId", pa.string()), ("lastModified", pa.string()),
        ("titles", pa.list_(pa.struct([("lang", pa.string()), ("title", pa.string())]))),
    ])
    return pa.Table.from_pydict(rows, schema=schema)


def _build_alias_dict(pools) -> pa.Table:
    """Single-token aliases → entities; includes collisions (one alias, two
    entities), multi-alias entities, chained merges and a hub entity, so the
    union-find canonicalization has real work (FIXTURES.md §2.3)."""
    rows = []  # (alias, entity_id, entity_type, prior)

    def add(alias, eid, etype, prior):
        rows.append((alias, eid, etype, prior))

    for t in _TOOLS:
        add(t, f"tool:{t}", "tool", 1.0)
    # hub entity with many aliases
    for a in ["networkmapper", "portscan", "hostscan", "netprobe", "sweeper",
              "mapper", "recon", "probe7", "scanx", "nmapper"]:
        add(a, "tool:nmap", "tool", 0.8)
    # chain merges: shared aliases union distinct entities
    add("portscanner", "tool:nmap", "tool", 0.7)
    add("portscanner", "tool:masscan", "tool", 0.6)
    add("fuzzer", "tool:ffuf", "tool", 0.7)
    add("fuzzer", "tool:gobuster", "tool", 0.65)
    add("bruteforcer", "tool:hydra", "tool", 0.7)
    add("bruteforcer", "tool:john", "tool", 0.5)
    add("cracker", "tool:john", "tool", 0.8)
    add("cracker", "tool:hashcat", "tool", 0.75)
    # CWE aliases incl. a collision
    add("xss", "CWE-79", "cwe", 0.95)
    add("sqli", "CWE-89", "cwe", 0.95)
    add("injection", "CWE-89", "cwe", 0.9)
    add("injection", "CWE-77", "cwe", 0.6)
    add("overflow", "CWE-120", "cwe", 0.85)
    add("traversal", "CWE-22", "cwe", 0.9)
    add("csrf", "CWE-352", "cwe", 0.9)
    # CVE alias (hub)
    add("log4shell", "CVE-2021-44228", "cve", 1.0)
    add("heartbleed", "CVE-2014-0160", "cve", 1.0)
    # attack technique aliases
    add("phishing", "T1566", "attack", 0.9)
    add("powershell", "T1059.001", "attack", 0.9)
    return pa.Table.from_pydict(
        {
            "alias": [r[0] for r in rows],
            "entity_id": [r[1] for r in rows],
            "entity_type": [r[2] for r in rows],
            "block_key": [r[0].lower() for r in rows],
            "prior": [r[3] for r in rows],
        },
        schema=pa.schema([
            ("alias", pa.string()), ("entity_id", pa.string()), ("entity_type", pa.string()),
            ("block_key", pa.string()), ("prior", pa.float64()),
        ]),
    )


def _build_attack_tables(pools):
    """attack_nodes + attack_relationships — parse.py:113-249 shapes, with
    null source_ids (dropped, parse.py:231-234) and dangling target_ids
    (dropped by the referential join R11)."""
    rng = np.random.default_rng([SEED, 4])
    kinds = ["technique", "mitigation", "campaign", "group", "software", "tactic"]
    ids, names, descs, urls, domains, kindcol = [], [], [], [], [], []
    per_kind = {}
    for k in kinds:
        n = {"technique": 120, "mitigation": 40, "campaign": 25, "group": 30,
             "software": 40, "tactic": 14}[k]
        prefix = {"technique": "T", "mitigation": "M", "campaign": "C", "group": "G",
                  "software": "S", "tactic": "TA"}[k]
        if k == "technique":
            kid = pools["attacks"]
        else:
            base = sorted(rng.choice(np.arange(1000, 1999), size=n, replace=False).tolist())
            kid = [f"{prefix}{b}" for b in base]
        per_kind[k] = kid
        for i, x in enumerate(kid):
            ids.append(x)
            names.append(f"{k} {x}")
            descs.append(f"description of {k} {x}")
            urls.append(f"https://attack.mitre.org/{k}s/{x}")
            domains.append("enterprise-attack")
            kindcol.append(k)
    nodes = pa.Table.from_pydict(
        {"ID": ids, "name": names, "description": descs, "url": urls,
         "domain": domains, "kind": kindcol},
        schema=pa.schema([(c, pa.string()) for c in
                          ("ID", "name", "description", "url", "domain", "kind")]),
    )
    rel_specs = [
        ("mitigation", "technique", 80), ("campaign", "group", 20),
        ("campaign", "software", 25), ("campaign", "technique", 40),
        ("group", "software", 30), ("group", "technique", 50),
        ("software", "technique", 60),
    ]
    src_ids, src_types, tgt_ids, tgt_types = [], [], [], []
    for st, tt, n in rel_specs:
        s_pool, t_pool = per_kind[st], per_kind[tt]
        for i in range(n):
            if rng.random() < 0.05:
                src_ids.append(None)  # dropped rows (parse.py:231-234)
            else:
                src_ids.append(s_pool[int(rng.integers(0, len(s_pool)))])
            if rng.random() < 0.08:
                tgt_ids.append(f"X{int(rng.integers(9000, 9999))}")  # dangling target
            else:
                tgt_ids.append(t_pool[int(rng.integers(0, len(t_pool)))])
            src_types.append(st)
            tgt_types.append(tt)
    rels = pa.Table.from_pydict(
        {"source_id": src_ids, "source_type": src_types,
         "target_id": tgt_ids, "target_type": tgt_types},
        schema=pa.schema([(c, pa.string()) for c in
                          ("source_id", "source_type", "target_id", "target_type")]),
    )
    return nodes, rels


# ---------------------------------------------------------------------------
# transcripts
# ---------------------------------------------------------------------------

_ROLES = ["user", "assistant", "system", "tool"]

_ALIAS_TOKENS = ["nmap", "portscanner", "fuzzer", "bruteforcer", "cracker",
                 "xss", "sqli", "injection", "overflow", "traversal", "csrf",
                 "log4shell", "heartbleed", "phishing", "powershell",
                 "networkmapper", "sweeper", "recon"]

_BASE_TS = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in us
_CONVS_PER_CHUNK = 1_000          # ≈16k turns per chunk/file


def _gen_chunk(args) -> int:
    """Generate one chunk (a fixed conversation range) with its own seeded
    rng — content is independent of worker count and chunk scheduling.
    Mention insertion rates give each turn an expected ~1.3 entity
    mentions, with 12% hub-CVE and 8% hub-alias skew."""
    chunk_idx, n_convs, out_dir = args
    pools = _mention_pools()
    rng = np.random.default_rng([SEED, 5, chunk_idx])
    alias_tokens = _ALIAS_TOKENS
    chunk_rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    total = 0
    for ci in range(n_convs):
        conv_i = chunk_idx * _CONVS_PER_CHUNK + ci
        n_t = int(rng.integers(8, 25))
        conv_id = f"conv-{conv_i:06d}"
        conv_start = _BASE_TS + conv_i * 3_600_000_000
        for t in range(n_t):
            role = _ROLES[int(rng.integers(0, 4))] if t > 0 else "system"
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else ""
            nw = int(rng.integers(6, 26))
            words = [_FILLER[j] for j in rng.integers(0, len(_FILLER), size=nw)]
            # sprinkle language-agnostic stopwords so lang-id has signal
            for s in rng.integers(0, len(_STOP_EN), size=3):
                words.append(_STOP_EN[s])
            r = rng.random(8)
            if r[0] < 0.30:
                words.append(pools["cves"][int(rng.integers(0, len(pools["cves"])))])
            if r[1] < 0.12:
                words.append("CVE-2021-44228")  # hub skew
            if r[2] < 0.25:
                pool = pools["cwes_in"] if rng.random() < 0.85 else pools["cwes_out"]
                words.append(pool[int(rng.integers(0, len(pool)))])
            if r[3] < 0.12:
                words.append(pools["capecs"][int(rng.integers(0, len(pools["capecs"])))])
            if r[4] < 0.15:
                words.append(pools["attacks"][int(rng.integers(0, len(pools["attacks"])))])
            if r[5] < 0.08:
                words.append(pools["d3s"][int(rng.integers(0, len(pools["d3s"])))])
            if r[6] < 0.10:
                pool = pools["cpe_hits"] if rng.random() < 0.8 else pools["cpe_misses"]
                words.append(pool[int(rng.integers(0, len(pool)))])
                if rng.random() < 0.3:  # second CPE → first-only link rule exercised
                    words.append(pools["cpe_hits"][int(rng.integers(0, len(pools["cpe_hits"])))])
            if r[7] < 0.20:
                words.append(alias_tokens[int(rng.integers(0, len(alias_tokens)))])
                if rng.random() < 0.4:
                    words.append("nmap")  # hub alias skew
            perm = rng.permutation(len(words))
            text = " ".join(words[p] for p in perm)
            chunk_rows["conv_id"].append(conv_id)
            chunk_rows["turn_idx"].append(t)
            chunk_rows["role"].append(role)
            chunk_rows["text"].append(text)
            chunk_rows["tool"].append(tool)
            chunk_rows["ts"].append(conv_start + t * 30_000_000 + int(rng.integers(0, 1_000_000)))
            total += 1
    tbl = pa.Table.from_pydict(
        {
            "conv_id": chunk_rows["conv_id"],
            "turn_idx": pa.array(chunk_rows["turn_idx"], pa.int32()),
            "role": chunk_rows["role"],
            "text": chunk_rows["text"],
            "tool": chunk_rows["tool"],
            "ts": pa.array(chunk_rows["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    pq.write_table(tbl, os.path.join(out_dir, f"part-{chunk_idx:05d}.parquet"))
    return total


def _gen_coverage(out_dir: str) -> int:
    """Fixed coverage conversation — every template branch, identical at
    every sf (its own file so chunk content never shifts with sf)."""
    pools = _mention_pools()
    cov = [
        ("system", "", "boot sequence ok"),
        ("user", "", "please check CVE-2021-44228 and CVE-2014-0160 against CWE-79"),
        ("assistant", "", f"found {pools['cwes_in'][0]} and also {pools['cwes_out'][0]} not in dict"),
        ("tool", "nmap", f"scan output {pools['cpe_hits'][0]} {pools['cpe_hits'][1]} {pools['cpe_misses'][0]}"),
        ("assistant", "", f"pattern {pools['capecs'][0]} relates {pools['cwes_in'][1]} technique {pools['attacks'][0]}"),
        ("assistant", "", f"defense {pools['d3s'][0]} counters {pools['attacks'][1]}"),
        ("user", "", "injection portscanner fuzzer bruteforcer cracker log4shell"),
        ("user", "", "duplicate line duplicate line duplicate line"),
        ("assistant", "", "duplicate line duplicate line duplicate line"),
        ("tool", "curl", ""),
        ("user", "", "xss sqli overflow traversal csrf phishing powershell heartbleed"),
        ("assistant", "", f"multi {pools['cves'][1]} {pools['cves'][2]} {pools['cwes_in'][2]} CVE-2021-44228"),
    ]
    rows = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for t, (role, tool, text) in enumerate(cov):
        rows["conv_id"].append("conv-coverage")
        rows["turn_idx"].append(t)
        rows["role"].append(role)
        rows["text"].append(text)
        rows["tool"].append(tool)
        rows["ts"].append(_BASE_TS + 999_999 * 1_000_000 + t * 30_000_000 + t * 123_457)
    tbl = pa.Table.from_pydict(
        {
            "conv_id": rows["conv_id"],
            "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
            "role": rows["role"],
            "text": rows["text"],
            "tool": rows["tool"],
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    pq.write_table(tbl, os.path.join(out_dir, "part-coverage.parquet"))
    return len(cov)


def _gen_transcripts(n_turns: int, out_dir: str, parallel: bool = False) -> int:
    """Write ~n_turns transcript rows as one parquet file per chunk.
    Chunks carry independent seeded rngs, so output is deterministic
    regardless of worker count or chunking. ``parallel`` is only enabled
    from the clean `python -m uckg_ray.sources.fixtures` subprocess (a
    fork pool inside a Ray-connected process is unsafe)."""
    n_convs_total = max(125, -(-n_turns // 16))  # E[turns/conv] = 16
    tasks = []
    i = 0
    remaining = n_convs_total
    while remaining > 0:
        c = min(_CONVS_PER_CHUNK, remaining)
        tasks.append((i, c, out_dir))
        remaining -= c
        i += 1
    counts: list[int] | None = None
    if parallel and len(tasks) >= 4:
        try:
            import concurrent.futures as cf
            workers = min(12, os.cpu_count() or 4, len(tasks))
            with cf.ProcessPoolExecutor(max_workers=workers) as ex:
                counts = list(ex.map(_gen_chunk, tasks))
        except Exception:
            counts = None
    if counts is None:
        counts = [_gen_chunk(t) for t in tasks]
    return sum(counts) + _gen_coverage(out_dir)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def fixture_dir(sf_dir: str) -> str:
    """Map a driver sf dir (e.g. /root/testdata/sf0.01) → fixture cache dir."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(FIXTURE_ROOT, sf_name)


def _have_fixtures(out: str) -> bool:
    manifest = os.path.join(out, "MANIFEST.json")
    if not os.path.exists(manifest):
        return False
    try:
        with open(manifest) as f:
            return json.load(f).get("gen_version") == GEN_VERSION
    except (json.JSONDecodeError, OSError):
        return False


def ensure_fixtures(sf_dir: str) -> str:
    """Generate (once, atomically) the transcript + dictionary fixtures for
    the given scale dir; returns the fixture directory. Safe to call
    concurrently from multiple processes. Large tiers are generated by a
    clean `python -m uckg_ray.sources.fixtures` subprocess so the chunk
    pool can fork without inheriting Ray state."""
    out = fixture_dir(sf_dir)
    if _have_fixtures(out):
        return out
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if n_turns_for_sf(sf_name) > 200_000:
        import subprocess
        import sys
        try:
            subprocess.run([sys.executable, "-m", "uckg_ray.sources.fixtures",
                            sf_dir], check=False, capture_output=True,
                           timeout=1800)
        except Exception:
            pass
        if _have_fixtures(out):
            return out
    return _generate(sf_dir, parallel=False)


def _generate(sf_dir: str, parallel: bool) -> str:
    """Generation under an exclusive flock: the validity re-check happens
    while holding the lock, so a concurrent process can never rmtree a
    VALID fixture set another process just finished (and may be reading)."""
    import fcntl

    out = fixture_dir(sf_dir)
    os.makedirs(FIXTURE_ROOT, exist_ok=True)
    with open(out + ".lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            return _generate_locked(sf_dir, out, parallel)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def _generate_locked(sf_dir: str, out: str, parallel: bool) -> str:
    if _have_fixtures(out):
        return out
    shutil.rmtree(out, ignore_errors=True)

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    tmp = f"{out}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "transcripts"), exist_ok=True)

    n = n_turns_for_sf(sf_name)
    total = _gen_transcripts(n, os.path.join(tmp, "transcripts"),
                             parallel=parallel)

    pools = _mention_pools()
    pq.write_table(_build_cwe_dict(pools), os.path.join(tmp, "cwe_dict.parquet"))
    pq.write_table(_build_cpe_dict(pools), os.path.join(tmp, "cpe_dict.parquet"))
    pq.write_table(_build_cve_dict(pools), os.path.join(tmp, "cve_dict.parquet"))
    pq.write_table(_build_capec_dict(pools), os.path.join(tmp, "capec_dict.parquet"))
    pq.write_table(_build_d3fend_dict(pools), os.path.join(tmp, "d3fend_dict.parquet"))
    pq.write_table(_build_alias_dict(pools), os.path.join(tmp, "alias_dict.parquet"))
    nodes, rels = _build_attack_tables(pools)
    pq.write_table(nodes, os.path.join(tmp, "attack_nodes.parquet"))
    pq.write_table(rels, os.path.join(tmp, "attack_relationships.parquet"))

    with open(os.path.join(tmp, "MANIFEST.json"), "w") as f:
        json.dump({"gen_version": GEN_VERSION, "seed": SEED, "sf": sf_name,
                   "n_turns": total}, f)
    try:
        os.rename(tmp, out)
    except OSError:
        # another process won the race; use theirs
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def transcripts_path(sf_dir: str) -> str:
    return os.path.join(ensure_fixtures(sf_dir), "transcripts")


def dict_path(sf_dir: str, name: str) -> str:
    return os.path.join(ensure_fixtures(sf_dir), f"{name}.parquet")


if __name__ == "__main__":
    import sys
    _generate(sys.argv[1], parallel=True)
