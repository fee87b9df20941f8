"""TripleEmitter semantics: dictionary gating, first-CPE rule, stubs."""

import os

import pyarrow as pa

from uckg_ray import namespaces as ns
from uckg_ray.schema import TRANSCRIPT_SCHEMA
from uckg_ray.stages.extract import TripleEmitter, extract_mentions


def _batch(rows):
    cols = {k: [] for k in ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    for i, (role, tool, text) in enumerate(rows):
        cols["conv_id"].append("c0")
        cols["turn_idx"].append(i)
        cols["role"].append(role)
        cols["text"].append(text)
        cols["tool"].append(tool)
        cols["ts"].append(1_704_067_200_000_000 + i)
    cols["turn_idx"] = pa.array(cols["turn_idx"], pa.int32())
    cols["ts"] = pa.array(cols["ts"], pa.timestamp("us"))
    return pa.Table.from_pydict(cols, schema=TRANSCRIPT_SCHEMA)


def _emitter(sf_small_fixtures):
    f = sf_small_fixtures
    return TripleEmitter(os.path.join(f, "cwe_dict.parquet"),
                         os.path.join(f, "cpe_dict.parquet"),
                         os.path.join(f, "alias_dict.parquet"))


def _spo(table):
    return set(zip(table.column("subj").to_pylist(),
                   table.column("pred").to_pylist(),
                   table.column("obj").to_pylist()))


def test_cwe_dictionary_gate(sf_small_fixtures):
    em = _emitter(sf_small_fixtures)
    in_dict = sorted(em.cwe_ids)[0]
    out = em(_batch([("user", "", f"{in_dict} and CWE-999999 here")]))
    spo = _spo(out)
    assert (ns.UCO + in_dict, ns.RDF_TYPE, ns.UCO + "CWE") in spo
    # ungated id emits nothing (cve_collection.py:384-389 membership filter)
    assert not any("CWE-999999" in s for s, _, _ in spo)


def test_first_cpe_only_links_to_cve(sf_small_fixtures):
    em = _emitter(sf_small_fixtures)
    hits = sorted(em.cpe_lookup)[:2]
    out = em(_batch([("user", "", f"CVE-2020-1111 {hits[0]} {hits[1]}")]))
    spo = _spo(out)
    assert (ns.UCO + "CVE-2020-1111", ns.UCOEX + "hasCPE", ns.UCOEX + hits[0]) in spo
    assert (ns.UCO + "CVE-2020-1111", ns.UCOEX + "hasCPE", ns.UCOEX + hits[1]) not in spo
    # but both CPEs get typed nodes
    assert (ns.UCOEX + hits[1], ns.RDF_TYPE, ns.UCOEX + "CPE") in spo


def test_cpe_miss_stub(sf_small_fixtures):
    em = _emitter(sf_small_fixtures)
    out = em(_batch([("user", "", "cpe:2.3:a:nosuch:thing:9.9")]))
    spo = _spo(out)
    xi = ns.UCOEX + "cpe:2.3:a:nosuch:thing:9.9"
    assert (xi, ns.UCOEX + "dictionaryFound", "false") in spo
    assert not any(p == ns.UCOEX + "cpeNameId" for s, p, _ in spo if s == xi)


def test_tool_turn_and_empty_text(sf_small_fixtures):
    em = _emitter(sf_small_fixtures)
    out = em(_batch([("tool", "curl", ""), ("user", "", "")]))
    spo = _spo(out)
    assert (ns.UCOEX + "tool-curl", ns.RDF_TYPE, ns.UCOEX + "Tool") in spo
    assert (ns.UCOEX + "tool-curl", ns.RDFS_LABEL, "curl") in spo


def test_alias_collision_resolution(sf_small_fixtures):
    # "injection" → CWE-89 (prior .9) beats CWE-77 (prior .6)
    em = _emitter(sf_small_fixtures)
    out = em(_batch([("user", "", "possible injection detected")]))
    spo = _spo(out)
    assert (ns.UCO + "CWE-89", ns.RDF_TYPE, ns.UCO + "CWE") in spo
    assert (ns.UCO + "CWE-77", ns.RDF_TYPE, ns.UCO + "CWE") not in spo


def test_duplicate_mentions_single_emission(sf_small_fixtures):
    em = _emitter(sf_small_fixtures)
    out = em(_batch([("user", "", "CVE-2020-1111 CVE-2020-1111")]))
    typed = [r for r in _spo(out)
             if r == (ns.UCO + "CVE-2020-1111", ns.RDF_TYPE, ns.UCO + "CVE")]
    assert len(typed) == 1


def test_extract_mentions_all_occurrences():
    out = extract_mentions(_batch([("user", "", "CVE-2020-1111 CVE-2020-1111")]))
    assert out.num_rows == 2  # multiset semantics matches regexp_extract_all
