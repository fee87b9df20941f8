"""Entity-linking stages: CPE lookup stubs, alias best-candidate."""

import os

import pyarrow as pa

from uckg_ray.schema import TRANSCRIPT_SCHEMA
from uckg_ray.stages.link import AliasLinker, CpeLinkStage, best_candidates, load_alias_table


def _batch(texts):
    n = len(texts)
    return pa.Table.from_pydict({
        "conv_id": ["c"] * n,
        "turn_idx": pa.array(range(n), pa.int32()),
        "role": ["user"] * n, "text": texts, "tool": [""] * n,
        "ts": pa.array([0] * n, pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)


def test_cpe_link_hit_and_miss(sf_small_fixtures):
    stage = CpeLinkStage(os.path.join(sf_small_fixtures, "cpe_dict.parquet"))
    hit = sorted(stage.lookup)[0]
    out = stage(_batch([f"x {hit} y cpe:2.3:a:none:none:0.0 z"])).to_pylist()
    by_name = {r["cpeName"]: r for r in out}
    assert by_name[hit]["dictionary_found"] is True
    assert by_name[hit]["cpeNameId"] is not None
    miss = by_name["cpe:2.3:a:none:none:0.0"]
    assert miss["dictionary_found"] is False and miss["cpeNameId"] is None


def test_alias_linker_best_candidate(sf_small_fixtures):
    path = os.path.join(sf_small_fixtures, "alias_dict.parquet")
    linker = AliasLinker(path)
    out = linker(_batch(["injection attempt", "fuzzer run"])).to_pylist()
    got = {r["alias"]: r["entity_id"] for r in out}
    assert got["injection"] == "CWE-89"      # prior 0.9 beats CWE-77 at 0.6
    assert got["fuzzer"] == "tool:ffuf"      # 0.7 beats gobuster 0.65


def test_best_candidates_tiebreak(sf_small_fixtures):
    import pandas as pd
    df = pd.DataFrame({
        "alias": ["x", "x"], "entity_id": ["b", "a"],
        "entity_type": ["tool", "tool"], "block_key": ["x", "x"],
        "prior": [0.5, 0.5]})
    best = best_candidates(df)
    assert best["x"][0] == "a"  # equal prior → min entity_id


def test_alias_distinct_per_turn(sf_small_fixtures):
    linker = AliasLinker(os.path.join(sf_small_fixtures, "alias_dict.parquet"))
    out = linker(_batch(["nmap nmap nmap"])).to_pylist()
    assert len(out) == 1  # distinct (turn, alias)


def test_entity_support_provenance(ray_session):
    import ray.data

    from uckg_ray.stages.link import entity_support

    # CVE-X: 3 mentions across 2 convs; CWE-Y: single witness
    m = pa.table({
        "conv_id": ["conv-b", "conv-a", "conv-a", "conv-a"],
        "turn_idx": pa.array([2, 7, 1, 1], pa.int32()),
        "ent_type": ["CVE", "CVE", "CVE", "CWE"],
        "ent_id": ["CVE-X", "CVE-X", "CVE-X", "CWE-Y"],
    })
    out = {r["ent_id"]: r for r in
           entity_support(ray.data.from_arrow(m).repartition(3))
           .take_all()}
    cve = out["CVE-X"]
    assert cve["n_mentions"] == 3 and cve["n_convs"] == 2
    assert (cve["first_conv"], cve["first_turn"]) == ("conv-a", 1)
    assert (cve["last_conv"], cve["last_turn"]) == ("conv-b", 2)
    cwe = out["CWE-Y"]
    assert cwe["n_mentions"] == 1 and cwe["n_convs"] == 1
    assert (cwe["first_conv"], cwe["first_turn"]) == \
        (cwe["last_conv"], cwe["last_turn"]) == ("conv-a", 1)


def test_gate_dropped_mentions(ray_session, sf_small_fixtures):
    import ray.data

    from uckg_ray.stages.link import gate_dropped_mentions

    m = pa.table({
        "conv_id": ["c1", "c1", "c2", "c1"],
        "turn_idx": pa.array([0, 1, 0, 2], pa.int32()),
        "ent_type": ["cwe", "cwe", "cwe", "cve"],
        # CWE-999999 is not in the fixture dictionary; CWE ids that ARE
        # in the dict must not appear; cve rows are out of scope
        "ent_id": ["CWE-999999", "CWE-999999", "CWE-999999",
                   "CVE-2021-0001"],
    })
    got = gate_dropped_mentions(
        ray.data.from_arrow(m).repartition(2),
        os.path.join(sf_small_fixtures, "cwe_dict.parquet")).take_all()
    assert len(got) == 1
    r = got[0]
    assert r["ent_id"] == "CWE-999999"
    assert r["n_mentions"] == 3 and r["n_convs"] == 2


def test_trending_entities_topk(ray_session):
    import ray.data

    from uckg_ray.schema import TRANSCRIPT_SCHEMA
    from uckg_ray.stages.link import trending_entities

    DAY = 86_400_000_000
    texts = ["CVE-2021-0001 and CVE-2021-0001",   # day 0: cve x2
             "CVE-2021-0002 T1059",               # day 0: cve2, attack
             "T1059 T1059 T1059"]                 # day 1: attack x3
    t = pa.table({
        "conv_id": ["c1", "c2", "c3"],
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": ["user"] * 3,
        "text": texts,
        "tool": [""] * 3,
        "ts": pa.array([10, DAY - 1, DAY + 5], pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    got = trending_entities(ray.data.from_arrow(t).repartition(2),
                            k=2).take_all()
    by_day = {}
    for r in got:
        by_day.setdefault(r["day"], []).append(r)
    d0 = sorted(by_day[0], key=lambda r: r["rank"])
    assert (d0[0]["ent_id"], d0[0]["n"], d0[0]["rank"]) == \
        ("CVE-2021-0001", 2, 1)
    assert d0[1]["rank"] == 2 and d0[1]["n"] == 1  # tie broken by type/id
    assert len(d0) == 2
    d1 = by_day[1]
    assert len(d1) == 1 and d1[0]["ent_id"] == "T1059" and d1[0]["n"] == 3


def test_entity_discovery_curve(ray_session):
    import ray.data

    from uckg_ray.schema import TRANSCRIPT_SCHEMA
    from uckg_ray.stages.link import entity_discovery_curve

    DAY = 86_400_000_000
    texts = ["CVE-2021-0001 T1059",      # day 0: two new entities
             "CVE-2021-0001",            # day 1: nothing new
             "CVE-2021-0002"]            # day 2: one new
    t = pa.table({
        "conv_id": ["c1", "c2", "c3"],
        "turn_idx": pa.array([0, 0, 0], pa.int32()),
        "role": ["user"] * 3,
        "text": texts,
        "tool": [""] * 3,
        "ts": pa.array([5, DAY + 5, 2 * DAY + 5], pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    got = {r["day"]: r["n_new_entities"] for r in
           entity_discovery_curve(ray.data.from_arrow(t).repartition(2))
           .take_all()}
    assert got == {0: 2, 2: 1}
