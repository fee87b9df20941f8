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
