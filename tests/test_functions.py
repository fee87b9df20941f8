"""Unit tests for scalar functions and mention patterns (SURVEY.md §5.1)."""

import pyarrow as pa

from uckg_ray.functions.scalars import (
    capec_label,
    consequence_strings,
    execution_flow_strings,
    format_ts_millis_arrow,
    json_compact,
    skill_strings,
    titles_to_json,
    truncate_long_fraction,
)
from uckg_ray.patterns import MENTION_TYPES, PER_TYPE_RX
from uckg_ray.stages.extract import scan_mentions


def test_truncate_long_fraction():
    # >3 fractional digits → fraction dropped entirely (P6 parity quirk)
    assert truncate_long_fraction("2024-01-01T00:00:00.123456") == "2024-01-01T00:00:00"
    assert truncate_long_fraction("2024-01-01T00:00:00.1234") == "2024-01-01T00:00:00"
    # ≤3 digits → untouched
    assert truncate_long_fraction("2024-01-01T00:00:00.123") == "2024-01-01T00:00:00.123"
    assert truncate_long_fraction("2024-01-01T00:00:00") == "2024-01-01T00:00:00"


def test_format_ts_millis():
    ts = pa.array([1_704_067_200_123_456], pa.timestamp("us"))
    out = format_ts_millis_arrow(ts).to_pylist()
    assert out == ["2024-01-01T00:00:00.123"]  # truncated, not rounded


def test_titles_json():
    assert titles_to_json(None) == "{}"
    assert titles_to_json([]) == "{}"
    got = titles_to_json(
        [{"lang": "fr", "title": "b"}, {"lang": "en", "title": "a"}])
    assert got == '{"en":"a","fr":"b"}'  # compact, sorted by lang


def test_json_compact():
    assert json_compact(None) is None
    assert (json_compact({"Scope": ["A"], "Note": None})
            == '{"Scope":["A"],"Note":null}')  # insertion order, compact


def test_capec_composite_formatters():
    # execution flow: skip incomplete steps; techniques keep their 1-based
    # index even when earlier techniques are empty (parse.py:319-346)
    flow = [
        {"Step": "1", "Phase": "Explore", "Description": "probe",
         "Techniques": ["", "scan ports"]},
        {"Step": "2", "Phase": "", "Description": "skipped",
         "Techniques": ["x"]},
        {"Step": "3", "Phase": "Exploit", "Description": "pwn",
         "Techniques": []},
    ]
    assert execution_flow_strings(flow) == [
        "STEP-1 (Explore): probe | TECHNIQUE-2: scan ports",
        "STEP-3 (Exploit): pwn",
    ]
    assert execution_flow_strings(None) == []
    # skills: both parts required (parse.py:353-360)
    assert skill_strings([{"Level": "High", "Description": "d"},
                          {"Level": "", "Description": "d2"}]) == [
        "Level:High - Description:d"]
    # consequences: scopes joined with ',', impact required (parse.py:374-392)
    assert consequence_strings([
        {"Scope": ["Confidentiality", "Integrity"], "Impact": "leak"},
        {"Scope": [], "Impact": "x"},
        {"Scope": ["A"], "Impact": ""},
    ]) == ["SCOPE:Confidentiality,Integrity - IMPACT:leak"]
    assert capec_label("66", "SQL Injection") == "CAPEC-66: SQL Injection"


def test_mention_patterns():
    txt = ("see CVE-2021-44228 and CWE-79 via CAPEC-66 using T1059.001 "
           "and T1234 defended by D3-NTA on cpe:2.3:a:vendor1:product2:1.5 done")
    got = scan_mentions(txt)
    assert ("cve", "CVE-2021-44228") in got
    assert ("cwe", "CWE-79") in got
    assert ("capec", "CAPEC-66") in got
    assert ("attack", "T1059.001") in got
    assert ("attack", "T1234") in got
    assert ("d3fend", "D3-NTA") in got
    assert ("cpe", "cpe:2.3:a:vendor1:product2:1.5") in got


def test_cpe_pattern_does_not_eat_sentence_period():
    got = scan_mentions("found cpe:2.3:o:v1:p2:3.10. next")
    assert got == [("cpe", "cpe:2.3:o:v1:p2:3.10")]


def test_attack_boundary():
    # T#### must be a standalone token (\b boundaries)
    assert scan_mentions("AT1234 T12345 T1234") == [("attack", "T1234")]


def test_per_type_scan_no_prefix_swallowing():
    # a combined alternation would let D3FEND consume 'D3-CVE' and lose
    # the CVE; per-type passes must find both (oracle parity)
    got = scan_mentions("mitigated by D3-CVE-2021-44228")
    assert ("cve", "CVE-2021-44228") in got
    assert ("d3fend", "D3-CVE") in got
    assert [n for n, _ in PER_TYPE_RX] == [n for n, _ in MENTION_TYPES]


def test_empty_schema_warning_filter():
    """The executor-noise filter drops only the empty-new-schema variant
    of Ray's RefBundle warning; a real two-schema mismatch still warns."""
    import logging

    import uckg_ray  # noqa: F401  (installs the filter on import)
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state")
    mk = lambda m: logging.LogRecord("x", logging.WARNING, "", 0, m, (), None)
    empty = mk("Operator produced a RefBundle with a different schema than "
               "the previous one. Previous schema: a: int64, new schema: . "
               "This may lead to unexpected behavior.")
    real = mk("Operator produced a RefBundle with a different schema than "
              "the previous one. Previous schema: a: int64, new schema: "
              "b: string. This may lead to unexpected behavior.")
    assert not lg.filter(empty)
    assert lg.filter(real)
