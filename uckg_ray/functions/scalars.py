"""Scalar string/date functions mirroring the reference (SURVEY.md §2.8).

Each function documents the reference behavior it preserves and has an
exact DuckDB-SQL equivalent used by the oracle (see __ray_entry__.py):

- ``format_ts_millis_arrow``  ≡ ``left(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), 23)``
- ``truncate_long_fraction``  ≡ ``regexp_replace(s, '\\.\\d{4,}$', '')``
- ``titles_to_json``          ≡ ``to_json(map_from_entries(list_transform(list_sort(titles), x -> (x.lang, x.title))))``
- ``json_compact``            ≡ ``to_json(col)`` (field order = Arrow struct order)
- ``capec_label``             ≡ ``'CAPEC-' || id || ': ' || name``
- ``execution_flow_strings``  ≡ per-step ``STEP-{n} ({phase}): {desc} | TECHNIQUE-{i}: {t}``
- ``skill_strings``           ≡ ``'Level:' || Level || ' - Description:' || Description``
- ``consequence_strings``     ≡ ``'SCOPE:' || join(Scope,',') || ' - IMPACT:' || Impact``
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc

_FRACTION_4PLUS = re.compile(r"\.\d{4,}$")


def format_ts_millis_arrow(ts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized P5: timestamp → ``YYYY-MM-DDTHH:MM:SS.mmm`` (3-digit millis).

    Reference: ``data_collection/cve_collection.py:208-221`` formats datetimes
    with a ``T`` separator and exactly 3 fractional digits (truncated, not
    rounded — we slice the 6-digit microsecond render down to 3).
    """
    unit = getattr(ts.type, "unit", None)
    if unit in ("ms", "us", "ns"):
        # Arrow's timestamp→string cast always renders the unit's full
        # fraction (3/6/9 digits), so splice+slice is exact — and 12.7×
        # faster than strftime (43 → 3.4 ms per 16k rows)
        arr = ts.combine_chunks() if isinstance(ts, pa.ChunkedArray) else ts
        s = pc.cast(arr, pa.string())
        s = pc.replace_substring(s, " ", "T", max_replacements=1)
        return pc.utf8_slice_codeunits(s, 0, 23)
    # second-resolution timestamps render no fraction — strftime pads
    s = pc.strftime(ts, format="%Y-%m-%dT%H:%M:%S.%f")
    return pc.utf8_slice_codeunits(s, 0, 23)


def truncate_long_fraction(s: str) -> str:
    """P6: drop the fractional-seconds part entirely when it has >3 digits.

    Reference: ``process/ontology_updater.py:7-30`` repairs xsd:dateTime
    literals whose fraction exceeds 3 digits by removing the fraction
    (truncation, not rounding — a parity quirk kept on purpose).
    """
    return _FRACTION_4PLUS.sub("", s)


def titles_to_json(titles: list[dict] | None) -> str:
    """CPE ``titles`` list<struct<lang,title>> → lang-keyed compact JSON.

    Reference: ``data_collection/cve_collection.py:402`` builds
    ``json.dumps({t["lang"]: t["title"] for t in titles})`` and the RML
    types it rdf:JSON (``mapping/cve/cve_rml.ttl:182-189``). We sort by
    (lang, title) before building the map so the literal is deterministic
    and byte-equal to the DuckDB oracle's
    ``to_json(map_from_entries(list_transform(list_sort(titles), ...)))``.

    DELIBERATE DEVIATION from the reference's literal bytes: the
    reference uses ``json.dumps`` defaults — ``', '``/``': '``
    separators, ``ensure_ascii=True`` \\uXXXX escapes, insertion-order
    keys, last-duplicate-lang wins — while this engine emits compact
    raw-UTF-8 sorted-key JSON with max-title-wins on duplicate lang.
    The JSON *value* is identical; only serialization differs. Chosen
    because sorted-compact is deterministic under any upstream row
    order and reproducible in DuckDB; byte parity with reference-
    produced literals would require mirroring json.dumps defaults on
    both engine and oracle (swap this function and the oracle's
    to_json construction together if that ever matters).
    """
    if not titles:
        return "{}"
    # ensure_ascii=False: DuckDB to_json emits raw UTF-8, not \uXXXX
    return json.dumps(
        dict(sorted((t["lang"], t["title"]) for t in titles)),
        separators=(",", ":"), ensure_ascii=False)


def json_compact(obj) -> str | None:
    """Nested dict/list → compact JSON with keys in *insertion* order.

    Used for the CWE property maps the reference RML types xsd:string over
    nested JSON structures (``mapping/cwe/cwe_rml.ttl:104-278`` —
    commonConsequences, applicablePlatform, modesOfIntroduction,
    detectionMethods, potentialMitigations, references, mappingNotes,
    relatedAttackPatterns). Arrow ``to_pylist`` yields dicts in struct
    field order, which is exactly DuckDB ``to_json``'s field order, so the
    two sides agree byte-for-byte. None → None (predicate not emitted).
    """
    if obj is None:
        return None
    # ensure_ascii=False: DuckDB to_json emits raw UTF-8, not \uXXXX
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def capec_label(id_num: str, name: str) -> str:
    """Composite CAPEC label ``CAPEC-{ID}: {Name}``
    (``mapping/capec/capec_rml.ttl:26-31``)."""
    return f"CAPEC-{id_num}: {name}"


def execution_flow_strings(steps: list[dict] | None) -> list[str]:
    """CAPEC execution flow → per-step composite strings.

    Reference ``parse.py:319-346``: each attack step with non-empty
    Step/Phase/Description renders as ``STEP-{n} ({phase}): {desc}``
    followed by ``TECHNIQUE-{i}: {text}`` for each non-empty technique,
    all joined with `` | ``. Steps missing any of the three parts are
    skipped entirely.
    """
    out = []
    for st in steps or ():
        num = (st.get("Step") or "").strip()
        phase = (st.get("Phase") or "").strip()
        desc = (st.get("Description") or "").strip()
        if not (num and phase and desc):
            continue
        parts = [f"STEP-{num} ({phase}): {desc}"]
        for i, tech in enumerate(st.get("Techniques") or (), 1):
            t = (tech or "").strip()
            if t:
                parts.append(f"TECHNIQUE-{i}: {t}")
        out.append(" | ".join(parts))
    return out


def skill_strings(skills: list[dict] | None) -> list[str]:
    """CAPEC skills → ``Level:{level} - Description:{description}``
    (``parse.py:353-360``), reference-exact truthiness: Level is tested
    and emitted RAW (the reference never strips the attribute), the
    description is stripped before both test and emission — so a
    whitespace-only Level emits ``Level:  - Description:...`` while an
    empty/missing one skips the item."""
    out = []
    for sk in skills or ():
        level = sk.get("Level") or ""
        desc = (sk.get("Description") or "").strip()
        if level and desc:
            out.append(f"Level:{level} - Description:{desc}")
    return out


def consequence_strings(cons: list[dict] | None) -> list[str]:
    """CAPEC consequences → ``SCOPE:{s1,s2} - IMPACT:{impact}``
    (``parse.py:374-392``), reference-exact truthiness: the guard tests
    the PRE-strip Impact text and the raw scope items; each kept scope
    item is stripped only after its truthiness test — so a
    whitespace-only Impact emits ``... - IMPACT:`` and a whitespace-only
    scope contributes an empty item to the comma join, exactly like the
    reference parser."""
    out = []
    for c in cons or ():
        scope_items = c.get("Scope") or ()
        impact_raw = c.get("Impact") or ""
        if not (len(scope_items) and impact_raw):
            continue
        scope_texts = [s.strip() for s in scope_items if s]
        if scope_texts:
            out.append(
                f"SCOPE:{','.join(scope_texts)} - IMPACT:{impact_raw.strip()}")
    return out
