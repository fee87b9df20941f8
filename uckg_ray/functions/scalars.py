"""Scalar string/date functions mirroring the reference (SURVEY.md §2.8).

Each function documents the reference behavior it preserves and has an
exact DuckDB-SQL equivalent used by the oracle (see __ray_entry__.py):

- ``format_ts_millis_arrow``  ≡ ``left(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'), 23)``
- ``truncate_long_fraction``  ≡ ``regexp_replace(s, '\\.\\d{4,}$', '')``
- ``titles_to_lang_string``   ≡ ``array_to_string(list_sort(list_transform(...)), '|')``
"""

from __future__ import annotations

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
    s = pc.strftime(ts, format="%Y-%m-%dT%H:%M:%S.%f")
    return pc.utf8_slice_codeunits(s, 0, 23)


def truncate_long_fraction(s: str) -> str:
    """P6: drop the fractional-seconds part entirely when it has >3 digits.

    Reference: ``process/ontology_updater.py:7-30`` repairs xsd:dateTime
    literals whose fraction exceeds 3 digits by removing the fraction
    (truncation, not rounding — a parity quirk kept on purpose).
    """
    return _FRACTION_4PLUS.sub("", s)


def titles_to_lang_string(titles: list[dict] | None) -> str:
    """CPE ``titles`` list<struct<lang,title>> → deterministic flat literal.

    Reference: ``data_collection/cve_collection.py:402`` converts the titles
    list into a lang-keyed map serialized as an rdf:JSON literal
    (``mapping/cve/cve_rml.ttl:182-189``). We keep the rdf:JSON datatype tag
    but serialize as ``lang=title`` pairs joined by ``|`` sorted by lang so
    the DuckDB oracle can reproduce it byte-for-byte.
    """
    if not titles:
        return ""
    pairs = sorted(f"{t['lang']}={t['title']}" for t in titles)
    return "|".join(pairs)
