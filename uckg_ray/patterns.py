"""Mention-detection regexes, shared verbatim between the Ray stages
(Python ``re``) and the DuckDB oracle SQL (RE2) — both engines give the
same non-overlapping left-to-right ``findall`` semantics for these
patterns, which is what the reference's dictionary probe expects
(``data_collection/cve_collection.py:384-399``).

Extraction runs one pass PER TYPE (not a combined alternation): a
combined scan is not equivalent — an earlier alternative can swallow
the prefix of a later-type mention (e.g. ``D3-CVE-2021-44228``: the
D3FEND branch consumes ``D3-CVE`` and the CVE is lost), while the SQL
oracle's per-type ``regexp_extract_all`` still finds both.
"""

from __future__ import annotations

import re

CVE_RX = r"CVE-\d{4}-\d{4,7}"
CWE_RX = r"CWE-\d+"
CAPEC_RX = r"CAPEC-\d+"
ATTACK_RX = r"\bT\d{4}(?:\.\d{3})?\b"
D3FEND_RX = r"D3-[A-Z]+"
CPE_RX = r"cpe:2\.3:[aho]:[a-z0-9_]+:[a-z0-9_]+:[0-9]+(?:\.[0-9]+)*"

MENTION_TYPES = [
    ("cve", CVE_RX),
    ("cwe", CWE_RX),
    ("capec", CAPEC_RX),
    ("attack", ATTACK_RX),
    ("d3fend", D3FEND_RX),
    ("cpe", CPE_RX),
]

PER_TYPE_RX = [(name, re.compile(rx)) for name, rx in MENTION_TYPES]
CPE_COMPILED = re.compile(CPE_RX)
