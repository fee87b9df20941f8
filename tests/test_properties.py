"""Property-based tests (hypothesis): invariants that hold for ANY input,
not just the fixture corpus."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from uckg_ray import patterns as px
from uckg_ray.functions.scalars import truncate_long_fraction
from uckg_ray.stages.dedup import normalize_text, simhash64
from uckg_ray.stages.extract import scan_mentions

_PER_TYPE = {name: re.compile(rx) for name, rx in px.MENTION_TYPES}

# text alphabet that can produce (near-)mentions and junk
_texty = st.text(
    alphabet=st.sampled_from(list("CVEWAPD3T-.:abcdefz0123456789 ")),
    max_size=200)


@settings(max_examples=200, deadline=None)
@given(_texty)
def test_combined_scan_equals_per_type_findall(text):
    """The single combined scan must produce exactly the union of the
    per-type findall results (the SQL oracle's formulation) — the
    patterns are literal-prefix-disjoint by construction."""
    combined: dict[str, list[str]] = {}
    for et, eid in scan_mentions(text):
        combined.setdefault(et, []).append(eid)
    for name, rx in _PER_TYPE.items():
        assert combined.get(name, []) == rx.findall(text)


@settings(max_examples=200, deadline=None)
@given(st.datetimes(), st.integers(min_value=0, max_value=9),
       st.integers(min_value=0, max_value=999_999_999))
def test_truncate_long_fraction_idempotent(dt, n_frac, frac):
    """Idempotence on the function's actual domain: datetime literals
    with a single (possibly over-long) fraction — hypothesis found that
    arbitrary multi-dot strings are NOT a fixpoint (e.g. '.0000.00000'),
    which can't occur in xsd:dateTime lexical forms."""
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if n_frac:
        s += "." + str(frac).zfill(n_frac)[:n_frac]
    once = truncate_long_fraction(s)
    assert truncate_long_fraction(once) == once
    assert len(once) <= len(s)
    # fraction either kept intact (≤3 digits) or removed entirely
    assert once == s or once == s.split(".")[0]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=120))
def test_normalize_text_idempotent_and_clean(t):
    n = normalize_text(t)
    assert normalize_text(n) == n
    assert "  " not in n
    assert n == n.strip()
    assert all(c.islower() or c.isdigit() or c == " " for c in n)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                min_size=1, max_size=30))
def test_simhash_order_invariant(tokens):
    """SimHash depends on the token SET, not order or multiplicity."""
    import random
    shuffled = tokens[::-1] + tokens
    assert simhash64(tokens) == simhash64(shuffled)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abcde"),
                          st.sampled_from(["e1", "e2", "e3", "e4"])),
                min_size=1, max_size=20))
def test_union_find_oracle_properties(pairs):
    from uckg_ray.stages.canonicalize import union_find_oracle
    canon = union_find_oracle(pairs)
    ents = {e for _, e in pairs}
    assert set(canon) == ents
    # canonical ids are members, idempotent, and ≤ every member
    for e, c in canon.items():
        assert c in ents
        assert canon[c] == c
        assert c <= e
    # entities sharing an alias share a canonical id
    by_alias: dict[str, set] = {}
    for a, e in pairs:
        by_alias.setdefault(a, set()).add(e)
    for group in by_alias.values():
        assert len({canon[e] for e in group}) == 1


@given(st.lists(st.text(alphabet="abcx", min_size=0, max_size=6),
                min_size=2, max_size=2))
@settings(max_examples=200, deadline=None)
def test_lev_le1_matches_duckdb(pair):
    """_lev_le1 == DuckDB levenshtein(a,b) <= 1 on arbitrary short
    strings (the fuzzy-join verify kernel)."""
    import duckdb

    from uckg_ray.stages.dedup import _lev_le1
    a, b = pair
    duck = duckdb.connect().execute(
        "SELECT levenshtein(?, ?) <= 1", [a, b]).fetchone()[0]
    assert _lev_le1(a, b) == duck
