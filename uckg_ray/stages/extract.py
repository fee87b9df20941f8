"""Mention detection + ontology-template triple emission.

Re-expresses the reference's RML layer (SURVEY.md §2.4, the six
``mapping/*/*_rml.ttl`` files executed by mapper.jar) as native
``map_batches`` transforms over Arrow batches of transcript turns.

Reference-parity quirks kept on purpose (SURVEY.md §7.4):

- CWE mentions are dictionary-gated (``cve_collection.py:384-389``).
- Only the FIRST CPE mention of a turn links to the turn's CVEs
  (first-node-first-cpeMatch, ``cve_collection.py:390-399``).
- dictionary_found stub rows for CPE misses (``cve_collection.py:413-420``).
- booleans rendered as lexical "true"/"false" strings typed xsd:boolean
  (``mapping/cve/cve_rml.ttl:190-196``).
- datetimes truncated, never rounded (P5/P6).

``TripleEmitter`` is a callable class for an actor-pool ``map_batches``:
dictionaries are loaded once per actor in ``__init__`` (reference loads
the CWE dict once before its page loop, ``cve_collection.py:347``; CPE
dict is its SQLite side table, ``cve_collection.py:261-287``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from uckg_ray import namespaces as ns
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
from uckg_ray.schema import EDGE_SCHEMA, MENTION_SCHEMA


# sentinel predicate for observed-alias marker rows (never in final output)
ALIAS_MARKER_PRED = "__alias__"


def scan_mentions(text: str) -> list[tuple[str, str]]:
    """All (ent_type, ent_id) occurrences — one independent pass per type
    (type-major order), exactly the SQL oracle's per-type
    regexp_extract_all semantics. Null-safe: None → no mentions."""
    if not text:
        return []
    out = []
    for name, rx in PER_TYPE_RX:
        for m in rx.finditer(text):
            out.append((name, m.group()))
    return out


def _text_frame(texts) -> "object":
    """texts (python list OR Arrow string array) → 1-column polars frame
    ``t`` with nulls filled. Arrow input converts zero-copy — the hot
    path never materializes Python strings for the scan."""
    import polars as pl
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(texts, pa.Array):
        s = pl.from_arrow(texts)
    else:
        s = pl.Series(list(texts), dtype=pl.String)
    return pl.DataFrame({"t": s.fill_null("")})


def scan_mentions_flat(texts: list[str | None]) -> dict:
    """Per-TYPE flat mention streams: ``{type: (row_idx ndarray, ids)}``
    in match order, feeding the vectorized family-level emission in
    ``TripleEmitter``. One polars ``str.extract_all`` pass per type —
    Rust regex with identical non-overlapping left-to-right findall
    semantics for these patterns (patterns.py keeps them valid in
    Python ``re``, RE2 and Rust alike). Measured 1.7× over the
    concatenated-finditer scan single-threaded and 3.1× at 24 busy
    cores (Python ``re`` thrashes shared caches; the Rust scan
    doesn't), on sf0.1 16k-row batches."""
    import numpy as np
    import polars as pl
    df = _text_frame(texts).with_row_index("r").lazy()
    # one collect_all over six lazy frames: the text column is scanned
    # once and shared, vs 3 eager collects per type (60.8 → 20.5 ms per
    # 16k-row batch, single-threaded)
    frames = [(df.select(pl.col("r"),
                         pl.col("t").str.extract_all(rx).alias("m"))
               .filter(pl.col("m").list.len() > 0)
               .explode("m"))
              for _, rx in MENTION_TYPES]
    res = pl.collect_all(frames)
    return {name: (h["r"].to_numpy().astype(np.int64), h["m"].to_list())
            for (name, _), h in zip(MENTION_TYPES, res)}


def extract_mentions(batch: pa.Table) -> pa.Table:
    """Stateless map_batches fn → mention rows (all occurrences;
    type-major within the batch — every consumer aggregates or
    hash-compares, so row order is not part of the contract).
    Fully vectorized: the Rust ``scan_mentions_flat`` scan feeds Arrow
    ``take`` per type — no Python loop per mention (the per-mention
    list-append version measured ~2× slower on mention-heavy
    batches)."""
    def _cc(col):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col

    conv = _cc(batch.column("conv_id"))
    turn = _cc(batch.column("turn_idx").cast(pa.int32()))
    flat = scan_mentions_flat(_cc(batch.column("text")))
    parts = []
    for name, _ in PER_TYPE_RX:
        idx, ids = flat[name]
        if len(idx) == 0:
            continue
        parts.append(pa.Table.from_arrays(
            [conv.take(pa.array(idx)), turn.take(pa.array(idx)),
             pa.array([name] * len(idx), pa.string()),
             pa.array(ids, pa.string())],
            schema=MENTION_SCHEMA))
    if not parts:
        return MENTION_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def _uniq(seq):
    """Order-preserving dedup (first occurrence wins — 'first CPE' rule)."""
    seen = set()
    out = []
    for x in seq:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


class TripleEmitter:
    """Actor-pool stage: transcript turns → (subj,pred,obj,...) edge rows.

    One actor loads the CWE dictionary (gate + names) and CPE dictionary
    (lookup join J1) once; ``__call__`` runs per Arrow batch.
    """

    def __init__(self, cwe_dict_path: str, cpe_dict_path: str,
                 alias_dict_path: str | None = None,
                 mark_aliases: bool = False,
                 keep_witnesses: bool = False):
        self.mark_aliases = mark_aliases
        # keep_witnesses: preserve EVERY distinct (triple, conv, turn)
        # witness instead of collapsing each triple to its min witness —
        # the provenance-counting input (triple_support); the default
        # collapses (witness_dedup) because every other consumer dedups
        # globally and the collapse cuts extraction output ~4×.
        self.keep_witnesses = keep_witnesses
        cwe = pq.read_table(cwe_dict_path, columns=["id_value", "name"])
        self.cwe_names = dict(zip(cwe.column("id_value").to_pylist(),
                                  cwe.column("name").to_pylist()))
        self.cwe_ids = frozenset(self.cwe_names)
        self.alias_best: dict[str, tuple[str, str]] = {}
        if alias_dict_path is not None:
            from uckg_ray.stages.link import best_candidates, load_alias_table
            self.alias_best = best_candidates(load_alias_table(alias_dict_path))
        cpe = pq.read_table(cpe_dict_path)
        self.cpe_lookup = {}
        for name, nid, lm, titles in zip(
            cpe.column("cpeName").to_pylist(), cpe.column("cpeNameId").to_pylist(),
            cpe.column("lastModified").to_pylist(), cpe.column("titles").to_pylist(),
        ):
            self.cpe_lookup[name] = (nid, truncate_long_fraction(lm),
                                     titles_to_json(titles))

    def _alias_rows(self, texts: list[str | None]) -> list[list[str]]:
        """Per-row ordered-unique alias tokens:
        ``[t for t in _uniq(txt.lower().split(' ')) if t in alias_best]``.
        (Row-list form, kept for tests; the hot path uses
        ``_alias_flat``.)"""
        best = self.alias_best
        if not best:
            return [[] for _ in texts]
        out: list[list[str]] = []
        for t in texts:
            row: list[str] = []
            seen: set[str] = set()
            for tok in (t or "").lower().split(" "):
                if tok in best and tok not in seen:
                    seen.add(tok)
                    row.append(tok)
            out.append(row)
        return out

    def _alias_flat(self, texts: list[str | None]):
        """Flat (row_idx ndarray, token list) of per-row ordered-unique
        alias hits — all-Rust polars path (lowercase → split → explode →
        is_in → maintain-order unique), ≡ ``_alias_flat == flattened
        _alias_rows``. Token-split membership measured faster than an
        alias-alternation regex (0.07 s vs 0.12 s per 16k rows); the
        polars form cuts the split+membership loop a further ~5×."""
        import numpy as np
        import polars as pl
        best = self.alias_best
        if not best:
            return np.array([], np.int64), []
        if not hasattr(self, "_alias_keys"):
            self._alias_keys = pl.Series("v", list(best))
            self._alias_literals = list(best)
        # Aho-Corasick substring prefilter (contains_any) before the
        # allocation-heavy split+explode: a token match implies the
        # substring is present, so the kept rows are a superset and the
        # exact token filter below is unchanged — only ~20% of rows
        # carry any alias, and the prefilter halves the scan cost
        # (22 → 12 ms / 16k rows single-threaded)
        low = (_text_frame(texts).with_row_index("r")
               .select(pl.col("r"),
                       pl.col("t").str.to_lowercase().alias("t")))
        cand = low.filter(pl.col("t").str.contains_any(self._alias_literals))
        hits = (cand.lazy()
                .select(pl.col("r"),
                        pl.col("t").str.split(" ").alias("v"))
                .explode("v")
                .filter(pl.col("v").is_in(self._alias_keys))
                .unique(subset=["r", "v"], keep="first", maintain_order=True)
                .collect())
        return (hits["r"].to_numpy().astype(np.int64), hits["v"].to_list())

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized family-level emission: mentions arrive as per-type
        flat (row, id) frames (``scan_mentions_flat``), stable-deduped
        per row with pandas ``drop_duplicates`` (≡ the reference's
        per-turn ``_uniq``), cross-row-product templates (CWE×CVE,
        CAPEC×CWE, D3FEND×ATT&CK, first-CPE×CVE) via ``merge`` on the
        row index — each template family is ONE columnar append instead
        of per-edge Python calls. The output edge MULTISET is identical
        to the per-row emitter (only row order differs; every consumer
        dedups/sorts downstream). Measured ≥1.5× on the extract stage."""
        import numpy as np
        import pandas as pd
        import pyarrow.compute as pc

        def _cc(col):
            return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col

        conv_arr = _cc(batch.column("conv_id"))
        turn_arr = _cc(batch.column("turn_idx"))
        texts = _cc(batch.column("text"))  # Arrow array: zero-copy scans
        ts_arr = pc.fill_null(_cc(format_ts_millis_arrow(batch.column("ts"))),
                              "")
        flat = scan_mentions_flat(texts)

        UCO, UCOEX = ns.UCO, ns.UCOEX
        RT, RL = ns.RDF_TYPE, ns.RDFS_LABEL
        S, P, O, LIT, DT, C, T = [], [], [], [], [], [], []

        def fam(r, s, p, o, lit, dt):
            """One template family: r = row indices (Arrow lineage take),
            the rest are equal-length sequences / Arrow arrays or
            broadcast scalars."""
            k = len(r)
            if k == 0:
                return
            S.append(pa.array([s] * k, pa.string()) if isinstance(s, str)
                     else (s if isinstance(s, pa.Array)
                           else pa.array(s, pa.string())))
            P.append(pa.array([p] * k, pa.string()))
            O.append(pa.array([o] * k, pa.string()) if isinstance(o, str)
                     else (o if isinstance(o, pa.Array)
                           else pa.array(o, pa.string())))
            LIT.append(np.full(k, lit))
            DT.append(pa.array([dt] * k, pa.string()))
            idx = pa.array(r, pa.int64())
            C.append(pc.take(conv_arr, idx))
            T.append(pc.take(turn_arr, idx))

        def dedup(name):
            rows, ids = flat[name]
            if len(ids) == 0:
                return pd.DataFrame({"r": np.array([], np.int64), "v": []})
            return (pd.DataFrame({"r": rows, "v": ids})
                    .drop_duplicates(ignore_index=True))

        cve = dedup("cve")
        cwe = dedup("cwe")
        if len(cwe):
            cwe = cwe[cwe["v"].isin(self.cwe_ids)].reset_index(drop=True)
        capec = dedup("capec")
        attack = dedup("attack")
        d3 = dedup("d3fend")
        cpe = dedup("cpe")

        # R1/R2 — VULN + CVE node pair per CVE mention
        if len(cve):
            r = cve["r"].to_numpy()
            v = cve["v"].tolist()
            vi = [UCO + "VULN-" + x for x in v]
            ci = [UCO + x for x in v]
            fam(r, vi, RT, UCO + "Vulnerability", False, ns.IRI)
            fam(r, vi, UCO + "hasCVE_ID", ci, False, ns.IRI)
            fam(r, vi, UCO + "publishedDateTime",
                pc.take(ts_arr, pa.array(r, pa.int64())), True,
                ns.XSD_DATETIME)
            fam(r, ci, RT, UCO + "CVE", False, ns.IRI)
            fam(r, ci, RL, v, True, ns.XSD_STRING)
        # R4/R6/R7 — dictionary-gated CWE mentions + co-occurrence links
        if len(cwe):
            r = cwe["r"].to_numpy()
            w = cwe["v"].tolist()
            ei = [UCO + "ExploitTarget-" + x for x in w]
            wi = [UCO + x for x in w]
            fam(r, ei, RT, UCO + "ExploitTarget", False, ns.IRI)
            fam(r, ei, UCO + "hasWeakness", wi, False, ns.IRI)
            fam(r, wi, RT, UCO + "CWE", False, ns.IRI)
            fam(r, wi, UCO + "name", [self.cwe_names[x] for x in w], True,
                ns.XSD_STRING)
            if len(cve):
                m = cwe.merge(cve, on="r", suffixes=("_w", "_v"))
                fam(m["r"].to_numpy(),
                    [UCO + "ExploitTarget-" + x for x in m["v_w"]],
                    UCO + "hasVulnerability",
                    [UCO + "VULN-" + x for x in m["v_v"]], False, ns.IRI)
        # R8 — CAPEC URL subjects + related-weakness links
        if len(capec):
            r = capec["r"].to_numpy()
            p_ = capec["v"].tolist()
            pi = [ns.capec_iri(x) for x in p_]
            fam(r, pi, RT, UCOEX + "CAPEC", False, ns.IRI)
            fam(r, pi, RL, p_, True, ns.XSD_STRING)
            if len(cwe):
                m = capec.merge(cwe, on="r", suffixes=("_p", "_w"))
                fam(m["r"].to_numpy(), [ns.capec_iri(x) for x in m["v_p"]],
                    UCOEX + "hasRelatedWeakness",
                    [UCO + x for x in m["v_w"]], False, ns.IRI)
        # R10 — ATT&CK technique stubs
        if len(attack):
            fam(attack["r"].to_numpy(),
                [UCOEX + x for x in attack["v"]], RT,
                UCOEX + "MITREATTACK", False, ns.IRI)
        # R12 — D3FEND + defense→technique links
        if len(d3):
            fam(d3["r"].to_numpy(), [UCOEX + x for x in d3["v"]], RT,
                UCOEX + "MITRED3FEND", False, ns.IRI)
            if len(attack):
                m = d3.merge(attack, on="r", suffixes=("_d", "_a"))
                fam(m["r"].to_numpy(), [UCOEX + x for x in m["v_d"]],
                    UCOEX + "hasMITREATTACK",
                    [UCOEX + x for x in m["v_a"]], False, ns.IRI)
        # R3/J1 — CPE lookup join with found/miss stubs
        if len(cpe):
            r = cpe["r"].to_numpy()
            xi = [UCOEX + x for x in cpe["v"]]
            fam(r, xi, RT, UCOEX + "CPE", False, ns.IRI)
            hit = cpe["v"].map(self.cpe_lookup)
            hm = hit.notna().to_numpy()
            if hm.any():
                hr = r[hm]
                hxi = [x for x, keep in zip(xi, hm) if keep]
                triples = hit[hm].tolist()
                fam(hr, hxi, UCOEX + "cpeNameId",
                    [h[0] for h in triples], True, ns.XSD_STRING)
                fam(hr, hxi, UCOEX + "lastModified",
                    [h[1] for h in triples], True, ns.XSD_DATETIME)
                # lang-keyed JSON literal, always emitted on a dict hit
                # ("{}"s possible) — cve_collection.py:402 json.dumps
                fam(hr, hxi, UCOEX + "titles",
                    [h[2] for h in triples], True, ns.RDF_JSON)
                fam(hr, hxi, UCOEX + "dictionaryFound", "true", True,
                    ns.XSD_BOOLEAN)
            if (~hm).any():
                fam(r[~hm], [x for x, keep in zip(xi, hm) if not keep],
                    UCOEX + "dictionaryFound", "false", True, ns.XSD_BOOLEAN)
            # P3 quirk — only the FIRST CPE links to the turn's CVEs
            if len(cve):
                fc = cpe.drop_duplicates("r")
                m = fc.merge(cve, on="r", suffixes=("_x", "_v"))
                fam(m["r"].to_numpy(), [UCO + x for x in m["v_v"]],
                    UCOEX + "hasCPE", [UCOEX + x for x in m["v_x"]],
                    False, ns.IRI)
        # tool turns → Tool nodes (graft addition); \x1f is the dedup
        # key separator, stripped from tool labels. Arrow mask first so
        # only tool-role rows ever cross into Python.
        mask = pc.fill_null(pc.equal(_cc(batch.column("role")), "tool"),
                            False)
        t_idx = np.nonzero(mask.to_numpy(zero_copy_only=False))[0]
        if len(t_idx):
            tl_list = pc.take(_cc(batch.column("tool")),
                              pa.array(t_idx, pa.int64())).to_pylist()
            tool_r, tool_l = [], []
            for i, tl_ in zip(t_idx, tl_list):
                tl_ = (tl_ or "").replace("\x1f", "")
                if tl_:
                    tool_r.append(int(i))
                    tool_l.append(tl_)
            if tool_r:
                tr = np.asarray(tool_r, dtype=np.int64)
                ti = [UCOEX + "tool-" + x for x in tool_l]
                fam(tr, ti, RT, UCOEX + "Tool", False, ns.IRI)
                fam(tr, ti, RL, tool_l, True, ns.XSD_STRING)
        # alias-linked entities → rdf:type triples (graft entity linking;
        # tokenization ≡ string_split(lower(text), ' ') in the oracle)
        if self.alias_best:
            ar, a_tok = self._alias_flat(texts)
            if len(ar):
                pairs = [self.alias_best[t_] for t_ in a_tok]
                fam(ar, [ns.entity_iri(e, ty) for e, ty in pairs], RT,
                    [ns.ENTITY_CLASS_IRI[ty] for _, ty in pairs],
                    False, ns.IRI)
                if self.mark_aliases:
                    # internal marker rows (filtered out of the final
                    # table): record the observed aliases so phase B can
                    # build the union-find input without a second text pass
                    fam(ar, a_tok, ALIAS_MARKER_PRED, "", False, "")

        if not S:
            return pa.Table.from_pydict(
                {"subj": [], "pred": [], "obj": [], "obj_is_literal": [],
                 "obj_datatype": [], "conv_id": [], "turn_idx": []},
                schema=EDGE_SCHEMA)
        raw = pa.Table.from_arrays(
            [pa.concat_arrays(S), pa.concat_arrays(P), pa.concat_arrays(O),
             pa.array(np.concatenate(LIT), pa.bool_()),
             pa.concat_arrays(DT), pa.concat_arrays(C),
             pa.concat_arrays(T)],
            schema=EDGE_SCHEMA,
        )
        if self.keep_witnesses:
            return witness_distinct(raw)
        return witness_dedup(raw)


def witness_distinct(tbl: pa.Table) -> pa.Table:
    """Witness-preserving block combiner: distinct over the FULL row
    (triple + conv_id + turn_idx) — collapses same-turn re-emissions
    (the per-turn ``_uniq`` contract) while keeping one row per
    distinct witness for provenance counting."""
    import polars as pl
    if tbl.num_rows == 0:
        return tbl
    out = pl.from_arrow(tbl).unique(maintain_order=False)
    return out.select(tbl.column_names).to_arrow().cast(EDGE_SCHEMA)


def witness_dedup(tbl: pa.Table) -> pa.Table:
    """Combiner fused into the emitter: collapse duplicate triples
    WITHIN one emitted batch, keeping the lexicographically-smallest
    (conv_id, turn_idx) row as the lineage witness (deterministic under
    any emission order). Every consumer of the edge stream dedups
    globally anyway (A2 exact-dedup semantics,
    reference ``process/ontology_updater.py:58-66``), so this only
    changes how much raw data crosses the object store: hot triples
    (a popular CVE's rdf:type) collapse to one row per batch before
    the extract stage's output block is even sealed — measured ~4×
    fewer rows materialized out of extraction at sf0.1."""
    import polars as pl
    if tbl.num_rows == 0:
        return tbl
    key = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]
    # sort by witness then hash-unique keep=first ≡ per-key min
    # (conv_id, turn_idx); 1.8× over group_by + two sort_by aggs
    out = (pl.from_arrow(tbl)
           .sort(["conv_id", "turn_idx"])
           .unique(subset=key, keep="first", maintain_order=False))
    return out.select(tbl.column_names).to_arrow().cast(EDGE_SCHEMA)


# ---------------------------------------------------------------------------
# side-table triples (small, driver-built Arrow tables unioned into the edge
# stream — the reference's CWE/ATT&CK source pipelines, R5/R7/R10/R11)
# ---------------------------------------------------------------------------

class _SideEmitter:
    """Accumulator for driver-built side-table triples (conv_id='' /
    turn_idx=-1 lineage)."""

    def __init__(self):
        self.S, self.P, self.O, self.LIT, self.DT = [], [], [], [], []

    def emit(self, s, p, o, lit, dt):
        self.S.append(s); self.P.append(p); self.O.append(o)
        self.LIT.append(lit); self.DT.append(dt)

    def table(self) -> pa.Table:
        n = len(self.S)
        return pa.Table.from_pydict(
            {"subj": self.S, "pred": self.P, "obj": self.O,
             "obj_is_literal": pa.array(self.LIT, pa.bool_()),
             "obj_datatype": self.DT, "conv_id": [""] * n,
             "turn_idx": pa.array([-1] * n, pa.int32())},
            schema=EDGE_SCHEMA,
        )


def cwe_dict_triples(cwe_dict_path: str) -> pa.Table:
    """CWE dictionary → triples: the full ClassA/ClassB property maps of
    ``mapping/cwe/cwe_rml.ttl`` (R5 observed examples with compound keys
    + DESCRIPTION, R7 ~20 property maps incl. the nested sections the RML
    types xsd:string — serialized as compact JSON in Arrow-struct field
    order so DuckDB ``to_json`` reproduces them byte-for-byte)."""
    tbl = pq.read_table(cwe_dict_path)
    se = _SideEmitter()
    emit = se.emit
    UCO, UCOEX = ns.UCO, ns.UCOEX
    STR = ns.XSD_STRING
    for row in tbl.to_pylist():
        cid = row["id_value"]
        ci = f"{UCO}{cid}"
        # ClassAMap — ExploitTarget node + hasWeakness join (cwe_rml.ttl:46-84)
        ei = f"{UCO}ExploitTarget-{cid}"
        emit(ei, ns.RDF_TYPE, f"{UCO}ExploitTarget", False, ns.IRI)
        emit(ei, f"{UCO}hasWeakness", ci, False, ns.IRI)
        # ClassBMap scalar literals
        emit(ci, ns.RDF_TYPE, f"{UCO}CWE", False, ns.IRI)
        emit(ci, f"{UCO}name", row["name"], True, STR)
        emit(ci, f"{UCO}cweID", cid, True, STR)
        emit(ci, f"{UCO}description", row["description"], True, STR)
        emit(ci, f"{UCO}cweSummary", row["description"], True, STR)  # summary=description (cwe_collection.py:357)
        emit(ci, f"{UCO}abstraction", row["abstraction"], True, STR)
        emit(ci, f"{UCO}structure", row["structure"], True, STR)
        emit(ci, f"{UCO}status", row["status"], True, STR)
        emit(ci, f"{UCO}timeOfIntroduction",
             truncate_long_fraction(row["time_of_introduction"]), True, ns.XSD_DATETIME)
        if row["extended_summary"] is not None:
            emit(ci, f"{UCO}cweExtendedSummary", row["extended_summary"], True, STR)
        if row["likelihood_of_exploit"] is not None:
            emit(ci, f"{UCO}likelihoodOfExploit", row["likelihood_of_exploit"], True, STR)
        # nested sections → compact-JSON xsd:string literals (cwe_rml.ttl:104-278)
        for pred, col in (("commonConsequences", "common_consequences"),
                          ("applicablePlatform", "applicable_platforms"),
                          ("modesOfIntroduction", "modes_of_introduction"),
                          ("detectionMethods", "detection_methods"),
                          ("potentialMitigations", "potential_mitigations"),
                          ("references", "references"),
                          ("mappingNotes", "mapping_notes"),
                          ("relatedAttackPatterns", "related_attack_patterns")):
            j = json_compact(row[col])
            if j is not None:
                emit(ci, f"{UCO}{pred}", j, True, STR)
        if row["demonstrative_examples"] is not None:
            emit(ci, f"{UCO}demonstrativeExamples",
                 row["demonstrative_examples"], True, STR)
        for rw in row["related_weaknesses"] or ():
            emit(ci, f"{UCO}relatedWeakness", f"{UCO}{rw['ID']}", False, ns.IRI)
        for ob in row["observed_examples"] or ():
            oi = f"{UCOEX}{cid}-{ob['Reference']}"  # compound key R5
            emit(oi, ns.RDF_TYPE, f"{UCOEX}ObservedExample", False, ns.IRI)
            emit(oi, f"{UCOEX}DESCRIPTION", ob["Description"], True, STR)
            emit(oi, f"{UCOEX}exampleObservedIn", f"{UCO}{ob['Reference']}", False, ns.IRI)
            emit(ci, f"{UCOEX}hasObservedExample", oi, False, ns.IRI)
        for ap in row["related_attack_patterns"] or ():
            emit(ci, f"{UCOEX}hasRelatedAttackPattern", ns.capec_iri(ap), False, ns.IRI)
    return se.table()


def cve_dict_triples(cve_dict_path: str) -> pa.Table:
    """CVE dictionary → triples: the VULMap/CVEMap property literals of
    ``mapping/cve/cve_rml.ttl:20-145`` over the per-record projection of
    ``cve_collection.py:427-446`` — published/lastModified dateTimes on
    the VULN node, multi-valued summary (one triple per descriptions[]
    value), and the vulnStatus / CVSS / privilege / evaluatorSolution
    literals on the CVE node. Booleans render lexical 'true'/'false'
    typed xsd:string (the RML declares xsd:string for both)."""
    tbl = pq.read_table(cve_dict_path)
    se = _SideEmitter()
    emit = se.emit
    UCO = ns.UCO
    STR = ns.XSD_STRING
    for row in tbl.to_pylist():
        cid = row["cve_id"]
        vi, ci = f"{UCO}VULN-{cid}", f"{UCO}{cid}"
        emit(vi, ns.RDF_TYPE, f"{UCO}Vulnerability", False, ns.IRI)
        emit(vi, f"{UCO}publishedDateTime",
             truncate_long_fraction(row["published"]), True, ns.XSD_DATETIME)
        emit(vi, f"{UCO}lastModifiedDateTime",
             truncate_long_fraction(row["last_modified"]), True, ns.XSD_DATETIME)
        for d in row["descriptions"] or ():
            emit(vi, f"{UCO}summary", d["value"], True, STR)
        emit(vi, f"{UCO}hasCVE_ID", ci, False, ns.IRI)
        emit(ci, ns.RDF_TYPE, f"{UCO}CVE", False, ns.IRI)
        emit(ci, ns.RDFS_LABEL, cid, True, STR)
        emit(ci, f"{UCO}vulnStatus", row["vuln_status"], True, STR)
        emit(ci, f"{UCO}vectorString", row["vector_string"], True, STR)
        emit(ci, f"{UCO}baseSeverity", row["base_severity"], True, STR)
        emit(ci, f"{UCO}exploitabilityScore", row["exploitability_score"], True, STR)
        emit(ci, f"{UCO}impactScore", row["impact_score"], True, STR)
        emit(ci, f"{UCO}obtainAllPrivilege",
             "true" if row["obtain_all_privilege"] else "false", True, STR)
        emit(ci, f"{UCO}userInteractionRequired",
             "true" if row["user_interaction_required"] else "false", True, STR)
        emit(ci, f"{UCO}evaluatorSolution", row["evaluator_solution"], True, STR)
    return se.table()


def capec_dict_triples(capec_dict_path: str) -> pa.Table:
    """CAPEC dictionary → triples: the full attack-pattern map of
    ``mapping/capec/capec_rml.ttl`` over the parsed-record shape of
    ``parse.py:253-432`` — composite ``CAPEC-{ID}: {Name}`` label, the
    §2.8 composite string formatters (execution flow / skills /
    consequences), per-item literals for the multi-valued sections, and
    hasRelatedWeakness / hasTaxonomyMapping IRI joins (targets also get
    their rr:class type triples)."""
    tbl = pq.read_table(capec_dict_path)
    se = _SideEmitter()
    emit = se.emit
    UCO, UCOEX = ns.UCO, ns.UCOEX
    STR = ns.XSD_STRING
    for row in tbl.to_pylist():
        num = row["id_num"]
        pi = ns.capec_iri(f"CAPEC-{num}")
        emit(pi, ns.RDF_TYPE, f"{UCOEX}CAPEC", False, ns.IRI)
        emit(pi, ns.RDFS_LABEL, capec_label(num, row["name"]), True, STR)
        emit(pi, f"{UCOEX}CAPEC_id", num, True, STR)
        emit(pi, f"{UCOEX}CAPEC_name", row["name"], True, STR)
        emit(pi, f"{UCOEX}Abstraction", row["abstraction"], True, STR)
        emit(pi, f"{UCOEX}Likelihood", row["likelihood"], True, STR)
        emit(pi, f"{UCOEX}Severity", row["severity"], True, STR)
        emit(pi, f"{UCOEX}Description", row["description"], True, STR)
        for x in row["extended_description"] or ():
            emit(pi, f"{UCOEX}ExtendedDescription", x, True, STR)
        for x in row["related_attack_patterns"] or ():
            emit(pi, f"{UCOEX}RelatedAttPattern", x, True, STR)
        for x in execution_flow_strings(row["execution_flow"]):
            emit(pi, f"{UCOEX}ExecutionFlowTechnique", x, True, STR)
        for x in row["prerequisites"] or ():
            emit(pi, f"{UCOEX}Prerequisites", x, True, STR)
        for x in skill_strings(row["skills"]):
            emit(pi, f"{UCOEX}Skills_Required", x, True, STR)
        for x in row["resources"] or ():
            emit(pi, f"{UCOEX}Resources_Required", x, True, STR)
        for x in row["mitigations"] or ():
            emit(pi, f"{UCOEX}Mitigations", x, True, STR)
        for x in row["examples"] or ():
            emit(pi, f"{UCOEX}Example", x, True, STR)
        for x in consequence_strings(row["consequences"]):
            emit(pi, f"{UCOEX}Consequences", x, True, STR)
        for w in row["related_weaknesses"] or ():
            emit(pi, f"{UCOEX}RelatedWeaknesses", w, True, STR)
            emit(pi, f"{UCOEX}hasRelatedWeakness", f"{UCO}{w}", False, ns.IRI)
            emit(f"{UCO}{w}", ns.RDF_TYPE, f"{UCO}CWE", False, ns.IRI)  # rr:class
        for t in row["taxonomy_mappings"] or ():
            emit(pi, f"{UCOEX}TaxonomyMappingATTACK", t, True, STR)
            emit(pi, f"{UCOEX}hasTaxonomyMapping", f"{UCOEX}{t}", False, ns.IRI)
            emit(f"{UCOEX}{t}", ns.RDF_TYPE, f"{UCOEX}MITREATTACK", False, ns.IRI)
    return se.table()


def d3fend_dict_triples(d3fend_dict_path: str) -> pa.Table:
    """D3FEND dictionary → triples: ``mapping/d3fend/d3fend_rml.ttl:20-57``
    — ID/LABEL/DEFINITION literals plus the offensive-technique link
    (skipped when the record has none)."""
    tbl = pq.read_table(d3fend_dict_path)
    se = _SideEmitter()
    emit = se.emit
    UCOEX = ns.UCOEX
    STR = ns.XSD_STRING
    for row in tbl.to_pylist():
        di = f"{UCOEX}{row['id']}"
        emit(di, ns.RDF_TYPE, f"{UCOEX}MITRED3FEND", False, ns.IRI)
        emit(di, f"{UCOEX}MITRED3FEND_ID", row["id"], True, STR)
        emit(di, f"{UCOEX}MITRED3FEND_LABEL", row["label"], True, STR)
        emit(di, f"{UCOEX}MITRED3FEND_DEFINITION", row["definition"], True, STR)
        if row["off_tech_id"] is not None:
            ai = f"{UCOEX}{row['off_tech_id']}"
            emit(di, f"{UCOEX}hasMITREATTACK", ai, False, ns.IRI)
            emit(ai, ns.RDF_TYPE, f"{UCOEX}MITREATTACK", False, ns.IRI)  # rr:class
    return se.table()


def attack_rel_rows(nodes_tbl: pa.Table, rels_tbl: pa.Table
                    ) -> list[tuple[str, str, str]]:
    """R11 referential relationship join, shared by the side-table triple
    builder and the kg_attack_rel query: (source_id, pred, target_id)
    rows where source_id is non-null AND the target exists as a node of
    the target type (mapping/attack/attack_rml.ttl:253-403; null-source
    drop per parse.py:231-234)."""
    node_key = set(zip(nodes_tbl.column("ID").to_pylist(),
                       nodes_tbl.column("kind").to_pylist()))
    out = []
    for row in rels_tbl.to_pylist():
        if row["source_id"] is None:
            continue
        if (row["target_id"], row["target_type"]) not in node_key:
            continue
        pred = ns.ATTACK_REL_PRED.get((row["source_type"], row["target_type"]))
        if pred is None:
            continue
        out.append((row["source_id"], pred, row["target_id"]))
    return out


def attack_triples(nodes_path: str, rels_path: str) -> pa.Table:
    """ATT&CK node maps (R10: NAME/DESCRIPTION/URL/DOMAIN,
    mapping/attack/attack_rml.ttl:30-58) + the seven referential
    relationship joins (R11: edge emitted only when source_id is non-null
    AND the target id exists as a node of the target type —
    mapping/attack/attack_rml.ttl:253-403)."""
    nodes = pq.read_table(nodes_path)
    rels = pq.read_table(rels_path)
    se = _SideEmitter()
    emit = se.emit
    UCOEX = ns.UCOEX
    for row in nodes.to_pylist():
        ni = f"{UCOEX}{row['ID']}"
        emit(ni, ns.RDF_TYPE, ns.ATTACK_KIND_CLASS[row["kind"]], False, ns.IRI)
        emit(ni, f"{UCOEX}NAME", row["name"], True, ns.XSD_STRING)
        emit(ni, f"{UCOEX}DESCRIPTION", row["description"], True, ns.XSD_STRING)
        emit(ni, f"{UCOEX}URL", row["url"], True, ns.XSD_STRING)
        emit(ni, f"{UCOEX}DOMAIN", row["domain"], True, ns.XSD_STRING)
    for src, pred, tgt in attack_rel_rows(nodes, rels):
        emit(f"{UCOEX}{src}", pred, f"{UCOEX}{tgt}", False, ns.IRI)
    return se.table()
