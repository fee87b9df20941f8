"""Deduplication operators over document tables — the training-data-
pipeline side of the engine (beyond the reference's exact-IRI dedup A2).

All operators are Dataset-native:

- ``exact_dedup``      — md5(text) hash groupby, keep min doc_id
                         (hash-partition + per-group first).
- ``fingerprints``     — normalized-text rolling fingerprint (md5 of
                         lowercased, punctuation-stripped text).
- ``token_jaccard_pairs`` — exact word-set Jaccard near-dup pairs within
                         a blocking column (all-pairs via inverted-index
                         groupby; integer-arithmetic threshold so the
                         DuckDB oracle matches bit-for-bit).
- ``minhash_lsh_pairs``  — MinHash + banded LSH over word shingles with
                         exact-Jaccard verification of candidates: the
                         scale path (candidates ∝ true near-dups, not
                         all pairs).
- ``simhash_pairs``      — 64-bit SimHash + 4×16-bit band blocking,
                         Hamming ≤ 3 verification (pigeonhole: 4 bands
                         guarantee recall at radius 3).
- ``embedding_neardup_pairs`` — cosine ≥ τ pairs over an embedding
                         column (see stages/similarity.py for top-k).

Deterministic hashing only — md5-derived 64-bit hashes (``_stable64``
== DuckDB ``md5_number_upper``) so every operator here is exactly
SQL-reproducible; never Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Min

_NORM_RX = re.compile(r"[^a-z0-9 ]")
_SPACE_RX = re.compile(r" +")


def _md5_col(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def exact_dedup(docs: Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> Dataset:
    """(text_hash, doc_id=min id with that text). Block-local min is the
    combiner; the global groupby moves ≤ one row per distinct hash per
    block. ≡ SQL: SELECT md5(text) text_hash, min(doc_id) doc_id ... GROUP BY 1."""
    def hash_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "text_hash": _md5_col(batch.column(text_col).to_pylist()),
            id_col: batch.column(id_col).to_pylist(),
        })
        part = df.groupby("text_hash", sort=False)[id_col].min().reset_index()
        return pa.Table.from_pydict({
            "text_hash": part["text_hash"].tolist(),
            id_col: pa.array(part[id_col].tolist(), pa.int64()),
        })
    return (docs.map_batches(hash_partial, batch_format="pyarrow", batch_size=None)
            .groupby("text_hash").aggregate(Min(id_col, alias_name=id_col)))


def normalize_text(t: str) -> str:
    """Fingerprint canonicalization: lowercase, STRIP everything
    outside [a-z0-9 ], collapse/trim spaces. Deliberately lossier than
    ``stages.text.normalize_text`` (the user-facing Unicode NFC
    normalizer, which strips NOTHING) — the dedup_* / curation /
    delta-dedup SQL oracles pin THIS exact form; do not unify them."""
    return _SPACE_RX.sub(" ", _NORM_RX.sub("", t.lower())).strip()


def fingerprints(docs: Dataset, text_col: str = "text",
                 id_col: str = "doc_id") -> Dataset:
    """(doc_id, fingerprint) — md5 of normalized text. ≡ SQL
    md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]','','g'),' +',' ','g')))."""
    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        return pa.Table.from_pydict({
            id_col: batch.column(id_col).cast(pa.int64()),
            "fingerprint": [hashlib.md5(normalize_text(t).encode()).hexdigest()
                            for t in texts],
        })
    return docs.map_batches(fp, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact token-set Jaccard (inverted index; blocked)
# ---------------------------------------------------------------------------

def token_jaccard_pairs(docs: Dataset, *, block_col: str = "source",
                        num: int = 2, den: int = 3) -> Dataset:
    """Near-dup pairs (doc_a < doc_b, same block) with word-set Jaccard
    ≥ num/den, reported as integer (inter, uni) so no float compare.

    Distributed shape: one groupby shuffle on the blocking column, then
    a fully vectorized all-pairs intersection per block (binary
    doc×vocab matrix, M·Mᵀ). The blocking column bounds the quadratic
    term (same-word different-block docs never pair) — at corpus scale,
    use minhash_lsh_pairs instead; this operator is the exact,
    oracle-checked variant.
    """
    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        # one binary doc×vocab matrix per block; intersections = M·Mᵀ
        ids = group["doc_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        sets = [set(t.split(" ")) for t in group["text"].to_numpy()[order]]
        vocab = {}
        for s in sets:
            for w in s:
                vocab.setdefault(w, len(vocab))
        # int32 halves the doc×vocab matrix footprint vs int64; counts
        # (≤ vocab size per block) can't overflow it
        M = np.zeros((len(ids), len(vocab)), dtype=np.int32)
        for i, s in enumerate(sets):
            for w in s:
                M[i, vocab[w]] = 1
        inter = M @ M.T
        sizes = M.sum(axis=1)
        iu, ju = np.triu_indices(len(ids), k=1)
        it = inter[iu, ju].astype(np.int64)
        uni = (sizes[iu] + sizes[ju]).astype(np.int64) - it
        keep = den * it >= num * uni
        return pd.DataFrame({
            "doc_a": ids[iu][keep], "doc_b": ids[ju][keep],
            "inter": it[keep], "uni": uni[keep]})

    return (docs.select_columns(["doc_id", block_col, "text"])
            .groupby(block_col)
            .map_groups(lambda g: per_block(g.drop(columns=[block_col])),
                        batch_format="pandas"))



def containment_pairs(docs: Dataset, *, block_col: str = "source",
                      num: int = 9, den: int = 10) -> Dataset:
    """Asymmetric word-set CONTAINMENT near-dup pairs (doc_a < doc_b,
    same block): |A ∩ B| / min(|A|, |B|) ≥ num/den — the subset/superset
    detector Jaccard misses (a short doc pasted into a longer one keeps
    containment ≈ 1 while Jaccard collapses with the length ratio;
    Broder's resemblance-vs-containment distinction). Integer-threshold
    compare, no floats.

    Same distributed shape as ``token_jaccard_pairs`` (one blocking
    shuffle, vectorized M·Mᵀ per block) — the exact, oracle-checked
    variant; at corpus scale hand the candidate generation to
    ``minhash_lsh_pairs`` and verify containment in-task."""
    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        sets = [set(t.split(" ")) for t in group["text"].to_numpy()[order]]
        vocab = {}
        for s in sets:
            for w in s:
                vocab.setdefault(w, len(vocab))
        M = np.zeros((len(ids), len(vocab)), dtype=np.int32)
        for i, s in enumerate(sets):
            for w in s:
                M[i, vocab[w]] = 1
        inter = M @ M.T
        sizes = M.sum(axis=1)
        iu, ju = np.triu_indices(len(ids), k=1)
        it = inter[iu, ju].astype(np.int64)
        mn = np.minimum(sizes[iu], sizes[ju]).astype(np.int64)
        keep = den * it >= num * mn
        return pd.DataFrame({
            "doc_a": ids[iu][keep], "doc_b": ids[ju][keep],
            "inter": it[keep], "min_size": mn[keep]})

    return (docs.select_columns(["doc_id", block_col, "text"])
            .groupby(block_col)
            .map_groups(lambda g: per_block(g.drop(columns=[block_col])),
                        batch_format="pandas"))


def ngram_jaccard_pairs(docs: Dataset, *, n: int = 5,
                        block_col: str = "source",
                        num: int = 7, den: int = 10) -> Dataset:
    """Near-dup pairs (doc_a < doc_b, same block) with character
    ``n``-gram (shingle) set Jaccard ≥ num/den, reported as integer
    (inter, uni) so no float compare. The shingle-set sibling of
    ``token_jaccard_pairs`` — robust to tokenization differences
    (word-set Jaccard misses reordered/concatenated near-dups that
    share character shingles). Docs shorter than ``n`` have an empty
    shingle set and never pair (uni > 0 guard).

    Distributed shape: one groupby shuffle on the blocking column, then
    a vectorized all-pairs intersection per block (binary doc×shingle
    matrix, M·Mᵀ). The blocking column bounds the quadratic term — at
    corpus scale use ``minhash_lsh_pairs``; this is the exact,
    oracle-checked variant.
    """
    def per_block(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["doc_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        sets = [{t[i:i + n] for i in range(len(t) - n + 1)}
                for t in group["text"].to_numpy()[order]]
        vocab: dict[str, int] = {}
        for s in sets:
            for w in s:
                vocab.setdefault(w, len(vocab))
        M = np.zeros((len(ids), len(vocab)), dtype=np.int32)
        for i, s in enumerate(sets):
            for w in s:
                M[i, vocab[w]] = 1
        inter = M @ M.T
        sizes = M.sum(axis=1)
        iu, ju = np.triu_indices(len(ids), k=1)
        it = inter[iu, ju].astype(np.int64)
        uni = (sizes[iu] + sizes[ju]).astype(np.int64) - it
        keep = (den * it >= num * uni) & (uni > 0)
        return pd.DataFrame({
            "doc_a": ids[iu][keep], "doc_b": ids[ju][keep],
            "inter": it[keep], "uni": uni[keep]})

    return (docs.select_columns(["doc_id", block_col, "text"])
            .groupby(block_col)
            .map_groups(lambda g: per_block(g.drop(columns=[block_col])),
                        batch_format="pandas"))


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------

_EMPTY_PAIRS = pa.Table.from_pydict(
    {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})


def pair_doc_ids(pair_ds) -> "np.ndarray":
    """Distinct doc ids referenced by a materialized pair dataset — one
    raw task per block, each returning its block's np.unique; the driver
    unions per-block DISTINCT arrays (O(candidate docs) each), so the
    raw pair stream (O(candidate pairs), with cross-partition dupes when
    the producer skipped its pre-verify distinct) never crosses the
    driver."""
    import ray

    @ray.remote(num_cpus=1)
    def _block_ids(b: pa.Table):
        # groupby can emit schema-less EMPTY blocks — treat them as no ids
        if b.num_rows == 0 or "doc_a" not in b.column_names:
            return np.array([], np.int64)
        return np.unique(np.concatenate([
            b.column("doc_a").to_numpy(zero_copy_only=False),
            b.column("doc_b").to_numpy(zero_copy_only=False)]))

    chunks = ray.get([_block_ids.remote(r)
                      for r in pair_ds.get_internal_block_refs()])
    if not chunks:
        return np.array([], np.int64)
    return np.unique(np.concatenate(chunks)).astype(np.int64)


def distinct_pairs(pair_ds: Dataset, num_partitions: int = 32) -> Dataset:
    """Globally distinct (doc_a, doc_b): hash-partition on the pair key,
    vectorized np.unique per partition. The pair stream never touches
    the driver."""
    def add_q(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        q = ((a * np.uint64(0x9E3779B97F4A7C15) ^ b) % np.uint64(num_partitions))
        return batch.append_column("q", pa.array(q.astype(np.int32), pa.int32()))

    def uniq(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _EMPTY_PAIRS
        a = part.column("doc_a").to_numpy(zero_copy_only=False)
        b = part.column("doc_b").to_numpy(zero_copy_only=False)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.Table.from_pydict({
            "doc_a": pa.array(u[:, 0], pa.int64()),
            "doc_b": pa.array(u[:, 1], pa.int64())})

    return (pair_ds.map_batches(add_q, batch_format="pyarrow", batch_size=None)
            .groupby("q").map_groups(
                lambda t: uniq(t.drop_columns(["q"])), batch_format="pyarrow"))


def _bucketed_pairs(sigs: Dataset, bucket_cols: list[str],
                    num_partitions: int = 32,
                    sig_col: str | None = None,
                    sig_verify=None,
                    distinct: bool = True,
                    canonical_band: tuple[int, int] | None = None) -> Dataset:
    """Candidate (doc_a < doc_b) pairs sharing any bucket, as a Dataset:
    hash-partition on the bucket key, emit pairs with one vectorized
    pandas pass per partition, then a distributed pair-keyed distinct
    (the same pair can surface in two bands → two partitions).

    When ``sig_col``/``sig_verify`` are given, each sig row carries a
    per-doc uint64 value into its bucket partition and
    ``sig_verify(a_vals, b_vals) -> bool mask`` culls candidate pairs
    IN the partition task, before the distinct shuffle — the verify
    needs no second lookup join because every doc in the bucket brought
    its value along. Nothing O(corpus) or O(candidates) ever lands on
    the driver.

    ``distinct=False`` skips the global pair-keyed distinct (pairs found
    by several bands still collapse within a partition) — callers whose
    downstream verify culls candidates by orders of magnitude dedupe
    AFTER verification instead, so the all-to-all distinct moves the
    small verified set, not the candidate flood.

    ``canonical_band=(n_bands, width)`` (sig-path only, for signatures
    whose band values are bit-slices of the carried uint64 — simhash)
    makes the output distinct BY CONSTRUCTION with no exchange at all:
    a verified pair is emitted only in the lowest band where the two
    signatures' band values agree, which is computable locally from the
    carried signatures and identical in every bucket that sees the pair
    — so exactly one bucket, globally, emits it. ``bucket_cols`` must be
    ``[band, band_val]`` with band the leading key; callers combine it
    with ``distinct=False``."""
    import polars as pl

    def add_p(batch: pa.Table) -> pa.Table:
        key = batch.column(bucket_cols[0]).cast(pa.string())
        for c in bucket_cols[1:]:
            key = pa.compute.binary_join_element_wise(
                key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key,
                batch.column(c).cast(pa.string()).combine_chunks(), "\x1f")
        h = pl.from_arrow(key.combine_chunks()
                          if isinstance(key, pa.ChunkedArray) else key).hash(seed=0)
        cols = {
            "bkey": key, "doc_id": batch.column("doc_id").cast(pa.int64()),
            "p": pa.array((h % num_partitions).cast(pl.Int32).to_numpy(),
                          pa.int32())}
        if sig_col is not None:
            cols["_sv"] = batch.column(sig_col).cast(pa.uint64())
        return pa.Table.from_pydict(cols)

    def pairs_in_partition(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        # vectorized singleton cull: most buckets hold one doc and emit
        # nothing — drop them before the per-bucket loop (80k bucket
        # iterations → a handful)
        df = df[df.groupby("bkey", sort=False)["doc_id"]
                .transform("size").ge(2)]
        A, B = [], []
        for bk, g in df.groupby("bkey", sort=False):
            if sig_col is None:
                ids = np.sort(g["doc_id"].unique())
                if len(ids) < 2:
                    continue
                iu, ju = np.triu_indices(len(ids), k=1)
                A.append(ids[iu]); B.append(ids[ju])
            else:
                g2 = g.drop_duplicates("doc_id").sort_values("doc_id")
                ids = g2["doc_id"].to_numpy()
                if len(ids) < 2:
                    continue
                vals = g2["_sv"].to_numpy()
                iu, ju = np.triu_indices(len(ids), k=1)
                keep = sig_verify(vals[iu], vals[ju])
                ka, kb = ids[iu][keep], ids[ju][keep]
                if canonical_band is not None and len(ka):
                    # emit only in the LOWEST band whose band values
                    # agree: both signatures are in hand, so "is this
                    # that band?" is a local bit-slice comparison and
                    # the output needs no distinct exchange at all
                    n_b, width = canonical_band
                    mask = np.uint64((1 << width) - 1)
                    band_here = int(str(bk).split("\x1f", 1)[0])
                    shifts = (np.arange(n_b, dtype=np.uint64)
                              * np.uint64(width))
                    va = vals[iu][keep].astype(np.uint64)
                    vb = vals[ju][keep].astype(np.uint64)
                    agree = (((va[:, None] >> shifts[None, :]) & mask)
                             == ((vb[:, None] >> shifts[None, :]) & mask))
                    sel = agree.argmax(axis=1) == band_here
                    ka, kb = ka[sel], kb[sel]
                A.append(ka); B.append(kb)
        if not A:
            return _EMPTY_PAIRS
        a = np.concatenate(A)
        b = np.concatenate(B)
        # in-partition dedup (a pair found by several bands collapses here)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        a, b = u[:, 0], u[:, 1]
        return pa.Table.from_pydict({
            "doc_a": pa.array(a, pa.int64()),
            "doc_b": pa.array(b, pa.int64())})

    parted = sigs.map_batches(add_p, batch_format="pyarrow", batch_size=None)
    pair_ds = parted.groupby("p").map_groups(
        lambda t: pairs_in_partition(t.drop_columns(["p"])),
        batch_format="pyarrow")
    return distinct_pairs(pair_ds, num_partitions) if distinct else pair_ds

def _copartition_attach(pairs: Dataset, state: Dataset, pair_key: str,
                        out_col: str, val_type: pa.DataType,
                        pair_schema: pa.Schema,
                        num_partitions: int = 32,
                        keep_misses: bool = False) -> Dataset:
    """Attach per-doc state to a pair stream WITHOUT any driver gather:
    pairs (hash-partitioned on ``pair_key``) and state rows (doc_id,
    val — hash-partitioned on doc_id) meet inside the same partition
    task, where a sorted-searchsorted lookup gathers each pair's value.
    By default pairs whose key has no state row are dropped (a doc with
    an empty shingle set never signed, so it can never be a candidate);
    ``keep_misses=True`` keeps them with a null ``out_col`` instead —
    the left-lookup shape canonical-map application uses. This is the
    verification shape for candidate volumes too large to broadcast —
    two such exchanges (doc_a then doc_b) replace the ``ray.put`` of
    the candidate state."""
    import pyarrow.compute as pc

    from uckg_ray.stages.materialize import _add_hash_partition

    pair_cols = list(pair_schema.names)
    out_schema = pa.schema(
        [pair_schema.field(c) for c in pair_cols]
        + [pa.field(out_col, val_type)])
    empty = out_schema.empty_table()

    def prep_pairs(b: pa.Table) -> pa.Table:
        t = b.append_column(out_col, pa.nulls(b.num_rows, val_type))
        t = t.append_column(
            "_side", pa.array(np.zeros(b.num_rows, np.int8), pa.int8()))
        return _add_hash_partition(t, num_partitions, col=pair_key)

    def prep_state(b: pa.Table) -> pa.Table:
        cols = {}
        for c in pair_cols:
            if c == pair_key:
                cols[c] = b.column("doc_id").cast(pa.int64())
            else:
                cols[c] = pa.nulls(b.num_rows,
                                   out_schema.field(c).type)
        cols[out_col] = b.column("val")
        cols["_side"] = pa.array(np.ones(b.num_rows, np.int8), pa.int8())
        return _add_hash_partition(pa.table(cols), num_partitions,
                                   col=pair_key)

    def attach(part: pa.Table) -> pa.Table:
        if part.num_rows == 0 or "_side" not in part.column_names:
            return empty
        st = part.filter(pc.equal(part.column("_side"), 1))
        pr = part.filter(pc.equal(part.column("_side"), 0))
        if pr.num_rows == 0:
            return empty
        if st.num_rows == 0:
            if not keep_misses:
                return empty
            cols = [pr.column(c) for c in pair_cols] \
                + [pa.nulls(pr.num_rows, val_type)]
            return pa.Table.from_arrays(cols, schema=out_schema)
        keys = pr.column(pair_key).to_numpy(zero_copy_only=False)
        sid = st.column(pair_key).to_numpy(zero_copy_only=False)
        order = np.argsort(sid)
        sid = sid[order]
        # precondition: ONE state row per key. searchsorted returns a
        # single value per key, so a duplicate-keyed build side would
        # silently drop join multiplicity instead of fanning out — make
        # a non-unique build side a loud error, not a wrong answer.
        if len(sid) > 1 and np.any(sid[1:] == sid[:-1]):
            raise ValueError(
                "_copartition_attach: duplicate state keys on the build "
                f"side (attaching {out_col!r}); this helper is a unique-"
                "key lookup, not a fan-out join")
        pos = np.searchsorted(sid, keys)
        pos_c = np.clip(pos, 0, len(sid) - 1)
        hit = sid[pos_c] == keys
        val_col = st.column(out_col).combine_chunks() \
            if isinstance(st.column(out_col), pa.ChunkedArray) \
            else st.column(out_col)
        if keep_misses:
            taken = pa.compute.if_else(
                pa.array(hit),
                pa.compute.take(val_col, pa.array(order[pos_c])),
                pa.scalar(None, val_type))
            kept = pr
        else:
            taken = pa.compute.take(val_col, pa.array(order[pos_c[hit]]))
            kept = pr.filter(pa.array(hit))
        cols = [kept.column(c) for c in pair_cols] + [taken]
        return pa.Table.from_arrays(cols, schema=out_schema)

    both = (pairs.map_batches(prep_pairs, batch_format="pyarrow",
                              batch_size=None)
            .union(state.map_batches(prep_state, batch_format="pyarrow",
                                     batch_size=None)))
    return both.groupby("p").map_groups(
        lambda t: attach(t.drop_columns(["p"])), batch_format="pyarrow")


_MERSENNE = (1 << 61) - 1


def _gather_ranges(vals: np.ndarray, starts: np.ndarray,
                   lens: np.ndarray) -> np.ndarray:
    """Flat gather of ``vals[starts[i]:starts[i]+lens[i]]`` for all i,
    concatenated in row order — no Python loop."""
    total = int(lens.sum())
    if total == 0:
        return vals[:0]
    off = np.concatenate([[0], np.cumsum(lens)[:-1]])
    idx = (np.arange(total, dtype=np.int64)
           - np.repeat(off, lens) + np.repeat(starts, lens))
    return vals[idx]


def _pair_intersect_sizes(flat_a: np.ndarray, len_a: np.ndarray,
                          flat_b: np.ndarray, len_b: np.ndarray
                          ) -> np.ndarray:
    """Per-row intersection sizes for two row-concatenated flat buffers
    of UNIQUE-per-row uint64 values: one lexsort over the batch replaces
    a Python loop of per-pair ``np.intersect1d`` calls. A value appears
    at most once per side per row, so the intersection size is the
    count of (row, value) duplicates in the side-concatenation."""
    n = len(len_a)
    rid = np.concatenate([np.repeat(np.arange(n, dtype=np.int64), len_a),
                          np.repeat(np.arange(n, dtype=np.int64), len_b)])
    vals = np.concatenate([flat_a, flat_b])
    order = np.lexsort((vals, rid))
    rid_s, vals_s = rid[order], vals[order]
    dup = (rid_s[1:] == rid_s[:-1]) & (vals_s[1:] == vals_s[:-1])
    return np.bincount(rid_s[1:][dup], minlength=n).astype(np.int64)


def _jaccard_keep(inter: np.ndarray, len_a: np.ndarray,
                  len_b: np.ndarray, tau: float) -> np.ndarray:
    """Vectorized twin of ``inter and inter/(la+lb-inter) >= tau`` —
    same IEEE-double division as the scalar form, so threshold rounding
    is bit-identical."""
    denom = len_a + len_b - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = inter / denom
    return (inter > 0) & (jac >= tau)


def _stable64(s: str) -> int:
    """64-bit stable hash == DuckDB ``md5_number_upper(s)`` (first 8 md5
    digest bytes, little-endian) — the same identity doc_winnow relies
    on, so simhash/minhash signatures are exactly SQL-reproducible."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _shingle_hash_index(texts: list[str], w: int,
                        cache: dict[str, int] | None = None
                        ) -> tuple[np.ndarray, list[np.ndarray]]:
    """(hv, doc_idx): hv = uint64 ``_stable64`` hashes of the batch's
    DISTINCT w-word shingles, doc_idx[i] = indices into hv of doc i's
    distinct shingles. The md5 runs once per DISTINCT shingle across the
    whole batch (shingles repeat heavily across near-dup docs), and
    ``cache`` — an actor-held dict, capped — carries hashes across
    batches; the per-(doc, shingle) md5 loop was the remaining Python
    inner loop on the minhash hot path. Bit-identical to hashing per
    doc: the signature min and the Jaccard intersection are both
    functions of the hash VALUES only."""
    uniq: dict[str, int] = {}
    doc_idx: list[np.ndarray] = []
    for t in texts:
        toks = t.split(" ")
        if len(toks) < w:
            sh = {" ".join(toks)} if toks != [""] else set()
        else:
            sh = {" ".join(toks[j:j + w]) for j in range(len(toks) - w + 1)}
        doc_idx.append(np.fromiter((uniq.setdefault(s, len(uniq))
                                    for s in sh), np.int64, len(sh)))
    return _hash_distinct(uniq, cache), doc_idx


def _hash_distinct(uniq: dict[str, int], cache: dict[str, int] | None
                   ) -> np.ndarray:
    """md5-64 each DISTINCT string once; ``cache`` (an actor-held dict,
    capped) carries hashes across batches."""
    hv = np.empty(len(uniq), np.uint64)
    if cache is None:
        for s, j in uniq.items():
            hv[j] = _stable64(s)
    else:
        for s, j in uniq.items():
            h = cache.get(s)
            if h is None:
                h = _stable64(s)
                if len(cache) < 4_000_000:   # bound actor heap growth
                    cache[s] = h
            hv[j] = h
    return hv


def _char_gram_hash_index(texts: list[str], k: int,
                          cache: dict[str, int] | None = None
                          ) -> tuple[np.ndarray, list[np.ndarray]]:
    """Ordered char-k-gram hash sequences: hv = uint64 ``_stable64``
    hashes of the batch's DISTINCT grams, doc_idx[i] = POSITION-ORDERED
    indices into hv for doc i's full gram sequence (duplicates kept —
    rolling-window consumers like winnowing need the sequence, unlike
    the set-semantics shingle index above). A doc shorter than k
    contributes one gram (the whole text). Bit-identical to hashing
    per (doc, position): the window minima are functions of the hash
    VALUES only."""
    uniq: dict[str, int] = {}
    doc_idx: list[np.ndarray] = []
    for t in texts:
        t = t or ""
        grams = ([t[j:j + k] for j in range(len(t) - k + 1)]
                 if len(t) >= k else [t])
        doc_idx.append(np.fromiter((uniq.setdefault(g, len(uniq))
                                    for g in grams), np.int64, len(grams)))
    return _hash_distinct(uniq, cache), doc_idx


def _shingle_hash_arrays(texts: list[str], w: int,
                         cache: dict[str, int] | None = None
                         ) -> list[np.ndarray]:
    """Per text: the SORTED uint64 shingle-hash array (the layout the
    Jaccard verifies consume with assume_unique intersect1d)."""
    hv, doc_idx = _shingle_hash_index(texts, w, cache)
    return [np.sort(hv[idx]) if len(idx) else np.array([], np.uint64)
            for idx in doc_idx]


class MinHasher:
    """Per-actor state: permutation coefficients (seeded, deterministic).
    n_perm minhashes over w-word shingles, banded for LSH."""

    def __init__(self, n_perm: int = 64, n_bands: int = 16, shingle_w: int = 3,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        # odd multipliers for multiply-add hashing in uint64 space
        # (wraparound IS the modulus — fully vectorized, no bigints)
        self.a = (rng.integers(1, 2**62, size=n_perm, dtype=np.uint64)
                  .astype(np.uint64) | np.uint64(1))
        self.b = rng.integers(0, 2**62, size=n_perm, dtype=np.uint64)
        self.n_perm, self.n_bands = n_perm, n_bands
        self.rows_per_band = n_perm // n_bands
        self.shingle_w = shingle_w
        self._hcache: dict[str, int] = {}   # shingle → md5-64, per actor

    def shingles(self, text: str) -> set[str]:
        toks = text.split(" ")
        w = self.shingle_w
        if len(toks) < w:
            return {" ".join(toks)} if toks != [""] else set()
        return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}

    def _sig_from_hashes(self, hv: np.ndarray) -> np.ndarray:
        """Permutation mins from shingle hashes — the ONE kernel both
        ``signature`` and the batched ``__call__`` route through, so
        the two paths can't drift."""
        with np.errstate(over="ignore"):
            return (self.a[:, None] * hv[None, :]
                    + self.b[:, None]).min(axis=1)

    def signature(self, sh: set[str]) -> np.ndarray | None:
        if not sh:
            return None
        hv = np.fromiter((_stable64(s) for s in sh), dtype=np.uint64,
                         count=len(sh))
        return self._sig_from_hashes(hv)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        # one md5 per DISTINCT shingle in the batch (+ actor-level cache)
        # instead of one per (doc, shingle) — the signature min only sees
        # hash values, so the output is bit-identical
        hv, doc_idx = _shingle_hash_index(texts, self.shingle_w,
                                          self._hcache)
        D, BAND, H = [], [], []
        for i, idx in zip(ids, doc_idx):
            if len(idx) == 0:
                continue
            # per-doc multiply: a batch-wide gather+reduceat variant
            # measured SLOWER on this DRAM-bound box (one big buffer of
            # memory traffic vs small cache-resident per-doc ops)
            sig = self._sig_from_hashes(hv[idx])
            for band in range(self.n_bands):
                chunk = sig[band * self.rows_per_band:
                            (band + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(),
                                    digest_size=8).hexdigest()
                D.append(i); BAND.append(band); H.append(h)
        return pa.Table.from_pydict({
            "doc_id": pa.array(D, pa.int64()),
            "band": pa.array(BAND, pa.int32()), "band_hash": H})


def minhash_lsh_pairs(docs: Dataset, *, tau: float = 0.5, n_perm: int = 64,
                      n_bands: int = 16, shingle_w: int = 3,
                      concurrency=(1, 8), batch_size: int = 2048,
                      broadcast_max_candidates: int = 20_000_000) -> Dataset:
    """Candidate generation: shingle → minhash → band-bucket groupby;
    verification: exact shingle Jaccard ≥ tau over the candidate pairs.

    Fully distributed shape — the corpus text is consumed only inside
    Ray tasks, never streamed through the driver:

    1. candidate pairs = banded-LSH bucket pairs (``_bucketed_pairs``
       returns a Dataset);
    2. verification state is each candidate doc's shingle set hashed to
       sorted uint64 arrays (8 B/shingle; exact Jaccard modulo 2⁻⁶⁴ hash
       collisions — the same md5-64 space the minhash permutations
       consume), delivered one of two ways, switched on the candidate
       pair count:
       - ``≤ broadcast_max_candidates``: the candidate doc ids (bounded
         by candidate volume, not corpus size) broadcast via ``ray.put``;
         a second pass over ``docs`` filters to those ids INSIDE each
         task, and the driver assembles + re-broadcasts the O(candidate
         docs) shingle arrays for a vectorized verify ``map_batches``;
       - above it (a loose tau at corpus scale makes the candidate set
         itself huge): NO driver state at all — the shingle table for
         all docs co-partitions with the pair stream on doc_a then
         doc_b (``_copartition_attach`` ×2, the pair ⨝ shingles shuffle
         join), and the verify runs on the attached columns.
    3. the post-verify distinct collapses duplicate candidates (same
       pair surfacing from two bands in different partitions), moving
       only the verified survivors."""
    import ray
    import ray.data

    sigs = docs.map_batches(
        MinHasher, fn_constructor_kwargs=dict(
            n_perm=n_perm, n_bands=n_bands, shingle_w=shingle_w),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)

    # hash-partition on band_hash, then ONE vectorized pair-emission pass
    # per partition (not one Python call per bucket — 80k tiny buckets
    # made the per-bucket map_groups the bottleneck). No pre-verify
    # distinct: the exact-Jaccard verify culls candidates first and the
    # global pair dedup runs on the verified survivors (distinct_pairs
    # at the end).
    cand = _bucketed_pairs(sigs, ["band", "band_hash"],
                           distinct=False).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    w = shingle_w

    if n_cand > broadcast_max_candidates:
        return _minhash_verify_join(docs, cand, tau=tau, w=w)

    # candidate-doc id set: per-block raw tasks return block-distinct
    # ids; the driver sees O(candidate docs) per block, never the pair
    # stream
    need = pair_doc_ids(cand)
    need_ref = ray.put(need)

    def cand_shingle_hashes(batch: pa.Table) -> pa.Table:
        # task-side filter to candidate docs; shingle → md5-64 hash,
        # sorted unique uint64 array per doc
        need_arr = ray.get(need_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.isin(ids, need_arr)
        texts = pa.compute.array_filter(
            batch.column("text").combine_chunks()
            if isinstance(batch.column("text"), pa.ChunkedArray)
            else batch.column("text"), pa.array(keep)).to_pylist()
        out_sh = _shingle_hash_arrays(texts, w)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "sh": pa.array([x.tolist() for x in out_sh],
                           pa.list_(pa.uint64()))})

    small = docs.map_batches(cand_shingle_hashes, batch_format="pyarrow")
    # O(candidate docs) — flat values + offsets, broadcast once
    id_chunks, val_chunks, len_chunks = [], [], []
    for b in small.iter_batches(batch_format="pyarrow", batch_size=None):
        col = b.column("sh")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        id_chunks.append(b.column("doc_id").to_numpy(zero_copy_only=False))
        off = col.offsets.to_numpy(zero_copy_only=False)
        # offsets need not start at 0 on a sliced array — re-base the
        # values slice so cumsum(lens) below aligns with what we append
        val_chunks.append(
            col.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]])
        len_chunks.append(np.diff(off))
    if not id_chunks:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    sh_ids = np.concatenate(id_chunks)
    lens = np.concatenate(len_chunks)
    order = np.argsort(sh_ids)
    starts_all = np.concatenate([np.array([0]), np.cumsum(lens)])[:-1]
    # reorder flat storage by doc id for searchsorted lookup
    vals_flat = np.concatenate(val_chunks) if val_chunks else np.array([], np.uint64)
    sh_ids_s = sh_ids[order]
    starts_s = starts_all[order]
    lens_s = lens[order]
    ids_ref = ray.put(sh_ids_s)
    vals_ref = ray.put(vals_flat)
    starts_ref = ray.put(starts_s)
    lens_ref = ray.put(lens_s)

    def verify_pairs(batch: pa.Table) -> pa.Table:
        ids_s = ray.get(ids_ref)
        vals = ray.get(vals_ref)
        starts = ray.get(starts_ref)
        ln = ray.get(lens_ref)
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        ia = np.searchsorted(ids_s, a)
        ib = np.searchsorted(ids_s, b)
        la, lb = ln[ia], ln[ib]
        flat_a = _gather_ranges(vals, starts[ia], la)
        flat_b = _gather_ranges(vals, starts[ib], lb)
        inter = _pair_intersect_sizes(flat_a, la, flat_b, lb)
        keep = _jaccard_keep(inter, la, lb, tau)
        return pa.Table.from_pydict({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64())})

    # set-semantics output; duplicate candidates (same pair from two
    # bands in different partitions) collapse in the post-verify
    # distinct, which moves only the verified survivors. Row order is
    # not part of the contract — no cosmetic global sort.
    return distinct_pairs(cand.map_batches(verify_pairs,
                                           batch_format="pyarrow"))


def _minhash_verify_join(docs: Dataset, cand: Dataset, *, tau: float,
                         w: int, num_partitions: int = 32) -> Dataset:
    """Shuffle-join verification for candidate volumes too large to
    broadcast: the full shingle-hash table co-partitions with the pair
    stream on doc_a then doc_b (``_copartition_attach`` ×2), and the
    exact-Jaccard verify reads the two attached list columns — nothing
    O(candidates) or O(corpus) ever lands on the driver. Output is
    identical to the broadcast path (same hashes, same float-division
    threshold, same post-verify distinct)."""

    def shingle_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sh = _shingle_hash_arrays(texts, w)
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            "val": pa.array([x.tolist() for x in sh],
                            pa.list_(pa.uint64()))})

    # materialize: the state dataset feeds BOTH attach exchanges — an
    # unmaterialized plan would re-run the full-corpus shingle hashing
    # once per attach (Ray Data plans are trees, not DAGs)
    state = docs.map_batches(shingle_rows,
                             batch_format="pyarrow").materialize()
    lt = pa.list_(pa.uint64())
    schema1 = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    a1 = _copartition_attach(cand, state, "doc_a", "sh_a", lt, schema1,
                             num_partitions)
    schema2 = schema1.append(pa.field("sh_a", lt))
    a2 = _copartition_attach(a1, state, "doc_b", "sh_b", lt, schema2,
                             num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        la = batch.column("sh_a").combine_chunks() \
            if isinstance(batch.column("sh_a"), pa.ChunkedArray) \
            else batch.column("sh_a")
        lb = batch.column("sh_b").combine_chunks() \
            if isinstance(batch.column("sh_b"), pa.ChunkedArray) \
            else batch.column("sh_b")
        va = la.values.to_numpy(zero_copy_only=False)
        oa = la.offsets.to_numpy(zero_copy_only=False)
        vb = lb.values.to_numpy(zero_copy_only=False)
        ob = lb.offsets.to_numpy(zero_copy_only=False)
        # offsets need not start at 0 on a sliced array — re-base
        len_a, len_b = np.diff(oa), np.diff(ob)
        flat_a = va[oa[0]:oa[-1]]
        flat_b = vb[ob[0]:ob[-1]]
        inter = _pair_intersect_sizes(flat_a, len_a, flat_b, len_b)
        keep = _jaccard_keep(inter, len_a, len_b, tau)
        return pa.Table.from_pydict({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64())})

    return distinct_pairs(a2.map_batches(verify, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over the DISTINCT token set: bit k of the signature
    is set iff more than half the tokens have bit k set in their
    ``_stable64`` (== DuckDB md5_number_upper) hash. Exactly mirrored by
    the dedup_simhash SQL oracle."""
    toks = list(set(tokens))
    if not toks:
        return 0
    hv = np.fromiter((_stable64(w) for w in toks), dtype=np.uint64,
                     count=len(toks))
    bits = (hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = bits.astype(np.int32).sum(axis=0) * 2 - len(toks)
    out = 0
    for k in np.nonzero(acc > 0)[0]:
        out |= 1 << int(k)
    return out


def simhash_signatures(docs: Dataset) -> Dataset:
    def sh(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        sigs = [simhash64(t.split(" ")) for t in texts]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array(sigs, pa.uint64())})
    return docs.map_batches(sh, batch_format="pyarrow")


def neardup_canonical_docs(docs: Dataset, pairs: Dataset, *,
                           id_col: str = "doc_id",
                           salt: int = 4,
                           broadcast_max: int = 5_000_000,
                           num_partitions: int = 32) -> Dataset:
    """Near-dup CLUSTER canonicalization — what a training-data pipeline
    actually runs pair detection for: every document mapped to the min
    doc_id of its duplicate cluster (``canonical_id``) with an
    ``is_dup`` flag, so `WHERE NOT is_dup` keeps exactly one
    representative per cluster.

    Composition: the candidate pair stream (any of the pair operators —
    minhash/simhash/embedding) feeds the distributed min-label
    connected-components (stages/canonicalize.py, hub-salted), then the
    component map — bounded by the number of DUPLICATE docs, not the
    corpus — applies to ``docs``. Doc ids ride as zero-padded strings
    through the generic string CC and convert back, preserving numeric
    min order.

    Map application has two shapes, switched on the map's row count:
    at or below ``broadcast_max`` the sorted map broadcasts once
    (``ray.put``) into a stateless searchsorted lookup over ``docs``;
    above it (a high dup rate × a huge corpus — e.g. 30% of 10⁹ docs —
    would otherwise put a 3×10⁸-row list on the driver) docs and map
    co-partition by id hash and the same searchsorted assignment runs
    inside each partition task, so the driver never holds the map."""
    import ray

    from uckg_ray.stages.canonicalize import connected_components

    def pad(col: pa.ChunkedArray | pa.Array) -> list[str]:
        return ["%020d" % v for v in
                col.to_numpy(zero_copy_only=False)]

    prefixed = pairs.map_batches(
        lambda b: pa.table({"src": pad(b.column("doc_a")),
                            "dst": pad(b.column("doc_b"))}),
        batch_format="pyarrow")
    has_pairs = prefixed.materialize()
    n_pairs = has_pairs.count()
    cc = None
    if n_pairs > 0:
        cc = connected_components(has_pairs, "src", "dst",
                                  salt=salt).materialize()
    if cc is not None and cc.count() > broadcast_max:
        return _assign_canonical_join(docs, cc, id_col, num_partitions)

    nodes = np.array([], np.int64)
    labels = np.array([], np.int64)
    if cc is not None:
        # component map is O(duplicate docs) — the documented small side
        rows = cc.take_all()
        nodes = np.array([int(r["node"]) for r in rows], np.int64)
        labels = np.array([int(r["label"]) for r in rows], np.int64)
        order = np.argsort(nodes)
        nodes, labels = nodes[order], labels[order]
    map_ref = ray.put((nodes, labels))

    def assign(batch: pa.Table) -> pa.Table:
        # vectorized lookup: searchsorted into the broadcast sorted node
        # array (no per-row Python dict probes over the corpus)
        nd, lb = ray.get(map_ref)
        ids = batch.column(id_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        canon = ids.copy()
        if len(nd):
            pos = np.searchsorted(nd, ids)
            pos_c = np.clip(pos, 0, len(nd) - 1)
            hit = nd[pos_c] == ids
            canon[hit] = lb[pos_c[hit]]
        return pa.Table.from_pydict({
            id_col: pa.array(ids, pa.int64()),
            "canonical_id": pa.array(canon, pa.int64()),
            "is_dup": pa.array(canon != ids, pa.bool_()),
        })

    return docs.select_columns([id_col]).map_batches(
        assign, batch_format="pyarrow")


def _assign_canonical_join(docs: Dataset, cc: Dataset, id_col: str,
                           num_partitions: int) -> Dataset:
    """Component-map application WITHOUT a driver gather: one
    ``_copartition_attach(keep_misses=True)`` left-lookup of the
    (node → label) map against the doc-id stream, then a stateless
    coalesce. Output is bit-identical to the broadcast path (one row
    per doc; canonical_id = own id when unmapped)."""
    import pyarrow.compute as pc

    def prep_map(b: pa.Table) -> pa.Table:
        # zero-padded CC strings cast vectorized; never a Python loop
        return pa.table({
            "doc_id": pc.cast(b.column("node"), pa.int64()),
            "val": pc.cast(b.column("label"), pa.int64())})

    ids = docs.select_columns([id_col]).map_batches(
        lambda b: pa.table({id_col: b.column(id_col).cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    state = cc.map_batches(prep_map, batch_format="pyarrow",
                           batch_size=None)
    attached = _copartition_attach(
        ids, state, id_col, "label", pa.int64(),
        pa.schema([(id_col, pa.int64())]), num_partitions,
        keep_misses=True)

    _EMPTY = pa.Table.from_pydict({
        id_col: pa.array([], pa.int64()),
        "canonical_id": pa.array([], pa.int64()),
        "is_dup": pa.array([], pa.bool_())})

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY
        canon = pc.coalesce(b.column("label"), b.column(id_col))
        return pa.Table.from_pydict({
            id_col: b.column(id_col),
            "canonical_id": canon,
            "is_dup": pc.not_equal(canon, b.column(id_col))})

    return attached.map_batches(finish, batch_format="pyarrow",
                                batch_size=None)


def simhash_pairs(docs: Dataset, *, max_hamming: int = 3,
                  num_partitions: int = 32) -> Dataset:
    """Hamming ≤ k near-dup pairs via (k+1)-band exact-match blocking over
    the 64-bit simhash (pigeonhole guarantees full recall). Each banded
    row carries the doc's FULL 64-bit signature into its bucket
    partition, so the Hamming popcount verify runs vectorized inside the
    same partition task that emits the candidates — only TRUE pairs ever
    reach the distinct shuffle (the earlier shape shipped every
    unverified candidate through two more signature-lookup shuffles; at
    sf0.1 that was 1.96M candidate rows × 3 exchanges for 166k real
    pairs). No broadcast, no driver gather. Exactly reproduced by the
    dedup_simhash SQL oracle (md5_number_upper token hashing)."""
    n_bands = max_hamming + 1
    width = 64 // n_bands

    def bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = (batch.column("simhash").to_numpy(zero_copy_only=False)
             .astype(np.uint64))
        shifts = np.arange(n_bands, dtype=np.uint64) * np.uint64(width)
        bv = ((s[:, None] >> shifts[None, :])
              & np.uint64((1 << width) - 1)).reshape(-1)
        return pa.Table.from_pydict({
            "doc_id": pa.array(np.repeat(ids, n_bands), pa.int64()),
            "simhash": pa.array(np.repeat(s, n_bands), pa.uint64()),
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32),
                                     len(ids)), pa.int32()),
            "band_val": pa.array(bv, pa.uint64())})

    def ham_ok(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(sa.astype(np.uint64) ^ sb.astype(np.uint64))
        return (np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
                .sum(axis=1) <= max_hamming)

    banded = simhash_signatures(docs).map_batches(
        bands, batch_format="pyarrow", batch_size=None)
    # set-semantics output, globally distinct BY CONSTRUCTION: the
    # canonical-band rule (emit only in the lowest band whose values
    # agree — computable locally from the carried signatures) removes
    # the post-verify all-to-all distinct entirely. Row order is not
    # part of the contract — no cosmetic global sort.
    return _bucketed_pairs(banded, ["band", "band_val"], num_partitions,
                           sig_col="simhash", sig_verify=ham_ok,
                           distinct=False,
                           canonical_band=(n_bands, width))


def kmv_distinct_estimate(docs: Dataset, *, group_col: str = "source",
                          text_col: str = "text", k: int = 32) -> Dataset:
    """KMV (k-minimum-values) distinct-count sketch per group: the
    number of distinct `text_col` values estimated from the k smallest
    distinct 64-bit hashes — est = floor((k-1) · 2⁶⁴ / h_k). O(k) state
    per group regardless of corpus size, the streaming alternative to
    an exact COUNT(DISTINCT) shuffle.

    Deterministic end-to-end: hashes are ``_stable64`` (== DuckDB
    ``md5_number_upper``) and the estimate is one IEEE-double multiply/
    divide/floor mirrored exactly by the SQL oracle — so unlike a
    seeded-random sketch this one is value-hash checkable. Block-local
    distinct + partial k-smallest per group is the combiner (any global
    top-k hash is necessarily inside its own block's top-k); the
    per-group merge sees ≤ k rows per group per block. Groups with
    fewer than k distinct values report their exact count."""
    import pandas as pd

    _2_64 = 18446744073709551616.0

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        h = np.fromiter((_stable64(t) for t in texts), dtype=np.uint64,
                        count=len(texts))
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(),
                           "h": h}).drop_duplicates()
        df = df.sort_values("h")
        return pa.Table.from_pandas(df.groupby(group_col, sort=False).head(k),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        hv = np.unique(g["h"].to_numpy(np.uint64))[:k]
        if len(hv) >= k:
            est = int(np.floor((k - 1) * _2_64 / float(hv[k - 1])))
        else:
            est = len(hv)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "est_distinct": np.array([est], np.int64)})

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def _lev_le1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) <= 1 (two-pointer; never the full DP),
    computed over the UTF-8 BYTES — DuckDB's levenshtein is byte-based
    ('é' vs 'a' is distance 2 there), so a code-point comparison would
    diverge from the SQL oracle on non-ASCII strings. Threshold-1
    semantics: equal, one substitution, or one indel."""
    x, y = a.encode(), b.encode()
    lx, ly = len(x), len(y)
    if abs(lx - ly) > 1:
        return False
    if lx == ly:
        return sum(p != q for p, q in zip(x, y)) <= 1
    if lx > ly:
        x, y, lx = y, x, ly
    i = 0
    while i < lx and x[i] == y[i]:
        i += 1
    return x[i:] == y[i + 1:]


def fuzzy_pairs(ds: Dataset, *, col: str,
                num_partitions: int = 16) -> Dataset:
    """Approximate string self-join: all DISTINCT value pairs within
    edit distance 1 — fuzzy matching for entity linking / dictionary
    cleanup. Output: (left_val, right_val) with left < right.

    Scale shape (never all-pairs): values dedup first (block-local
    np.unique is the combiner), then each distinct value emits its
    deletion-neighborhood block keys — itself plus every one-character
    deletion. Two strings within distance 1 ALWAYS share a block key
    (substitution: same position deleted; indel: the shorter string is
    itself a deletion of the longer), so candidates meet inside
    block-key hash partitions, are verified with the exact two-pointer
    check, and pair-level distinct removes multi-block duplicates.
    Candidate volume is bounded by block-key collisions (≈ value length
    × dictionary density), not by the corpus."""
    import pandas as pd

    from uckg_ray.stages.materialize import _add_hash_partition

    def distinct_block(b: pa.Table) -> pa.Table:
        # nulls drop, matching the oracle: levenshtein(NULL, x) <= 1 is
        # NULL, so SQL never emits a pair involving a NULL value
        b = b.filter(pa.compute.is_valid(b.column(col)))
        vals = np.unique(np.asarray(b.column(col).to_pylist(), dtype=object))
        return pa.table({col: pa.array(vals.tolist(), pa.string())})

    from ray.data.aggregate import Count
    distinct = (ds.select_columns([col])
                .map_batches(distinct_block, batch_format="pyarrow",
                             batch_size=None)
                .groupby(col).aggregate(Count(alias_name="_n")))

    def variants(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.schema.names:
            return pa.table({"bk": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        out_bk, out_v = [], []
        for v in b.column(col).to_pylist():
            # byte-level deletions (latin-1 round-trips any byte string
            # into the arrow string column) so the blocking matches the
            # byte-based distance the verify step uses
            bv = v.encode()
            out_bk.append(bv.decode("latin-1"))
            out_v.append(v)
            for i in range(len(bv)):
                out_bk.append((bv[:i] + bv[i + 1:]).decode("latin-1"))
                out_v.append(v)
        return pa.table({"bk": pa.array(out_bk, pa.string()),
                         "v": pa.array(out_v, pa.string())})

    blocked = (distinct.map_batches(variants, batch_format="pyarrow",
                                    batch_size=None)
               .map_batches(lambda b: _add_hash_partition(
                   b, num_partitions, col="bk"),
                   batch_format="pyarrow", batch_size=None))

    def pairs_partition(g: pd.DataFrame) -> pa.Table:
        # cull singleton blocks before the Python loop — most deletion
        # variants are unshared, so this removes ~all iterations (the
        # same cull _bucketed_pairs applies)
        g = g[g.groupby("bk", sort=False)["v"].transform("size").ge(2)]
        left, right = [], []
        for _, grp in g.groupby("bk", sort=False):
            vs = sorted(set(grp["v"]))
            for i in range(len(vs)):
                for j in range(i + 1, len(vs)):
                    if _lev_le1(vs[i], vs[j]):
                        left.append(vs[i])
                        right.append(vs[j])
        return pa.table({"left_val": pa.array(left, pa.string()),
                         "right_val": pa.array(right, pa.string())})

    cand = (blocked.groupby("p")
            .map_groups(lambda g: pairs_partition(g.drop(columns=["p"])),
                        batch_format="pandas"))

    def key(b: pa.Table) -> pa.Table:
        l = b.column("left_val")
        r = b.column("right_val")
        k = pa.compute.binary_join_element_wise(
            l.combine_chunks() if isinstance(l, pa.ChunkedArray) else l,
            r.combine_chunks() if isinstance(r, pa.ChunkedArray) else r,
            "\x1f")
        return _add_hash_partition(b.append_column("k", k),
                                   num_partitions, col="k")

    def uniq(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates()
        return pa.table({
            "left_val": pa.array(df["left_val"].tolist(), pa.string()),
            "right_val": pa.array(df["right_val"].tolist(), pa.string())})

    return (cand.map_batches(key, batch_format="pyarrow", batch_size=None)
            .groupby("p")
            .map_groups(lambda t: uniq(t.drop_columns(["p", "k"])),
                        batch_format="pyarrow"))


def corpus_delta_dedup(new_docs: Dataset, corpus: Dataset, *,
                       text_col: str = "text", id_col: str = "doc_id",
                       num_partitions: int = 32) -> Dataset:
    """Incremental-ingest dedup: mark each NEW document whose normalized
    fingerprint (md5 of the ``dedup.normalize_text`` form — case /
    punctuation / whitespace invariant; NOT the NFC
    ``stages.text.normalize_text``) already exists anywhere in the
    EXISTING corpus. Output ``(doc_id, fingerprint, is_known)`` over the new
    batch — the daily-delta filter a 100 TB corpus runs before paying
    for near-dup analysis of re-crawled documents.

    Scale shape: the corpus side reduces to block-locally-unique
    fingerprint rows (one combiner map — the corpus TEXT never
    shuffles), then both sides co-partition on the fingerprint hash and
    membership is one vectorized polars left join per partition.
    Nothing is ever O(corpus) on the driver or broadcast."""
    import polars as pl

    from uckg_ray.stages.materialize import _add_hash_partition

    _OUT = pa.schema([("doc_id", pa.int64()), ("fingerprint", pa.string()),
                      ("is_known", pa.int64())])

    def tag_new(b: pa.Table) -> pa.Table:
        t = pa.table({"fingerprint": b.column("fingerprint"),
                      "side": pa.array(np.zeros(b.num_rows, np.int8)),
                      "doc_id": b.column(id_col).cast(pa.int64())})
        return _add_hash_partition(t, num_partitions, "fingerprint")

    def tag_corpus(b: pa.Table) -> pa.Table:
        # block-local distinct combiner: one row per fingerprint leaves
        # the block, the corpus text itself never shuffles
        u = b.select(["fingerprint"]).group_by(["fingerprint"]).aggregate([])
        t = pa.table({"fingerprint": u.column("fingerprint"),
                      "side": pa.array(np.ones(u.num_rows, np.int8)),
                      "doc_id": pa.nulls(u.num_rows, pa.int64())})
        return _add_hash_partition(t, num_partitions, "fingerprint")

    def mark(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(["fingerprint", "side", "doc_id"]))
        nd = (df.filter(pl.col("side") == 0)
              .select("doc_id", "fingerprint"))
        cp = (df.filter(pl.col("side") == 1)
              .select("fingerprint").unique()
              .with_columns(pl.lit(1, dtype=pl.Int64).alias("is_known")))
        j = (nd.join(cp, on="fingerprint", how="left")
             .with_columns(pl.col("is_known").fill_null(0)))
        return pa.table({
            "doc_id": j["doc_id"].to_arrow().cast(pa.int64()),
            "fingerprint": j["fingerprint"].to_arrow().cast(pa.string()),
            "is_known": j["is_known"].to_arrow().cast(pa.int64())})

    nf = fingerprints(new_docs, text_col, id_col)
    cf = fingerprints(corpus, text_col, id_col)
    tagged = (nf.map_batches(tag_new, batch_format="pyarrow",
                             batch_size=None)
              .union(cf.map_batches(tag_corpus, batch_format="pyarrow",
                                    batch_size=None)))
    return tagged.groupby("p").map_groups(
        lambda t: mark(t.drop_columns(["p"])), batch_format="pyarrow")
