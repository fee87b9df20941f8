"""Text-analysis operators for training-data pipelines: quality scoring,
language id, token counting. All outputs are integer/boolean/string so
the DuckDB oracle can match value-hashes exactly (no float formatting).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

# marker stopword sets for the n-gram-free language heuristic; mirrored
# verbatim in the oracle SQL (IN lists)
STOP_EN = ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
STOP_DE = ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu")
STOP_FR = ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")


def quality_stats(docs: Dataset) -> Dataset:
    """(doc_id, n_tokens, n_uniq, n_stop, is_quality).

    is_quality: 5 ≤ n_tokens ≤ 1000 AND 2*n_uniq ≥ n_tokens (integer
    repetitiveness test — a vectorizable stand-in for Gopher-style
    repetition filters)."""
    en = list(STOP_EN)

    def stats(batch: pa.Table) -> pa.Table:
        # all-polars: split once, three list reductions — no Python loop
        # ('' splits to [''] in both engines, so counts agree exactly)
        import polars as pl
        toks = pl.col("text").str.split(" ")
        out = (pl.from_arrow(batch.select(["doc_id", "text"]))
               .select(pl.col("doc_id").cast(pl.Int64),
                       toks.list.len().cast(pl.Int64).alias("n_tokens"),
                       toks.list.n_unique().cast(pl.Int64).alias("n_uniq"),
                       toks.list.eval(pl.element().is_in(en)).list.sum()
                       .cast(pl.Int64).alias("n_stop"))
               .with_columns(
                   (pl.col("n_tokens").is_between(5, 1000)
                    & (2 * pl.col("n_uniq") >= pl.col("n_tokens")))
                   .alias("is_quality")))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("n_uniq", pa.int64()), ("n_stop", pa.int64()),
            ("is_quality", pa.bool_())]))

    return docs.map_batches(stats, batch_format="pyarrow")


def lang_id(docs: Dataset) -> Dataset:
    """(doc_id, lang_guess) — argmax of marker-stopword hits over
    {en, de, fr}; ties broken en > de > fr; all-zero → 'unk'."""
    def guess(batch: pa.Table) -> pa.Table:
        # all-polars: one lowercase+split, three marker counts, then a
        # branchless argmax with the en > de > fr tie-break
        import polars as pl
        toks = pl.col("text").str.to_lowercase().str.split(" ")

        def hits(stop):
            return (toks.list.eval(pl.element().is_in(list(stop)))
                    .list.sum().cast(pl.Int64))

        out = (pl.from_arrow(batch.select(["doc_id", "text"]))
               .select(pl.col("doc_id").cast(pl.Int64),
                       hits(STOP_EN).alias("he"), hits(STOP_DE).alias("hd"),
                       hits(STOP_FR).alias("hf"))
               .select("doc_id",
                       pl.when((pl.col("he") == 0) & (pl.col("hd") == 0)
                               & (pl.col("hf") == 0)).then(pl.lit("unk"))
                       .when((pl.col("he") >= pl.col("hd"))
                             & (pl.col("he") >= pl.col("hf")))
                       .then(pl.lit("en"))
                       .when(pl.col("hd") >= pl.col("hf")).then(pl.lit("de"))
                       .otherwise(pl.lit("fr")).alias("lang_guess")))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("lang_guess", pa.string())]))

    return docs.map_batches(guess, batch_format="pyarrow")


BPE_ISH_RX = r"\w+|[^\w\s]+"   # word runs + punctuation runs (GPT-2-ish)


def regex_token_counts_by(docs: Dataset, group_col: str = "source") -> Dataset:
    """(group, n_docs, n_tokens) under a BPE-ish regex tokenizer —
    ≡ SQL sum(len(regexp_extract_all(text, '\\w+|[^\\w\\s]+')))."""
    def partial(batch: pa.Table) -> pa.Table:
        # Rust-regex count_matches (≡ len(findall)) + in-block group agg
        import polars as pl
        out = (pl.from_arrow(batch.select([group_col, "text"]))
               .group_by(group_col)
               .agg(pl.len().cast(pl.Int64).alias("n_docs"),
                    pl.col("text").str.count_matches(BPE_ISH_RX)
                    .cast(pl.Int64).sum().alias("n_tokens")))
        return out.to_arrow().cast(pa.schema([
            (group_col, pa.string()), ("n_docs", pa.int64()),
            ("n_tokens", pa.int64())]))

    return (docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(group_col)
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens")))


def token_counts_by(docs: Dataset, group_col: str = "source") -> Dataset:
    """(group, n_docs, n_tokens) — corpus token accounting under the
    whitespace tokenizer, pre-aggregated per block before the (tiny)
    groupby. ``len(t.split(' '))`` is exactly the literal-space count
    plus one (including for the empty string: ``''.split(' ') == ['']``),
    so the whole partial is one Rust-side expression — no Python loop."""
    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        out = (pl.from_arrow(batch.select([group_col, "text"]))
               .group_by(group_col)
               .agg(pl.len().cast(pl.Int64).alias("n_docs"),
                    (pl.col("text").str.count_matches(" ", literal=True) + 1)
                    .cast(pl.Int64).sum().alias("n_tokens")))
        return out.to_arrow().cast(pa.schema([
            (group_col, pa.string()), ("n_docs", pa.int64()),
            ("n_tokens", pa.int64())]))

    return (docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(group_col)
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens")))


def winnow_fingerprints(docs: Dataset, *, k: int = 8, w: int = 4,
                        carry_col: str | None = None) -> Dataset:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03
    shape): rolling k-gram hashes, distinct window minima per doc.

    h[i] = first 8 bytes (little-endian) of md5(text[i:i+k]) — exactly
    DuckDB's ``md5_number_upper``, so the oracle reproduces every
    fingerprint bit-for-bit. A document shorter than k contributes one
    gram (the whole text); fewer than w grams collapse to one window.
    Output: (doc_id, fp) distinct, fp uint64.

    Stateless task-pool map_batches with BATCH-DISTINCT gram hashing
    (dedup._char_gram_hash_index — the same md5-64 identity as the
    minhash/simhash shingle path): near-dup corpora share the vast
    majority of grams (measured 2.2% distinct on the fixture), so the
    md5 cost collapses and an actor pool's spin-up would cost more
    than the cross-batch cache could save; numpy does the gather, the
    sliding-window minima and the distinct."""
    import numpy as np

    from uckg_ray.stages.dedup import _char_gram_hash_index

    def fps(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        hv, doc_idx = _char_gram_hash_index(texts, k)
        D, F, R = [], [], []
        for row, (i, idx) in enumerate(zip(ids, doc_idx)):
            h = hv[idx]
            ww = min(w, len(h))
            mins = np.unique(
                np.lib.stride_tricks.sliding_window_view(h, ww).min(axis=1))
            D.extend([i] * len(mins)); F.append(mins)
            if carry_col:
                R.extend([row] * len(mins))
        cols = {
            "doc_id": pa.array(D, pa.int64()),
            "fp": pa.array(np.concatenate(F) if F else
                           np.array([], np.uint64), pa.uint64())}
        if carry_col:
            # take on repeat indices preserves the carry column's type
            cols[carry_col] = batch.column(carry_col).take(
                pa.array(R, pa.int64()))
        return pa.Table.from_pydict(cols)

    return docs.map_batches(fps, batch_format="pyarrow")


def fingerprint_overlap(docs: Dataset, *, k: int = 8, w: int = 4,
                        group_col: str = "source",
                        num_partitions: int | None = None) -> Dataset:
    """Cross-slice corpus overlap matrix: for every pair of sources,
    the number of DISTINCT winnow fingerprints present in both —
    the corpus-level "how much do these two slices share" audit run
    before mixing training corpora (pairwise contamination at the
    fingerprint level, robust to whole-document edits).
    Output: (src_a, src_b, n_shared_fps) with src_a < src_b.

    Scale shape: in-block distinct (fp, source) from the winnow kernel
    (the document text never leaves its block), hash-partition on the
    FINGERPRINT so each fp's source set is co-located, per-partition
    vectorized self-join + pair counts (disjoint across partitions by
    construction — each fp lives in exactly one), then one tiny Sum
    groupby on the source pair. Nothing quadratic in documents: the
    join fans out per fp only over the sources sharing it (≤ #sources,
    a small set by definition)."""
    import polars as pl

    from uckg_ray.config import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

    fps = winnow_fingerprints(docs, k=k, w=w, carry_col=group_col)

    _FS = pa.schema([("fp", pa.uint64()), (group_col, pa.string()),
                     ("p", pa.int32())])

    def distinct_fs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _FS.empty_table()
        df = pl.from_arrow(batch.select(["fp", group_col])).unique()
        return pa.table({
            "fp": df["fp"].to_arrow().cast(pa.uint64()),
            group_col: df[group_col].to_arrow().cast(pa.string()),
            "p": (df["fp"] % num_partitions).cast(pl.Int32).to_arrow()})

    _PART = pa.schema([("src_a", pa.string()), ("src_b", pa.string()),
                       ("c", pa.int64())])

    def pair_count(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _PART.empty_table()
        df = pl.from_arrow(part.drop_columns(["p"])).unique()
        j = (df.join(df, on="fp")
             .filter(pl.col(group_col) < pl.col(group_col + "_right"))
             .group_by([group_col, group_col + "_right"]).len())
        return pa.table({
            "src_a": j[group_col].to_arrow().cast(pa.string()),
            "src_b": j[group_col + "_right"].to_arrow().cast(pa.string()),
            "c": j["len"].to_arrow().cast(pa.int64())})

    return (fps.map_batches(distinct_fs, batch_format="pyarrow",
                            batch_size=None)
            .groupby("p").map_groups(pair_count, batch_format="pyarrow")
            .groupby(["src_a", "src_b"])
            .aggregate(Sum("c", alias_name="n_shared_fps")))


def tfidf_components(docs: Dataset, num_partitions: int | None = None
                     ) -> Dataset:
    """TF-IDF building blocks, all-integer so the oracle is exact:
    (doc_id, term, tf, df, n_docs). tf = term count in doc; df = number
    of docs containing the term; n_docs = corpus size. The float
    tf·log(n/df) is one vectorized expression away downstream — floats
    are deliberately not emitted (driver hash parity).

    Shape: per-batch explode+count gives complete tf rows (docs are
    whole rows); ONE hash-partition shuffle on term co-locates each
    term's tf rows, and the partition task computes df (count of rows
    per term — tf rows are distinct (doc, term)) and joins it back with
    a vectorized transform. The vocabulary is corpus-scale — it is
    never broadcast or driver-collected."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def tf_batch(batch: pa.Table) -> pa.Table:
        import polars as pl
        df_ = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
            "term": [t.split(" ") for t in batch.column("text").to_pylist()],
        }).explode("term")
        g = (df_.groupby(["doc_id", "term"], sort=False)
             .size().reset_index(name="tf"))
        h = pl.Series(g["term"].tolist()).hash(seed=0)
        return pa.Table.from_pydict({
            "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
            "term": g["term"].tolist(),
            "tf": pa.array(g["tf"].to_numpy(), pa.int64()),
            "p": pa.array((h % num_partitions).cast(pl.Int32).to_numpy(),
                          pa.int32())})

    def with_df(part: pa.Table) -> pa.Table:
        df_ = part.to_pandas()
        df_["df"] = df_.groupby("term", sort=False)["term"].transform("size")
        return pa.Table.from_pydict({
            "doc_id": pa.array(df_["doc_id"].to_numpy(), pa.int64()),
            "term": df_["term"].tolist(),
            "tf": pa.array(df_["tf"].to_numpy(), pa.int64()),
            "df": pa.array(df_["df"].to_numpy(), pa.int64())})

    n_docs = docs.count()
    return (docs.map_batches(tf_batch, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(
                lambda t: with_df(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .map_batches(
                lambda b: b.append_column(
                    "n_docs", pa.array([n_docs] * b.num_rows, pa.int64())),
                batch_format="pyarrow"))


class BowModelScorer:
    """Batched model inference as an actor-pool stage: a deterministic
    integer bag-of-words linear model (the weights stand in for real
    model parameters; loading them in ``__init__`` is the pattern —
    once per actor, NOT once per batch). Integer weights keep the
    DuckDB oracle exact.

    score(doc) = Σ_token weight[token] (missing tokens weigh 0);
    label = score ≥ threshold."""

    # (token, weight) — the "model checkpoint"
    WEIGHTS = tuple((w, 3) for w in STOP_EN) + \
        tuple((w, -2) for w in ("error", "fail", "retry")) + \
        (("ok", 5), ("done", 4), ("exploit", -3), ("payload", -1))
    THRESHOLD = 4

    def __init__(self):
        self.w = dict(self.WEIGHTS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        w = self.w
        scores = [sum(w.get(t, 0) for t in x.split(" ")) for x in texts]
        s = pd.Series(scores, dtype="int64")
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(s.to_numpy(), pa.int64()),
            "label": pa.array((s >= self.THRESHOLD).to_numpy(), pa.bool_())})


def model_scores(docs: Dataset, *, concurrency: int | tuple = (1, 8),
                 batch_size: int = 4096) -> Dataset:
    """Score every document with the actor-pool model (one weight-load
    per actor, vectorized batches)."""
    return docs.map_batches(BowModelScorer, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency,
                            num_cpus=1)


def ngram_counts(docs: Dataset, *, n: int = 2) -> Dataset:
    """Corpus n-gram counts (LM-data staple): (ngram, count) over
    space-joined token windows. Block-local Counter pre-aggregation is
    the combiner (the shuffle moves one row per distinct n-gram per
    block, not one per occurrence); the global Sum groupby is the only
    exchange. ≡ SQL: unnest sliding windows + GROUP BY.

    The Python window loop is the MEASURED winner here, not an
    oversight: a polars explode + shift(-i).over(row) + concat_str
    formulation ran 1.8× SLOWER on the sf0.1 corpus even with an
    unpinned thread pool (workers pin POLARS_MAX_THREADS=1) — the cost
    is materializing the gram strings themselves, which every
    formulation pays; don't re-attempt without a new idea."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = t.split(" ")
            c.update(" ".join(toks[j:j + n])
                     for j in range(len(toks) - n + 1))
        return pa.Table.from_pydict({
            "ngram": list(c.keys()),
            "count": pa.array(list(c.values()), pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("ngram").aggregate(Sum("count", alias_name="count")))


def ngram_contamination(docs: Dataset, *, n: int = 8, probe_mod: int = 10,
                        min_overlap: int = 1,
                        num_partitions: int = 32) -> Dataset:
    """Benchmark-contamination detection: for every (test, train) doc
    pair that shares ≥ ``min_overlap`` distinct word ``n``-grams, report
    the exact overlap count — the standard n-gram decontamination check
    run before LLM training. The probe (test) split is
    ``doc_id % probe_mod == 0``; callers with a real benchmark table
    union it in with ids in that residue class.

    Distributed shape (nothing quadratic, nothing on the driver):
    per-block distinct-gram explosion → hash partition on the gram
    (polars 64-bit hash) → per-partition vectorized test×train join +
    pair-count partial → one Sum groupby on the packed (test<<32|train)
    pair key → decode + threshold. The gram join is an inverted index:
    a gram shared by T test and R train docs contributes T·R rows in
    its partition only — hot grams are the skew risk, bounded upstream
    by the distinct-per-doc explosion (stopword runs appear once per
    doc, not once per occurrence)."""
    import numpy as np

    def grams(batch: pa.Table) -> pa.Table:
        ids_out, grams_out, test_out = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = (t or "").split(" ")
            gs = {" ".join(toks[j:j + n])
                  for j in range(len(toks) - n + 1)}
            ids_out.extend([d] * len(gs))
            grams_out.extend(gs)
            test_out.extend([d % probe_mod == 0] * len(gs))
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids_out, pa.int64()),
            "gram": pa.array(grams_out, pa.string()),
            "is_test": pa.array(test_out, pa.bool_())})

    def add_p(batch: pa.Table) -> pa.Table:
        import polars as pl
        h = pl.from_arrow(batch.column("gram").combine_chunks()).hash(seed=0)
        p = (h % num_partitions).cast(pl.Int32).to_numpy()
        return batch.append_column("p", pa.array(p, pa.int32()))

    _PARTIAL = pa.schema([("pk", pa.int64()), ("c", pa.int64())])

    def join_count(part: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(part.drop_columns(["p"]))
        te = df.filter(pl.col("is_test")).select("gram", test_doc="doc_id")
        tr = df.filter(~pl.col("is_test")).select("gram", train_doc="doc_id")
        if te.height == 0 or tr.height == 0:
            return _PARTIAL.empty_table()
        pairs = (te.join(tr, on="gram")
                 .group_by(["test_doc", "train_doc"]).len("c"))
        a = pairs["test_doc"].to_numpy().astype(np.int64)
        b = pairs["train_doc"].to_numpy().astype(np.int64)
        # the packed pair key holds two 32-bit ids; ids outside
        # [0, 2^32) would silently corrupt the (test, train) decode
        if len(a) and (int(min(a.min(), b.min())) < 0
                       or int(max(a.max(), b.max())) >= 1 << 32):
            raise ValueError(
                "ngram_contamination packs doc ids into 32 bits each; "
                "ids must be in [0, 2^32) — remap upstream for wider ids")
        pk = (a << 32) | b
        return pa.Table.from_pydict({
            "pk": pa.array(pk, pa.int64()),
            "c": pa.array(pairs["c"].to_numpy().astype(np.int64), pa.int64())})

    _OUT = pa.schema([("test_doc", pa.int64()), ("train_doc", pa.int64()),
                      ("overlap", pa.int64())])

    def decode(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "pk" not in batch.column_names:
            return _OUT.empty_table()
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        ov = batch.column("overlap").to_numpy(zero_copy_only=False)
        keep = ov >= min_overlap
        pk, ov = pk[keep], ov[keep]
        return pa.Table.from_pydict({
            "test_doc": pa.array(pk >> 32, pa.int64()),
            "train_doc": pa.array(pk & 0xFFFFFFFF, pa.int64()),
            "overlap": pa.array(ov, pa.int64())})

    parted = (docs.select_columns(["doc_id", "text"])
              .map_batches(grams, batch_format="pyarrow", batch_size=None)
              .map_batches(add_p, batch_format="pyarrow", batch_size=None))
    partial = parted.groupby("p").map_groups(join_count,
                                             batch_format="pyarrow")
    agg = partial.groupby("pk").aggregate(Sum("c", alias_name="overlap"))
    return agg.map_batches(decode, batch_format="pyarrow", batch_size=None)


# PII patterns shared with the scrub_pii oracle SQL: explicit [0-9]
# (Rust regex \d is Unicode, RE2's isn't) and applied in THIS order —
# replacement output feeds the next pattern, so order is part of the
# contract. SSN before phone: their digit-group shapes are disjoint,
# but the fixed order makes the composition unambiguous either way.
# Patterns are written in the RE2/ASCII dialect (\b = ASCII word
# boundary); the Rust-regex side rewrites \b via _rust_rx below so both
# engines agree even when a digit run abuts a non-ASCII word character.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
]


def _rust_rx(rx: str) -> str:
    """RE2-dialect pattern → Rust-regex dialect: \\b is a UNICODE word
    boundary in the Rust regex crate but ASCII in RE2, so force the
    ASCII form ``(?-u:\\b)`` (legal in Rust regex on UTF-8 haystacks)."""
    return rx.replace(r"\b", r"(?-u:\b)")


def scrub_pii(docs: Dataset, text_col: str = "text",
              id_col: str = "doc_id") -> Dataset:
    """PII redaction — the compliance pass every training-data pipeline
    runs before anything else sees the text. Emails, IPv4s, SSNs and
    phone numbers are replaced with typed redaction tokens (counts
    reported per type, counted on the ORIGINAL text); everything is
    vectorized Rust regex (polars ``replace_all``/``count_matches``),
    stateless and embarrassingly parallel — no shuffle, no state.
    Output: (doc_id, clean_text, n_email, n_ip, n_ssn, n_phone)."""
    import polars as pl

    def scrub(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        s = pl.from_arrow(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
        df = pl.DataFrame({"t": s})
        exprs = []
        clean = pl.col("t")
        for name, rx, tok in PII_PATTERNS:
            rrx = _rust_rx(rx)
            exprs.append(pl.col("t").str.count_matches(rrx)
                         .cast(pl.Int64).alias("n_" + name))
            clean = clean.str.replace_all(rrx, tok)
        out = df.select(clean.alias("clean_text"), *exprs)
        t = pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "clean_text": out["clean_text"].to_arrow().cast(pa.string()),
            **{f"n_{name}": out[f"n_{name}"].to_arrow()
               for name, _, _ in PII_PATTERNS}})
        return t

    return docs.map_batches(scrub, batch_format="pyarrow")


def chunk_documents(docs: Dataset, *, size: int = 64, stride: int = 48,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> Dataset:
    """Token-window chunking — the 1→N expansion that turns documents
    into fixed-size training samples with overlap. Whitespace tokens;
    a chunk starts at every multiple of ``stride`` below the token
    count and spans ``size`` tokens (the tail chunks are shorter).
    Output: (doc_id, chunk_idx, chunk_text, n_tokens).

    Stateless map — chunking never shuffles; downstream dedup/split
    operators consume the chunk stream like any document table."""
    out_schema = pa.schema([
        (id_col, pa.int64()), ("chunk_idx", pa.int64()),
        ("chunk_text", pa.string()), ("n_tokens", pa.int64())])

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        D, CI, CT, NT = [], [], [], []
        for i, t in zip(ids, texts):
            toks = (t or "").split(" ")
            n = len(toks)                     # ≥ 1: ''.split(' ') == ['']
            for ci, start in enumerate(range(0, n, stride)):
                piece = toks[start:start + size]
                D.append(i); CI.append(ci)
                CT.append(" ".join(piece)); NT.append(len(piece))
        return pa.Table.from_pydict(
            {id_col: pa.array(D, pa.int64()),
             "chunk_idx": pa.array(CI, pa.int64()),
             "chunk_text": pa.array(CT, pa.string()),
             "n_tokens": pa.array(NT, pa.int64())}, schema=out_schema)

    return docs.map_batches(chunks, batch_format="pyarrow")


def repetition_stats(docs: Dataset, *, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    """Intra-document n-gram repetition profile — the Gopher/RefinedWeb
    repetition-removal signal (fraction of duplicated word n-grams
    inside each document). Output per doc, all-integer so the oracle is
    exact: (doc_id, n_tokens, n_grams, n_distinct_grams,
    max_gram_count); the duplicate-gram fraction is
    ``1 - n_distinct/n_grams`` one expression downstream. A document
    with fewer than ``n`` tokens reports zeros.

    Stateless per-block map, fully vectorized: one Rust-side split →
    explode → within-doc shifts → concat_str builds the gram column,
    and two tiny in-block group_bys reduce it back to one row per doc.
    Nothing shuffles — documents are whole rows in their block."""
    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_tokens", pa.int64()),
        ("n_grams", pa.int64()), ("n_distinct_grams", pa.int64()),
        ("max_gram_count", pa.int64())])

    def stats(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(batch.select([id_col, text_col]))
              .select(pl.col(id_col).cast(pl.Int64),
                      pl.col(text_col).str.split(" ").alias("tok")))
        base = df.select(id_col, pl.col("tok").list.len().cast(pl.Int64)
                         .alias("n_tokens"))
        shifts = [pl.col("tok").shift(-i).over(id_col).alias(f"_t{i}")
                  for i in range(1, n)]
        grams = (df.explode("tok").with_columns(shifts)
                 .filter(pl.all_horizontal(
                     [pl.col(f"_t{i}").is_not_null() for i in range(1, n)]))
                 .select(id_col,
                         pl.concat_str([pl.col("tok"),
                                        *[pl.col(f"_t{i}")
                                          for i in range(1, n)]],
                                       separator=" ").alias("gram")))
        per_doc = (grams.group_by([id_col, "gram"]).len()
                   .group_by(id_col)
                   .agg(n_grams=pl.col("len").sum().cast(pl.Int64),
                        n_distinct_grams=pl.len().cast(pl.Int64),
                        max_gram_count=pl.col("len").max().cast(pl.Int64)))
        # fill ONLY the gram aggregates (the oracle's COALESCE columns);
        # a null text keeps n_tokens null on both sides
        out = (base.join(per_doc, on=id_col, how="left")
               .with_columns(pl.col(["n_grams", "n_distinct_grams",
                                     "max_gram_count"]).fill_null(0)))
        return out.to_arrow().cast(out_schema)

    return docs.map_batches(stats, batch_format="pyarrow")


def token_freq_histogram(docs: Dataset, text_col: str = "text") -> Dataset:
    """Corpus Zipf profile: (freq, n_tokens) — how many distinct
    whitespace tokens occur exactly ``freq`` times corpus-wide (the
    frequency-of-frequencies histogram used to sanity-check corpus
    composition and tokenizer fit). Two-phase: block-local token counts
    (all-Rust) are the combiner, ONE Sum shuffle on the token
    co-locates global counts, and the second groupby moves one row per
    distinct frequency — tiny."""
    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        # drop_nulls: a null text explodes to one null token row in
        # polars but unnest(string_split(NULL)) emits nothing in DuckDB
        out = (pl.from_arrow(batch.select([text_col]))
               .select(pl.col(text_col).str.split(" ").alias("tok"))
               .explode("tok").drop_nulls("tok")
               .group_by("tok").len())
        return pa.table({
            "tok": out["tok"].to_arrow().cast(pa.string()),
            "n": out["len"].to_arrow().cast(pa.int64())})

    _MID = pa.schema([("freq", pa.int64()), ("one", pa.int64())])

    def ones(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return _MID.empty_table()
        import numpy as np
        return pa.table({
            "freq": batch.column("n"),
            "one": pa.array(np.ones(batch.num_rows, np.int64))})

    return (docs.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
            .groupby("tok").aggregate(Sum("n", alias_name="n"))
            .map_batches(ones, batch_format="pyarrow", batch_size=None)
            .groupby("freq").aggregate(Sum("one", alias_name="n_tokens")))


def top_terms_per_group(docs: Dataset, *, k: int = 10,
                        group_col: str = "source",
                        text_col: str = "text") -> Dataset:
    """Per-group top-k frequent whitespace tokens (vocabulary /
    heavy-hitter characterization of each corpus slice). Ties break
    deterministically: count desc, then token asc — ``row_number()
    OVER (PARTITION BY group ORDER BY n DESC, tok)``.
    Output: (group, tok, n, rk 1..k).

    Scale shape: block-local (group, token) counts are the combiner
    (all-Rust polars split/explode/group_by), the global Sum groupby
    moves distinct (group, token) pairs only, and the final top-k runs
    block-partial top-k → tiny per-group merge (the degree_topk
    pattern) — no global sort, nothing proportional to raw token
    volume crosses an exchange twice."""
    import numpy as np
    import pandas as pd
    import polars as pl

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.column(text_col)
        g = batch.column(group_col)
        df = pl.DataFrame({
            "g": pl.from_arrow(g.combine_chunks()
                               if isinstance(g, pa.ChunkedArray) else g),
            "t": pl.from_arrow(t.combine_chunks()
                               if isinstance(t, pa.ChunkedArray) else t)
            .fill_null("")})
        out = (df.lazy()
               .select(pl.col("g"), pl.col("t").str.split(" ").alias("tok"))
               .explode("tok")
               .group_by(["g", "tok"]).len()
               .collect())
        return pa.table({
            group_col: out["g"].to_arrow().cast(pa.string()),
            "tok": out["tok"].to_arrow().cast(pa.string()),
            "n": out["len"].to_arrow().cast(pa.int64())})

    counts = (docs.select_columns([group_col, text_col])
              .map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
              .groupby([group_col, "tok"])
              .aggregate(Sum("n", alias_name="n")))

    def local_top(b: pa.Table) -> pa.Table:
        # block-partial top-k per group: the global merge sees ≤ k rows
        # per (group, block)
        if b.num_rows == 0 or group_col not in b.schema.names:
            return pa.table({group_col: pa.array([], pa.string()),
                             "tok": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = (b.to_pandas()
              .sort_values(["n", "tok"], ascending=[False, True])
              .groupby(group_col, sort=False).head(k))
        return pa.table({
            group_col: pa.array(df[group_col].tolist(), pa.string()),
            "tok": pa.array(df["tok"].tolist(), pa.string()),
            "n": pa.array(df["n"].to_numpy(np.int64), pa.int64())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["n", "tok"], ascending=[False, True])
             .head(k).reset_index(drop=True))
        g["rk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[[group_col, "tok", "n", "rk"]]

    return (counts.map_batches(local_top, batch_format="pyarrow",
                               batch_size=None)
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def normalize_text(docs: Dataset, text_col: str = "text",
                   id_col: str = "doc_id") -> Dataset:
    """Canonical text normalization — the first pass of an LM data
    pipeline so downstream dedup/fingerprint operators see one spelling
    per string: Unicode full lowercase → NFC composition → whitespace
    runs collapsed to one space → leading/trailing space stripped.
    Output: (doc_id, norm_text, n_chars — post-normalization codepoint
    count).

    All-Rust per batch (polars ``to_lowercase`` / ``str.normalize`` /
    regex ``replace_all``), stateless and shuffle-free. Parity notes,
    pinned by the DuckDB oracle (``nfc_normalize(lower(x))``): the
    lower→NFC order matters (both engines' lowercase maps can emit
    decomposed sequences); pyarrow 16's ``utf8_normalize`` does NOT
    compose (e+U+0301 stays decomposed) — hence polars, not Arrow, for
    the NFC step; Rust gives U+0130 (İ) the full mapping i+U+0307 while
    DuckDB gives the simple mapping — Turkic dotted capitals are the
    one documented divergence."""
    import polars as pl

    def norm(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        s = pl.from_arrow(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
        out = (pl.DataFrame({"t": s})
               .select(pl.col("t").str.to_lowercase()
                       .str.normalize("NFC")
                       # explicit ASCII class, NOT \s: Rust-regex \s is
                       # Unicode (NBSP, U+2009, …) while RE2's is ASCII
                       # — same trap scrub_pii avoids with [0-9]; the
                       # oracle uses this identical class
                       .str.replace_all(r"[\t\n\x0B\f\r ]+", " ")
                       .str.replace_all(r"^ | $", "")
                       .alias("norm_text"))
               .with_columns(pl.col("norm_text").str.len_chars()
                             .cast(pl.Int64).alias("n_chars")))
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "norm_text": out["norm_text"].to_arrow().cast(pa.string()),
            "n_chars": out["n_chars"].to_arrow()})

    return docs.map_batches(norm, batch_format="pyarrow")


def sft_pairs(turns: Dataset, *, num_partitions: int | None = None
              ) -> Dataset:
    """SFT training-pair extraction from conversation transcripts:
    every user turn immediately followed (``turn_idx + 1``, same
    conversation) by an assistant turn becomes one (prompt, response)
    pair with whitespace token counts for both sides — the
    instruction-tuning dataset builder over raw agent logs. Output:
    (conv_id, turn_idx, prompt, response, prompt_tokens,
    response_tokens).

    Scale shape: pairs never cross conversations, so ONE hash-partition
    exchange on conv_id co-locates each conversation and the pairing is
    a vectorized in-partition polars equi-join on (conv_id,
    turn_idx + 1); token counts are the all-Rust literal-space rule
    shared with ``token_counts_by``. Conversations are bounded (turns
    per conv, not corpus-sized), so no intra-key salting is needed."""
    import polars as pl

    from uckg_ray.stages.materialize import _add_hash_partition

    _OUT = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("prompt", pa.string()), ("response", pa.string()),
        ("prompt_tokens", pa.int64()), ("response_tokens", pa.int64())])

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(["conv_id", "turn_idx", "role", "text"])
        return _add_hash_partition(t, num_partitions, "conv_id")

    def pair(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(
            ["conv_id", "turn_idx", "role", "text"]))
        ntok = (pl.col("text").str.count_matches(" ", literal=True) + 1) \
            .cast(pl.Int64)
        u = (df.filter(pl.col("role") == "user")
             .select("conv_id", "turn_idx",
                     prompt="text", prompt_tokens=ntok))
        a = (df.filter(pl.col("role") == "assistant")
             .select("conv_id",
                     (pl.col("turn_idx") - 1).alias("turn_idx"),
                     response="text", response_tokens=ntok))
        j = u.join(a, on=["conv_id", "turn_idx"], how="inner")
        return pa.table({
            "conv_id": j["conv_id"].to_arrow().cast(pa.string()),
            "turn_idx": j["turn_idx"].to_arrow().cast(pa.int32()),
            "prompt": j["prompt"].to_arrow().cast(pa.string()),
            "response": j["response"].to_arrow().cast(pa.string()),
            "prompt_tokens": j["prompt_tokens"].to_arrow()
                              .cast(pa.int64()),
            "response_tokens": j["response_tokens"].to_arrow()
                                .cast(pa.int64())})

    return (turns.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: pair(t.drop_columns(["p"])),
                batch_format="pyarrow"))


def conversation_stats(turns: Dataset) -> Dataset:
    """Per-conversation profile over the transcript table — the
    conversation-level quality/length accounting an agent-log curation
    pipeline filters on before pair extraction: turn counts (total and
    per role), whitespace token total, and wall-clock duration in
    microseconds (last ts − first ts). Output: (conv_id, n_turns,
    n_user, n_assistant, n_tool, n_tokens, duration_us).

    Scale shape: one all-Rust block-local partial per batch (group_by
    conv_id inside the block), then a single Sum/Min/Max groupby whose
    shuffle moves one row per (conv_id × block) — never the text."""
    import polars as pl

    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["conv_id", "role", "text", "ts"]))
        out = (df.group_by("conv_id")
               .agg(pl.len().cast(pl.Int64).alias("n_turns"),
                    (pl.col("role") == "user").sum().cast(pl.Int64)
                    .alias("n_user"),
                    (pl.col("role") == "assistant").sum().cast(pl.Int64)
                    .alias("n_assistant"),
                    (pl.col("role") == "tool").sum().cast(pl.Int64)
                    .alias("n_tool"),
                    (pl.col("text").str.count_matches(" ", literal=True)
                     + 1).cast(pl.Int64).sum().alias("n_tokens"),
                    pl.col("ts").min().alias("ts_min"),
                    pl.col("ts").max().alias("ts_max")))
        t = out.to_arrow()
        return pa.table({
            "conv_id": t.column("conv_id").cast(pa.string()),
            "n_turns": t.column("n_turns"),
            "n_user": t.column("n_user"),
            "n_assistant": t.column("n_assistant"),
            "n_tool": t.column("n_tool"),
            "n_tokens": t.column("n_tokens"),
            "ts_min": t.column("ts_min").cast(pa.timestamp("us"))
                       .cast(pa.int64()),
            "ts_max": t.column("ts_max").cast(pa.timestamp("us"))
                       .cast(pa.int64())})

    def finish(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "conv_id" not in b.column_names:
            return pa.schema(
                [("conv_id", pa.string())] +
                [(c, pa.int64()) for c in
                 ("n_turns", "n_user", "n_assistant", "n_tool",
                  "n_tokens", "duration_us")]).empty_table()
        dur = pc.subtract(b.column("ts_max"), b.column("ts_min"))
        return pa.table({
            "conv_id": b.column("conv_id").cast(pa.string()),
            **{c: b.column(c).cast(pa.int64()) for c in
               ("n_turns", "n_user", "n_assistant", "n_tool",
                "n_tokens")},
            "duration_us": dur.cast(pa.int64())})

    return (turns.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("conv_id")
            .aggregate(Sum("n_turns", alias_name="n_turns"),
                       Sum("n_user", alias_name="n_user"),
                       Sum("n_assistant", alias_name="n_assistant"),
                       Sum("n_tool", alias_name="n_tool"),
                       Sum("n_tokens", alias_name="n_tokens"),
                       Min("ts_min", alias_name="ts_min"),
                       Max("ts_max", alias_name="ts_max"))
            .map_batches(finish, batch_format="pyarrow",
                         batch_size=None))


# Retrieval queries for the shipped bm25_topk registry entry. Terms are
# drawn from the synthetic documents vocabulary so every query matches
# a meaningful slice of the corpus at any scale factor.
BM25_QUERIES = (
    ("q_core", ("sort", "merge", "join")),
    ("q_stream", ("stream", "window", "batch")),
    ("q_perf", ("slow", "fast")),
)

# Fixed-point BM25 constants: k1 = 1.2 and b = 0.75 folded into exact
# integer ratios (22/10 = k1+1, see the derivation in bm25_topk), with
# two scaling factors so every intermediate stays integer-exact and the
# DuckDB oracle can reproduce the score bit-for-bit.
_BM25_IDF_SCALE = 1_000_000
_BM25_TF_SCALE = 10_000


def bm25_topk(docs: Dataset, *, queries=BM25_QUERIES, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """BM25 top-k retrieval over the corpus — the ranking primitive a
    training-data pipeline uses for decontamination lookups, hard-
    negative mining and RAG index validation. Scoring is FIXED-POINT
    integer BM25 (k1 = 1.2, b = 0.75) so the DuckDB oracle is exact:

      idf_fp(t)  = ((N - df + 1) * 1_000_000) // (df + 1)
                     (rational surrogate of ln((N-df+.5)/(df+.5)),
                      order-preserving in df — ranking-equivalent)
      tf part    = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
                 = 22*tf / (10*tf + 3 + 9*dl/avgdl)       [×10]
        with R   = (9*dl*N) // L   (avgdl = L/N, floored once)
      tfc_fp     = (22*tf*10_000) // (10*tf + 3 + R)
      score      = Σ_t (idf_fp * tfc_fp) // 10_000

    Two passes over the pruned (doc_id, text) read — the classic BM25
    shape: pass 1 reduces per-block partials to the tiny global stats
    (N docs, L total tokens, df per query term; |terms| rows, driver-
    combined and closure-broadcast — never a corpus-scale collect);
    pass 2 scores every matching doc vectorized in polars (split →
    explode → is_in(term set) → group_by count, all Rust) and keeps a
    block-local top-k partial, so the final groupby merge sees ≤ k rows
    per query per block. Output: (query_id, doc_id, score, rank) with
    ties broken by doc_id ascending.

    Reference analogue: dictionary-gated mention scoring + ranked
    lookup (`data_collection/cve_collection.py:384-420` is membership
    + lookup; BM25 is the graded-retrieval generalization a transcript
    corpus needs)."""
    import polars as pl

    terms = sorted({t for _, ts in queries for t in ts})
    term_q = pl.DataFrame({
        "tok": [t for _, ts in queries for t in ts],
        "query_id": [q for q, ts in queries for _ in ts]})

    pruned = docs.select_columns([id_col, text_col])

    # -- pass 1: corpus stats (per-block partials → driver combine) --
    def stats_batch(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        s = pl.from_arrow(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
        toks = pl.DataFrame({"tok": s}).with_columns(
            pl.col("tok").str.split(" "))
        n_part = len(s)
        l_part = int(toks.select(pl.col("tok").list.len().sum()).item()
                     or 0)
        df_part = (toks.with_row_index("d").explode("tok")
                   .filter(pl.col("tok").is_in(terms))
                   .unique(["d", "tok"])
                   .group_by("tok").len())
        d = dict(zip(df_part["tok"].to_list(),
                     df_part["len"].to_list()))
        return pa.table({
            "term": pa.array([""] + terms, pa.string()),
            "df": pa.array([0] + [int(d.get(t, 0)) for t in terms],
                           pa.int64()),
            "n": pa.array([n_part] + [0] * len(terms), pa.int64()),
            "l": pa.array([l_part] + [0] * len(terms), pa.int64())})

    stats = pruned.map_batches(stats_batch, batch_format="pyarrow",
                               batch_size=None).take_all()
    n_docs = sum(r["n"] for r in stats)
    total_len = max(1, sum(r["l"] for r in stats))
    df_by_term = {t: 0 for t in terms}
    for r in stats:
        if r["term"]:
            df_by_term[r["term"]] += r["df"]
    idf_by_term = {t: ((n_docs - df) * _BM25_IDF_SCALE + _BM25_IDF_SCALE)
                   // (df + 1)
                   for t, df in df_by_term.items()}
    term_idf = pl.DataFrame({
        "tok": terms,
        "idf": pl.Series([idf_by_term[t] for t in terms],
                         dtype=pl.Int64)})

    out_schema = pa.schema([("query_id", pa.string()),
                            (id_col, pa.int64()),
                            ("score", pa.int64())])

    # -- pass 2: vectorized scoring + block-local top-k partial --
    def score_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        col = batch.column(text_col)
        s = pl.from_arrow(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
        ids = pl.from_arrow(batch.column(id_col).cast(pa.int64())
                            .combine_chunks())
        toks = pl.DataFrame({"doc_id": ids, "tok": s}).with_columns(
            pl.col("tok").str.split(" "))
        dl = toks.select("doc_id",
                         pl.col("tok").list.len().cast(pl.Int64)
                         .alias("dl"))
        tf = (toks.explode("tok")
              .filter(pl.col("tok").is_in(terms))
              .group_by("doc_id", "tok").len().rename({"len": "tf"})
              .with_columns(pl.col("tf").cast(pl.Int64)))
        if tf.is_empty():
            return out_schema.empty_table()
        scored = (tf.join(dl, on="doc_id")
                  .join(term_q, on="tok")
                  .join(term_idf, on="tok")
                  .with_columns(
                      ((pl.lit(9, pl.Int64) * pl.col("dl") * n_docs)
                       // total_len).alias("r"))
                  .with_columns(
                      ((pl.lit(22, pl.Int64) * pl.col("tf")
                        * _BM25_TF_SCALE)
                       // (10 * pl.col("tf") + 3 + pl.col("r")))
                      .alias("tfc"))
                  .with_columns(
                      ((pl.col("idf") * pl.col("tfc")) // _BM25_TF_SCALE)
                      .alias("tscore"))
                  .group_by("query_id", "doc_id")
                  .agg(pl.col("tscore").sum().alias("score"))
                  .sort(["query_id", "score", "doc_id"],
                        descending=[False, True, False])
                  .group_by("query_id", maintain_order=True).head(k))
        return pa.table({
            "query_id": scored["query_id"].to_arrow().cast(pa.string()),
            id_col: scored["doc_id"].to_arrow().cast(pa.int64()),
            "score": scored["score"].to_arrow().cast(pa.int64())})

    def merge(g: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        g = g.sort_values(["score", id_col],
                          ascending=[False, True]).head(k)
        return g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))

    return (pruned.map_batches(score_batch, batch_format="pyarrow",
                               batch_size=None)
            .groupby("query_id").map_groups(merge, batch_format="pandas"))


def pack_token_shards(docs: Dataset, *, capacity: int = 1024,
                      bucket_size: int = 1 << 20,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> Dataset:
    """Concat-and-chunk sequence packing — the LM-pretraining step that
    concatenates the corpus token stream in doc_id order and cuts it
    into fixed-``capacity`` training sequences. Each document gets its
    global token offset and the shard (training-sequence index) where
    it starts:

      token_offset(d) = Σ n_tokens(d') for d' < d   (exclusive prefix)
      shard_id(d)     = token_offset // capacity
      offset_in_shard = token_offset %  capacity

    Distributed prefix scan in two passes over the pruned read — the
    same shape as ``windows.running_aggregates`` but with ONE global
    key: docs bucket by ``doc_id // bucket_size``; pass 1 reduces each
    bucket to a single token total (#docs/bucket_size summary rows —
    with the 1M default, a 10^12-doc corpus stitches 10^6 rows on the
    driver, the two-level-scan tradeoff documented here); the driver's
    exclusive cumsum over sorted buckets gives every bucket its base
    offset; pass 2 re-tokenizes, co-locates each bucket with ONE hash
    shuffle, and a segmented in-bucket scan adds the broadcast base.
    No corpus-scale collect, no global sort. Output:
    (doc_id, n_tokens, token_offset, shard_id)."""
    import numpy as np
    import polars as pl

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    n_parts = default_num_partitions()
    pruned = docs.select_columns([id_col, text_col])

    def tokenize(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        s = pl.from_arrow(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
        nt = (pl.DataFrame({"t": s})
              .select(pl.col("t").str.split(" ").list.len()
                      .cast(pl.Int64).alias("n"))["n"].to_numpy())
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bk = np.floor_divide(ids, bucket_size)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "bucket": pa.array(bk, pa.int64()),
            "p": pa.array(key_partition_ids(bk, n_parts), pa.int32())})

    # pass 1: per-bucket token totals (tiny: one row per bucket)
    from ray.data.aggregate import Sum
    totals = (pruned.map_batches(tokenize, batch_format="pyarrow",
                                 batch_size=None)
              .groupby("bucket").aggregate(Sum("n_tokens",
                                               alias_name="tot"))
              .take_all())
    base_by_bucket: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["bucket"]):
        base_by_bucket[r["bucket"]] = acc
        acc += r["tot"]

    out_schema = pa.schema([
        (id_col, pa.int64()), ("n_tokens", pa.int64()),
        ("token_offset", pa.int64()), ("shard_id", pa.int64())])

    # pass 2: in-bucket segmented exclusive scan + broadcast base
    def scan(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        import pandas as pd
        g = part.to_pandas().sort_values(["bucket", id_col],
                                         ignore_index=True)
        nt = g["n_tokens"].to_numpy(np.int64)
        bk = g["bucket"].to_numpy(np.int64)
        n = len(g)
        brk = np.ones(n, dtype=bool)
        brk[1:] = bk[1:] != bk[:-1]
        cs = np.cumsum(nt)
        excl = cs - nt  # inclusive → exclusive
        seg_start_excl = excl[brk]  # running total at each bucket start
        seg = np.cumsum(brk) - 1
        local = excl - seg_start_excl[seg]
        base = np.fromiter((base_by_bucket[b] for b in bk[brk]),
                           np.int64, count=int(brk.sum()))
        off = local + base[seg]
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "token_offset": pa.array(off, pa.int64()),
            "shard_id": pa.array(off // capacity, pa.int64())})

    return (pruned.map_batches(tokenize, batch_format="pyarrow",
                               batch_size=None)
            .groupby("p").map_groups(
                lambda t: scan(t.drop_columns(["p"])),
                batch_format="pyarrow"))


def turn_transitions(turns: Dataset, *, num_partitions: int | None = None
                     ) -> Dataset:
    """Role-transition matrix over conversation transcripts: how often
    each role is followed by each other role at the next turn
    (``turn_idx + 1``, same conversation) — the Markov-structure audit
    for agent-log corpora (e.g. how often a tool call is answered by
    the assistant vs. retried). Output: (role, next_role,
    n_transitions).

    Scale shape: same as ``sft_pairs`` — transitions never cross
    conversations, so ONE hash-partition exchange on conv_id co-locates
    each conversation; the adjacency is a vectorized in-partition
    polars equi-join on (conv_id, turn_idx + 1) and the matrix is
    pre-reduced per partition (≤ |roles|² rows) before a tiny final Sum
    groupby. Text never leaves the scan."""
    import polars as pl

    from uckg_ray.stages.materialize import _add_hash_partition

    _OUT = pa.schema([("role", pa.string()), ("next_role", pa.string()),
                      ("n", pa.int64())])

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(["conv_id", "turn_idx", "role"])
        return _add_hash_partition(t, num_partitions, "conv_id")

    def count_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(["conv_id", "turn_idx", "role"]))
        nxt = df.select(
            "conv_id", (pl.col("turn_idx") - 1).alias("turn_idx"),
            pl.col("role").alias("next_role"))
        j = (df.join(nxt, on=["conv_id", "turn_idx"], how="inner")
             .group_by("role", "next_role").len()
             .with_columns(pl.col("len").cast(pl.Int64)))
        return pa.table({
            "role": j["role"].to_arrow().cast(pa.string()),
            "next_role": j["next_role"].to_arrow().cast(pa.string()),
            "n": j["len"].to_arrow()})

    return (turns.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: count_part(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .groupby(["role", "next_role"])
            .aggregate(Sum("n", alias_name="n_transitions")))


_SURPRISAL_SCALE = 1_000


def doc_surprisal(docs: Dataset, *, num_partitions: int = 32,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> Dataset:
    """Corpus-LM surprisal proxy — the quality signal a pretraining
    pipeline uses to flag gibberish/boilerplate without a model: score
    each document by how RARE its word bigrams are in the whole corpus.
    Fixed-point integer so the oracle is exact (no log): each bigram
    occurrence contributes ``(TB * 1000) // c(bg)`` — the scaled
    inverse corpus frequency (TB = total bigram occurrences; int64-safe
    to TB ≈ 9·10¹⁵ at this scale). Output: (doc_id, n_bigrams,
    surprisal_fp); docs with < 2 tokens emit nothing.

    Distributed shape (the tf-idf pattern — the bigram vocabulary is
    corpus-scale and is never broadcast or driver-collected): TB from a
    one-expression Rust scan; per-block (doc, bg) occurrence counts
    (the combiner); ONE hash exchange on the bigram co-locates each
    bigram's rows, where the corpus count and every row's contribution
    are computed vectorized and pre-summed per doc; a final Sum groupby
    on doc_id merges the per-partition partials (≤ #docs × #partitions
    rows, text never shuffles)."""
    from collections import Counter

    import polars as pl

    pruned = docs.select_columns([id_col, text_col])

    # pass 1: TB — one Rust expression per block, tiny Sum
    def tb_partial(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        s = pl.from_arrow(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
        nb = (pl.DataFrame({"t": s})
              .select((pl.col("t").str.count_matches(" ", literal=True))
                      .sum()).item())  # len(split)-1 == #spaces
        return pa.table({"nb": pa.array([int(nb or 0)], pa.int64())})

    tb = sum(r["nb"] for r in
             pruned.map_batches(tb_partial, batch_format="pyarrow",
                                batch_size=None).take_all())
    unit = _SURPRISAL_SCALE * max(tb, 1)

    # pass 2: (doc, bg, nocc) combiner + bigram-hash partition tag
    def grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        c: Counter = Counter()
        for i, t in zip(ids, texts):
            toks = t.split(" ")
            c.update((i, toks[j] + " " + toks[j + 1])
                     for j in range(len(toks) - 1))
        d = [k[0] for k in c]
        bg = [k[1] for k in c]
        h = pl.Series(bg).hash(seed=0)
        return pa.table({
            id_col: pa.array(d, pa.int64()),
            "bg": pa.array(bg, pa.string()),
            "nocc": pa.array(list(c.values()), pa.int64()),
            "p": pa.array((h % num_partitions).cast(pl.Int32).to_numpy(),
                          pa.int32())})

    def score_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.schema([(id_col, pa.int64()), ("nb", pa.int64()),
                              ("s", pa.int64())]).empty_table()
        df = pl.from_arrow(part.select([id_col, "bg", "nocc"]))
        out = (df.with_columns(
                   pl.col("nocc").sum().over("bg").alias("c"))
               .with_columns(
                   (pl.col("nocc") * (pl.lit(unit, pl.Int64)
                                      // pl.col("c"))).alias("contrib"))
               .group_by(id_col)
               .agg(pl.col("nocc").sum().alias("nb"),
                    pl.col("contrib").sum().alias("s")))
        return pa.table({
            id_col: out[id_col].to_arrow().cast(pa.int64()),
            "nb": out["nb"].to_arrow().cast(pa.int64()),
            "s": out["s"].to_arrow().cast(pa.int64())})

    return (pruned.map_batches(grams, batch_format="pyarrow",
                               batch_size=None)
            .groupby("p").map_groups(
                lambda t: score_part(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .groupby(id_col)
            .aggregate(Sum("nb", alias_name="n_bigrams"),
                       Sum("s", alias_name="surprisal_fp")))


def conv_dedup(turns: Dataset, *, num_partitions: int | None = None
               ) -> Dataset:
    """Conversation-level exact dedup — the transcript-table analogue
    of ``dedup_exact``: a conversation's fingerprint is the md5 of its
    per-turn text md5 digests concatenated in ``turn_idx`` order
    (0x1f-joined, so turn boundaries can't alias), and identical
    transcripts collapse to the lexicographically-first conv_id.
    Output: (conv_fp, n_convs, conv_id) — one row per distinct
    transcript, keeper = min(conv_id). ≡ SQL
    ``md5(string_agg(md5(text), chr(31) ORDER BY turn_idx))``.

    Scale shape: turn texts are hashed AT THE SCAN (inside the tag
    map), so the conv_id hash exchange moves 32-byte digests, never
    text — measured 15.5 s → text-free on the 9.6M-turn sweep; the
    per-partition fold (sort → ordered string_agg → md5) is
    polars-vectorized and the fingerprint groupby then moves one row
    per conversation."""
    import hashlib

    import polars as pl

    from ray.data.aggregate import Count, Min, Sum
    from uckg_ray.stages.materialize import _add_hash_partition

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    _MID = pa.schema([("conv_id", pa.string()), ("conv_fp", pa.string())])

    def tag(b: pa.Table) -> pa.Table:
        from uckg_ray.stages.dedup import _md5_col
        th = pa.array(_md5_col(b.column("text").to_pylist()), pa.string())
        t = pa.table({"conv_id": b.column("conv_id"),
                      "turn_idx": b.column("turn_idx"), "text": th})
        return _add_hash_partition(t, num_partitions, "conv_id")

    def fp_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _MID.empty_table()
        df = pl.from_arrow(part.select(["conv_id", "turn_idx", "text"]))
        agg = (df.sort("conv_id", "turn_idx")
               .group_by("conv_id", maintain_order=True)
               .agg(pl.col("text").str.join("\x1f").alias("joined")))
        fps = [hashlib.md5(s.encode()).hexdigest()
               for s in agg["joined"].to_list()]
        return pa.table({
            "conv_id": agg["conv_id"].to_arrow().cast(pa.string()),
            "conv_fp": pa.array(fps, pa.string())})

    return (turns.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: fp_part(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .groupby("conv_fp")
            .aggregate(Count(alias_name="n_convs"),
                       Min("conv_id", alias_name="conv_id")))


def turn_latency(turns: Dataset, *, num_partitions: int | None = None
                 ) -> Dataset:
    """Response-latency matrix over conversation transcripts: for every
    consecutive turn pair (``turn_idx + 1``, same conversation), the
    count, total and maximum inter-turn gap in MICROSECONDS keyed by
    (role, next_role) — the agent-ops latency audit (how long the
    assistant takes after a user turn vs. after a tool result).
    Integer-exact: gaps are epoch-microsecond differences, so the
    oracle reproduces every cell with ``date_diff``. Output: (role,
    next_role, n_pairs, sum_gap_us, max_gap_us).

    Scale shape: identical to ``turn_transitions`` — ONE conv_id
    hash-partition exchange, a vectorized in-partition polars
    (conv_id, turn_idx + 1) equi-join, per-partition pre-reduction to
    ≤ |roles|² rows, tiny final Sum/Max groupby. Text never leaves the
    scan (the read projects it away)."""
    import polars as pl

    from ray.data.aggregate import Max
    from uckg_ray.stages.materialize import _add_hash_partition

    _OUT = pa.schema([("role", pa.string()), ("next_role", pa.string()),
                      ("n", pa.int64()), ("s", pa.int64()),
                      ("m", pa.int64())])

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        # normalize the timestamp unit so the Int64 gap below is always
        # microseconds, whatever precision the source parquet carries
        t = pa.table({"conv_id": b.column("conv_id"),
                      "turn_idx": b.column("turn_idx"),
                      "role": b.column("role"),
                      "ts": b.column("ts").cast(pa.timestamp("us"))})
        return _add_hash_partition(t, num_partitions, "conv_id")

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(
            ["conv_id", "turn_idx", "role", "ts"]))
        nxt = df.select(
            "conv_id", (pl.col("turn_idx") - 1).alias("turn_idx"),
            pl.col("role").alias("next_role"),
            pl.col("ts").alias("ts_next"))
        j = (df.join(nxt, on=["conv_id", "turn_idx"], how="inner")
             .with_columns(gap=(pl.col("ts_next").cast(pl.Int64)
                                - pl.col("ts").cast(pl.Int64)))
             .group_by("role", "next_role")
             .agg(n=pl.len().cast(pl.Int64),
                  s=pl.col("gap").sum(),
                  m=pl.col("gap").max()))
        return pa.table({
            "role": j["role"].to_arrow().cast(pa.string()),
            "next_role": j["next_role"].to_arrow().cast(pa.string()),
            "n": j["n"].to_arrow(), "s": j["s"].to_arrow(),
            "m": j["m"].to_arrow()})

    return (turns.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: fold(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .groupby(["role", "next_role"])
            .aggregate(Sum("n", alias_name="n_pairs"),
                       Sum("s", alias_name="sum_gap_us"),
                       Max("m", alias_name="max_gap_us")))


def tool_sequences(turns: Dataset, *, num_partitions: int | None = None
                   ) -> Dataset:
    """Tool-chain mining over agent transcripts: how often each tool is
    followed by each other tool WITHIN a conversation — successive
    tool-role turns (intervening user/assistant turns skipped), the
    workflow-structure audit for agent logs (which tool pipelines
    actually occur, e.g. search→fetch→summarize). Output: (tool,
    next_tool, n_pairs).

    Scale shape: the tool-turn stream is filtered AT THE SCAN (role =
    'tool' and tool set — a tiny fraction of turns), then one conv_id
    hash-partition exchange co-locates each conversation; the successor
    is a vectorized polars sort + shift(-1) over conv groups with a
    per-partition pre-count, and only ≤ |tools|² rows reach the final
    Sum groupby."""
    import polars as pl

    from uckg_ray.stages.materialize import _add_hash_partition

    _OUT = pa.schema([("tool", pa.string()), ("next_tool", pa.string()),
                      ("n", pa.int64())])

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.fill_null(pc.equal(b.column("role"), "tool"), False),
            pc.is_valid(b.column("tool")))
        t = b.filter(keep).select(["conv_id", "turn_idx", "tool"])
        return _add_hash_partition(t, num_partitions, "conv_id")

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = (pl.from_arrow(part.select(["conv_id", "turn_idx", "tool"]))
              .sort("conv_id", "turn_idx")
              .with_columns(next_tool=pl.col("tool").shift(-1)
                            .over("conv_id"))
              .drop_nulls("next_tool")
              .group_by("tool", "next_tool").len()
              .with_columns(pl.col("len").cast(pl.Int64)))
        return pa.table({
            "tool": df["tool"].to_arrow().cast(pa.string()),
            "next_tool": df["next_tool"].to_arrow().cast(pa.string()),
            "n": df["len"].to_arrow()})

    return (turns.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: fold(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .groupby(["tool", "next_tool"])
            .aggregate(Sum("n", alias_name="n_pairs")))


def conv_texts(turns: Dataset, *, num_partitions: int | None = None,
               sep: str = "\x1f") -> Dataset:
    """Conversation-joined text table: (conv_id, text) with one row per
    conversation, text = the turn texts concatenated in ``turn_idx``
    order (``sep``-joined). The shared front half of conversation-level
    corpus ops (exact dedup hashes it, near-dup shingles it).

    Scale shape: ONE conv_id hash exchange co-locates each
    conversation; the per-partition fold (sort → ordered string_agg) is
    polars-vectorized. NOTE the output row is a whole conversation —
    downstream consumers shingle or hash it inside tasks; nothing
    re-shuffles the joined text."""
    import polars as pl

    from uckg_ray.stages.materialize import _add_hash_partition

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    _OUT = pa.schema([("conv_id", pa.string()), ("text", pa.string())])

    def tag(b: pa.Table) -> pa.Table:
        t = b.select(["conv_id", "turn_idx", "text"])
        return _add_hash_partition(t, num_partitions, "conv_id")

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        agg = (pl.from_arrow(part.select(["conv_id", "turn_idx", "text"]))
               .sort("conv_id", "turn_idx")
               .group_by("conv_id", maintain_order=True)
               .agg(pl.col("text").str.join(sep).alias("text")))
        return pa.table({
            "conv_id": agg["conv_id"].to_arrow().cast(pa.string()),
            "text": agg["text"].to_arrow().cast(pa.string())})

    return (turns.map_batches(tag, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: fold(t.drop_columns(["p"])),
                batch_format="pyarrow"))


def decontaminate(docs: Dataset, *, n: int = 8, probe_mod: int = 10,
                  min_overlap: int = 1,
                  num_partitions: int = 32) -> Dataset:
    """Cleaned training corpus — the decontamination FILTER composed
    from ``ngram_contamination``'s detector: every train-split doc
    (``doc_id % probe_mod != 0``) with no ≥ ``min_overlap``
    distinct-word-``n``-gram collision against the test split
    survives, as (doc_id, source). The flagged side reduces to
    distinct train ids (block-local ``np.unique`` is the combiner —
    the anti-join shuffle moves flagged IDS, never text) and both
    sides hash-partition on doc_id for a vectorized in-partition
    ``np.isin`` anti filter (the explicit-partition shape of
    ``joins.anti_join_keys``, re-stated here because that helper
    carries only an integer value column, not the string source)."""
    import numpy as np
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    n_parts = default_num_partitions()
    flagged = ngram_contamination(docs, n=n, probe_mod=probe_mod,
                                  min_overlap=min_overlap,
                                  num_partitions=num_partitions)

    _TAGGED = pa.schema([("doc_id", pa.int64()), ("source", pa.string()),
                         ("is_left", pa.bool_()), ("p", pa.int32())])

    def tag_left(b: pa.Table) -> pa.Table:
        ids0 = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ids0 % probe_mod != 0))
        ids = b.column("doc_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": b.column("source").cast(pa.string()),
            "is_left": pa.array(np.ones(len(ids), bool)),
            "p": pa.array(key_partition_ids(ids, n_parts), pa.int32())})

    def tag_right(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "train_doc" not in b.column_names:
            return _TAGGED.empty_table()
        ids = np.unique(b.column("train_doc").cast(pa.int64())
                        .to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array([""] * len(ids), pa.string()),
            "is_left": pa.array(np.zeros(len(ids), bool)),
            "p": pa.array(key_partition_ids(ids, n_parts), pa.int32())})

    def filter_partition(g: pd.DataFrame) -> pa.Table:
        lk = g[g["is_left"]]
        seen = g.loc[~g["is_left"], "doc_id"].to_numpy(np.int64)
        keep = lk[~np.isin(lk["doc_id"].to_numpy(np.int64), seen)]
        return pa.table({
            "doc_id": pa.array(keep["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "source": pa.array(keep["source"].tolist(), pa.string())})

    left = docs.select_columns(["doc_id", "source"]) \
        .map_batches(tag_left, batch_format="pyarrow", batch_size=None)
    right = flagged.map_batches(tag_right, batch_format="pyarrow",
                                batch_size=None)
    return (left.union(right).groupby("p")
            .map_groups(lambda g: filter_partition(g.drop(columns=["p"])),
                        batch_format="pandas"))


def collocations_topk(docs: Dataset, *, min_count: int = 5, k: int = 100,
                      num_partitions: int = 32) -> Dataset:
    """Top-k adjacent-word-bigram collocations by exact integer Dice
    association — ``dice_ppm = 2·c(w1,w2)·10⁶ // (c(w1) + c(w2))`` —
    the classic collocation-mining signal (Smadja / NLTK's Dice
    scorer), integer-exact so the SQL oracle matches bit-for-bit.

    Distributed shape: ONE tokenized scan emits unigram AND bigram
    block partials into a single tagged stream (all-polars explode, no
    Python inner loop), so one (kind, w1, w2) Sum groupby aggregates
    both count tables; bigrams filter to c ≥ min_count BEFORE any
    join; unigram counts attach via two word-hash co-partition joins
    (never broadcast — vocabulary is unbounded at corpus scale);
    scoring is vectorized int64 (2c·10⁶ stays under 2⁶³ for any corpus
    below ~4.6×10¹² occurrences of one bigram); ranking is per-block
    partial top-k → one single-partition merge of ≤ k·#blocks rows.
    Output: (w1, w2, c, dice_ppm), dice desc, ties (w1, w2) asc."""
    import numpy as np
    import polars as pl

    def partial(b: pa.Table) -> pa.Table:
        t = (pl.from_arrow(b.select(["text"]))
             .select(pl.col("text").str.split(" ").alias("t")))
        uni = (t.select(pl.col("t").explode().alias("w1"))
               .group_by("w1").len("c")
               .with_columns(kind=pl.lit(0, pl.Int8),
                             w2=pl.lit("", pl.String)))
        L = pl.col("t").list.len()
        big = (t.filter(L >= 2)
               .select(pl.col("t").list.slice(0, L - 1).alias("w1"),
                       pl.col("t").list.slice(1, L - 1).alias("w2"))
               .explode(["w1", "w2"])
               .group_by(["w1", "w2"]).len("c")
               .with_columns(kind=pl.lit(1, pl.Int8)))
        cols = ["kind", "w1", "w2", "c"]
        return pl.concat([uni.select(cols), big.select(cols)]) \
            .with_columns(pl.col("c").cast(pl.Int64)).to_arrow()

    counts = (docs.select_columns(["text"])
              .map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
              .groupby(["kind", "w1", "w2"])
              .aggregate(Sum("c", alias_name="c")))

    _TAGGED = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                         ("c", pa.int64()), ("is_b", pa.bool_()),
                         ("p", pa.int32())])

    def tag(join_word: str):
        """Partition the aggregated stream on the join word's hash:
        bigram rows by their w1/w2, unigram rows by their word."""
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or "kind" not in b.schema.names:
                return _TAGGED.empty_table()
            df = pl.from_arrow(b)
            is_b = df["kind"] == 1
            kw = pl.when(pl.col("kind") == 1) \
                .then(pl.col(join_word)).otherwise(pl.col("w1"))
            df = df.with_columns(
                p=(kw.hash(seed=0) % num_partitions).cast(pl.Int32),
                is_b=is_b)
            if min_count > 1:
                df = df.filter(~pl.col("is_b")
                               | (pl.col("c") >= min_count))
            return df.select(["w1", "w2", "c", "is_b", "p"]).to_arrow()
        return f

    _CW1 = ["w1", "w2", "c", "is_b", "cw1"]

    def attach1(part: pa.Table) -> pa.Table:
        """Attach c(w1) to bigrams; unigram rows flow THROUGH (cw1=0)
        so the second word-hash exchange can reuse them — the count
        aggregation executes exactly once."""
        df = pl.from_arrow(part.drop_columns(["p"]))
        b = df.filter(pl.col("is_b"))
        u = df.filter(~pl.col("is_b"))
        bj = b.join(u.select(pl.col("w1").alias("_w"),
                             pl.col("c").alias("cw1")),
                    left_on="w1", right_on="_w", how="inner")
        u2 = u.with_columns(cw1=pl.lit(0, pl.Int64))
        return pl.concat([bj.select(_CW1), u2.select(_CW1)]).to_arrow()

    def retag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "is_b" not in b.schema.names:
            return pa.schema(
                [("w1", pa.string()), ("w2", pa.string()),
                 ("c", pa.int64()), ("is_b", pa.bool_()),
                 ("cw1", pa.int64()), ("p", pa.int32())]).empty_table()
        df = pl.from_arrow(b)
        kw = pl.when(pl.col("is_b")) \
            .then(pl.col("w2")).otherwise(pl.col("w1"))
        return df.with_columns(
            p=(kw.hash(seed=0) % num_partitions).cast(pl.Int32)) \
            .select(_CW1 + ["p"]).to_arrow()

    scored_in = (counts.map_batches(tag("w1"), batch_format="pyarrow",
                                    batch_size=None)
                 .groupby("p").map_groups(attach1,
                                          batch_format="pyarrow")
                 .map_batches(retag, batch_format="pyarrow",
                              batch_size=None))

    _OUT = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                      ("c", pa.int64()), ("dice_ppm", pa.int64())])

    def attach2_score(part: pa.Table) -> pa.Table:
        df = pl.from_arrow(part.drop_columns(["p"]))
        b = df.filter(pl.col("is_b"))
        u = df.filter(~pl.col("is_b")) \
            .select(pl.col("w1").alias("_w"), pl.col("c").alias("cw2"))
        j = b.join(u, left_on="w2", right_on="_w", how="inner")
        if j.height == 0:
            return _OUT.empty_table()
        c = j["c"].to_numpy().astype(np.int64)
        den = j["cw1"].to_numpy().astype(np.int64) \
            + j["cw2"].to_numpy().astype(np.int64)
        dice = 2 * c * 1_000_000 // den
        out = pa.table({"w1": pa.array(j["w1"].to_list(), pa.string()),
                        "w2": pa.array(j["w2"].to_list(), pa.string()),
                        "c": pa.array(c, pa.int64()),
                        "dice_ppm": pa.array(dice, pa.int64())})
        # block-local partial top-k: the single-partition merge sees
        # at most k rows per partition
        df2 = out.to_pandas().sort_values(
            ["dice_ppm", "w1", "w2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df2.head(k), preserve_index=False)

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "dice_ppm" not in b.schema.names:
            return _OUT.empty_table()
        df = b.to_pandas().sort_values(
            ["dice_ppm", "w1", "w2"], ascending=[False, True, True])
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    return (scored_in.groupby("p")
            .map_groups(attach2_score, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def readability_scores(docs: Dataset) -> Dataset:
    """Per-document Flesch-reading-ease components and fixed-point
    score — the classic readability quality gate. Counting contract
    (identical in the SQL oracle): words = space-split token count,
    sentences = max(#[.!?] occurrences, 1), syllables = #[aeiouy]+
    groups in the lowercased text (the standard vowel-group
    approximation). ``flesch_milli = 206835 − 1015·w//s − 84600·sy//w``
    — every operand non-negative, so floor and truncating division
    agree across engines. All-polars (Rust regex) stateless map, zero
    shuffles. Output: (doc_id, n_words, n_sents, n_syll,
    flesch_milli)."""
    import polars as pl

    def score(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        out = (df.with_columns(
            n_words=pl.col("text").str.split(" ").list.len()
            .cast(pl.Int64),
            n_sents=pl.max_horizontal(
                pl.col("text").str.count_matches(r"[.!?]")
                .cast(pl.Int64), pl.lit(1, pl.Int64)),
            n_syll=pl.col("text").str.to_lowercase()
            .str.count_matches(r"[aeiouy]+").cast(pl.Int64))
            .with_columns(
                flesch_milli=pl.lit(206835, pl.Int64)
                - 1015 * pl.col("n_words") // pl.col("n_sents")
                - 84600 * pl.col("n_syll") // pl.col("n_words"))
            .drop("text"))
        return out.to_arrow()

    return docs.select_columns(["doc_id", "text"]) \
        .map_batches(score, batch_format="pyarrow")


def turn_dupe_stats(turns: Dataset,
                    num_partitions: int | None = None) -> Dataset:
    """Within-conversation repeated-turn audit: conversations whose
    transcript contains the same turn text more than once (copy-paste
    loops, agent retry storms — the rows an SFT-pair extraction must
    not over-weight). Output: (conv_id, n_turns, n_distinct_texts,
    n_dupes) for conversations with ≥ 1 duplicate.

    Scale shape: turns collapse in-block to (conv, md5(text), count)
    partials — the ONLY exchange moves those bounded partials, never
    the text — then one conv-hash partition pass merges counts and
    keeps the n_dupes > 0 survivors. A conversation is never split
    across partitions, so the distinct-text count is exact."""
    import polars as pl

    from uckg_ray.stages.dedup import _md5_col
    from uckg_ray.stages.materialize import _add_hash_partition

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    def partial(b: pa.Table) -> pa.Table:
        th = _md5_col(b.column("text").to_pylist())
        t = (pl.DataFrame({
            "conv_id": pl.Series(b.column("conv_id").to_pylist(),
                                 dtype=pl.Utf8),
            "th": pl.Series(th, dtype=pl.Utf8)})
            .group_by("conv_id", "th").len()
            .select(["conv_id", "th",
                     pl.col("len").cast(pl.Int64).alias("n")])
            .to_arrow().cast(pa.schema([
                ("conv_id", pa.string()), ("th", pa.string()),
                ("n", pa.int64())])))
        return _add_hash_partition(t, num_partitions, col="conv_id")

    _OUT = pa.schema([("conv_id", pa.string()), ("n_turns", pa.int64()),
                      ("n_distinct_texts", pa.int64()),
                      ("n_dupes", pa.int64())])

    def merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        out = (pl.from_arrow(part)
               .group_by("conv_id", "th")
               .agg(pl.col("n").sum())
               .group_by("conv_id")
               .agg(pl.col("n").sum().alias("n_turns"),
                    pl.len().cast(pl.Int64).alias("n_distinct_texts"))
               .with_columns((pl.col("n_turns")
                              - pl.col("n_distinct_texts"))
                             .alias("n_dupes"))
               .filter(pl.col("n_dupes") > 0))
        return out.select(_OUT.names).to_arrow().cast(_OUT)

    return (turns.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p").map_groups(
                lambda t: merge(t.drop_columns(["p"])),
                batch_format="pyarrow"))


def sentence_dedup(docs: Dataset, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   num_partitions: int | None = None) -> Dataset:
    """Corpus-wide sentence-level exact dedup (the C4 "discard every
    repeated three-sentence span" family, at sentence granularity): a
    sentence survives only at its globally FIRST occurrence — minimum
    ``(doc_id, position)`` — and every later copy anywhere in the
    corpus is dropped. Output per doc (docs left with ≥ 1 surviving
    sentence): ``(doc_id, n_sents, n_kept, text_dedup)`` with the
    survivors rejoined in order by ``'. '``.

    Contract (mirrored verbatim by the SQL oracle): sentences are the
    ``'.'``-split fragments, trimmed of spaces, empties dropped;
    positions are 0-based pre-drop split indices; first-occurrence
    identity is exact text equality (keyed by full 128-bit md5 — the
    witness exchange ships 32-char digests + a packed int64, never
    sentence text).

    Plan: (1) winner pass — split/explode in-block, md5 per in-block
    DISTINCT sentence, block-local min-witness combiner, ONE
    digest-keyed Min groupby (bounded by distinct sentences);
    (2) verify pass — re-split (cheaper than materializing the
    exploded corpus), co-partition sentences with winners by a
    digest-derived partition id, keep rows whose packed witness equals
    the winner; (3) one doc-keyed exchange of the SURVIVING sentences
    only, per-partition vectorized reassembly. Witness packing is
    ``doc_id * 2^20 + pos`` (≤ 2^20 sentences per doc, ids < 2^43 —
    asserted)."""
    import hashlib

    import numpy as np
    import polars as pl

    from ray.data.aggregate import Min

    from uckg_ray.partitioning import default_partitions, key_partition_ids

    n_parts = num_partitions or default_partitions()
    POS_BITS = 20

    def _explode(b: pa.Table) -> pl.DataFrame:
        df = (pl.from_arrow(b.select([id_col, text_col]))
              .with_columns(pl.col(text_col).str.split(".").alias("_s"))
              .with_columns(n_raw=pl.col("_s").list.len()))
        ex = (df.select(id_col, "_s")
              .with_row_index("_r")
              .explode("_s")
              .with_columns(
                  pos=pl.int_range(pl.len()).over("_r"),
                  sent=pl.col("_s").str.strip_chars(" "))
              .filter(pl.col("sent") != "")
              .select(id_col, "pos", "sent"))
        return ex

    def _digests(sents: pl.Series) -> tuple[np.ndarray, np.ndarray]:
        """(hex digest, first-8-bytes int64 partition key) per row —
        md5 runs once per in-block DISTINCT sentence."""
        uniq = sents.unique().to_list()
        dmap = {s: hashlib.md5(s.encode()).hexdigest() for s in uniq}
        hexes = np.array([dmap[s] for s in sents.to_list()], dtype=object)
        pk = np.array([int(h[:16], 16) & 0x7FFFFFFFFFFFFFFF
                       for h in hexes], dtype=np.int64)
        return hexes, pk

    def win_partial(b: pa.Table) -> pa.Table:
        out_schema = pa.schema([("h", pa.string()), ("w", pa.int64())])
        if b.num_rows == 0:
            return out_schema.empty_table()
        ex = _explode(b)
        if ex.height == 0:
            return out_schema.empty_table()
        ids = ex[id_col].to_numpy()
        assert ids.max() < (1 << (63 - POS_BITS)), "doc_id overflows packing"
        w = ids.astype(np.int64) * (1 << POS_BITS) \
            + ex["pos"].to_numpy().astype(np.int64)
        hexes, _ = _digests(ex["sent"])
        g = (pl.DataFrame({"h": hexes.astype(str), "w": w})
             .group_by("h").agg(pl.col("w").min()))
        return pa.table({"h": g["h"].to_arrow().cast(pa.string()),
                         "w": g["w"].to_arrow().cast(pa.int64())})

    winners = (docs.map_batches(win_partial, batch_format="pyarrow",
                                batch_size=None)
               .groupby("h").aggregate(Min("w", alias_name="w")))

    _SENT = pa.schema([("h", pa.string()), ("w", pa.int64()),
                       ("doc", pa.int64()), ("pos", pa.int64()),
                       ("sent", pa.string()), ("n_sents", pa.int64()),
                       ("side", pa.int8()), ("p", pa.int32())])

    def sent_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _SENT.empty_table()
        ex = _explode(b)
        if ex.height == 0:
            return _SENT.empty_table()
        ex = ex.with_columns(
            n_sents=pl.len().cast(pl.Int64).over(id_col))
        ids = ex[id_col].to_numpy().astype(np.int64)
        w = ids * (1 << POS_BITS) + ex["pos"].to_numpy().astype(np.int64)
        hexes, pk = _digests(ex["sent"])
        return pa.table({
            "h": pa.array(hexes.astype(str), pa.string()),
            "w": pa.array(w, pa.int64()),
            "doc": pa.array(ids, pa.int64()),
            "pos": pa.array(ex["pos"].to_numpy().astype(np.int64),
                            pa.int64()),
            "sent": ex["sent"].to_arrow().cast(pa.string()),
            "n_sents": ex["n_sents"].to_arrow(),
            "side": pa.array(np.zeros(len(ids), np.int8), pa.int8()),
            "p": pa.array(key_partition_ids(pk, n_parts), pa.int32())})

    def tag_winner(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _SENT.empty_table()
        hexes = b.column("h").to_pylist()
        pk = np.array([int(h[:16], 16) & 0x7FFFFFFFFFFFFFFF
                       for h in hexes], dtype=np.int64)
        n = len(hexes)
        return pa.table({
            "h": b.column("h").cast(pa.string()),
            "w": b.column("w").cast(pa.int64()),
            "doc": pa.nulls(n, pa.int64()),
            "pos": pa.nulls(n, pa.int64()),
            "sent": pa.nulls(n, pa.string()),
            "n_sents": pa.nulls(n, pa.int64()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "p": pa.array(key_partition_ids(pk, n_parts), pa.int32())})

    _KEPT = pa.schema([("doc", pa.int64()), ("pos", pa.int64()),
                       ("sent", pa.string()), ("n_sents", pa.int64()),
                       ("q", pa.int32())])

    def keep_survivors(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _KEPT.empty_table()
        df = pl.from_arrow(part)
        wins = (df.filter(pl.col("side") == 1)
                .select("h", mw="w"))
        rows = (df.filter(pl.col("side") == 0)
                .join(wins, on="h", how="inner")
                .filter(pl.col("w") == pl.col("mw")))
        doc = rows["doc"].to_numpy().astype(np.int64)
        return pa.table({
            "doc": pa.array(doc, pa.int64()),
            "pos": rows["pos"].to_arrow().cast(pa.int64()),
            "sent": rows["sent"].to_arrow().cast(pa.string()),
            "n_sents": rows["n_sents"].to_arrow().cast(pa.int64()),
            "q": pa.array(key_partition_ids(doc, n_parts), pa.int32())})

    _OUT = pa.schema([("doc_id", pa.int64()), ("n_sents", pa.int64()),
                      ("n_kept", pa.int64()), ("text_dedup", pa.string())])

    def reassemble(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        out = (pl.from_arrow(part)
               .sort(["doc", "pos"])
               .group_by("doc", maintain_order=True)
               .agg(pl.col("n_sents").first(),
                    pl.len().cast(pl.Int64).alias("n_kept"),
                    pl.col("sent").str.join(". ").alias("text_dedup"))
               .rename({"doc": "doc_id"})
               .select(["doc_id", "n_sents", "n_kept", "text_dedup"]))
        return out.to_arrow().cast(_OUT)

    sents = docs.map_batches(sent_rows, batch_format="pyarrow",
                             batch_size=None)
    wtag = winners.map_batches(tag_winner, batch_format="pyarrow",
                               batch_size=None)
    return (sents.union(wtag)
            .groupby("p")
            .map_groups(lambda t: keep_survivors(t.drop_columns(["p"])),
                        batch_format="pyarrow")
            .groupby("q")
            .map_groups(lambda t: reassemble(t.drop_columns(["q"])),
                        batch_format="pyarrow"))


def doc_novelty(docs: Dataset, *, n: int = 8,
                num_partitions: int = 32) -> Dataset:
    """Per-document corpus novelty: of a doc's distinct word
    ``n``-grams, how many appear in NO other document —
    ``(doc_id, n_grams, n_novel)``, exact integers (novel ratio =
    n_novel / n_grams downstream). The inverse of the duplication
    signals: near-duplicate and boilerplate docs score low, fresh
    content scores high — a standard curation feature next to quality
    and repetition scores. Docs shorter than ``n`` tokens have no
    grams and are absent (the SQL oracle mirrors this).

    All-Rust gram construction (token explode + per-doc shifted
    concat_str — no Python loop over rows or grams), per-doc distinct
    in-block (a doc lives in one block, so (doc, gram) rows are
    globally unique), ONE gram-keyed exchange: each partition counts
    a gram's distinct docs and credits docs whose gram count is 1;
    per-doc partials then fold through a doc-keyed Sum merge."""
    import polars as pl

    from ray.data.aggregate import Sum

    _G = pa.schema([("doc_id", pa.int64()), ("gram", pa.string()),
                    ("p", pa.int32())])

    def grams(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _G.empty_table()
        ex = (pl.from_arrow(b.select(["doc_id", "text"]))
              .with_columns(tok=pl.col("text").str.split(" "))
              .drop("text")
              .explode("tok"))
        parts = [pl.col("tok")] + \
            [pl.col("tok").shift(-k).over("doc_id") for k in range(1, n)]
        g = (ex.with_columns(gram=pl.concat_str(parts, separator=" "))
             .drop_nulls("gram")
             .select("doc_id", "gram")
             .unique()
             .with_columns(p=(pl.col("gram").hash(seed=0) % num_partitions)
                           .cast(pl.Int32)))
        return g.select(["doc_id", "gram", "p"]).to_arrow().cast(_G)

    _PART = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                       ("n_novel", pa.int64())])

    def fold_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _PART.empty_table()
        df = pl.from_arrow(part.select(["doc_id", "gram"]))
        g = (df.with_columns(
                nd=pl.len().over("gram"))
             .group_by("doc_id")
             .agg(pl.len().cast(pl.Int64).alias("n_grams"),
                  (pl.col("nd") == 1).sum().cast(pl.Int64)
                  .alias("n_novel")))
        return g.select(["doc_id", "n_grams", "n_novel"]) \
            .to_arrow().cast(_PART)

    return (docs.select_columns(["doc_id", "text"])
            .map_batches(grams, batch_format="pyarrow", batch_size=None)
            .groupby("p")
            .map_groups(lambda t: fold_partition(t.drop_columns(["p"])),
                        batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_grams", alias_name="n_grams"),
                       Sum("n_novel", alias_name="n_novel")))


def tool_skipgrams(turns: Dataset, *, window: int = 5,
                   num_partitions: int | None = None) -> Dataset:
    """Skip-gram tool co-usage mining: (tool_a, tool_b, n_pairs) for
    every ordered pair of tool invocations in the SAME conversation at
    most ``window`` turns apart — the workflow-pattern generalization
    of the adjacent-only ``tool_sequences`` bigrams (an agent that runs
    a scanner and, a few turns later, an exploit tool shows up here but
    not in adjacent bigrams). Pairs are (earlier tool, later tool).

    The scan filters to tool turns at the read (tiny fraction of the
    log); one conversation-keyed exchange; each partition runs a
    vectorized inequality join (turn distance ∈ (0, window]) — volume
    is bounded by tool-turns-per-conversation², not the log — and
    folds to pair partials; one pair-vocabulary-bounded Sum merge."""
    import polars as pl

    from uckg_ray.partitioning import default_partitions, key_partition_ids

    n_parts = num_partitions or default_partitions()
    _T = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64()),
                    ("tool", pa.string()), ("q", pa.int32())])

    def tool_rows(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(["conv_id", "turn_idx", "role",
                                      "tool"]))
              .filter((pl.col("role") == "tool") & (pl.col("tool") != ""))
              .select("conv_id",
                      pl.col("turn_idx").cast(pl.Int64), "tool"))
        if df.height == 0:
            return _T.empty_table()
        h = df["conv_id"].hash(seed=0).to_numpy()
        return df.to_arrow().cast(_T.remove(3)).append_column(
            "q", pa.array((h % n_parts).astype("int32"), pa.int32()))

    _OUT = pa.schema([("tool_a", pa.string()), ("tool_b", pa.string()),
                      ("n_pairs", pa.int64())])

    def pairs_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(["conv_id", "turn_idx", "tool"]))
        right = df.rename({"turn_idx": "t2", "tool": "tool_b"})
        g = (df.join_where(
                 right,
                 pl.col("conv_id") == pl.col("conv_id_right"),
                 pl.col("t2") > pl.col("turn_idx"),
                 pl.col("t2") <= pl.col("turn_idx") + window)
             .group_by(["tool", "tool_b"])
             .agg(pl.len().cast(pl.Int64).alias("n_pairs"))
             .rename({"tool": "tool_a"}))
        return g.select(["tool_a", "tool_b", "n_pairs"]) \
            .to_arrow().cast(_OUT)

    from ray.data.aggregate import Sum

    return (turns.select_columns(["conv_id", "turn_idx", "role", "tool"])
            .map_batches(tool_rows, batch_format="pyarrow",
                         batch_size=None)
            .groupby("q")
            .map_groups(lambda t: pairs_partition(t.drop_columns(["q"])),
                        batch_format="pyarrow")
            .groupby(["tool_a", "tool_b"])
            .aggregate(Sum("n_pairs", alias_name="n_pairs")))
