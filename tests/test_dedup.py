"""Dedup operators: exact, jaccard, minhash recall, simhash property."""

import itertools

import pandas as pd
import pytest


def _docs_ds(ray, texts, sources=None):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "source": sources or ["s0"] * len(texts),
    }))


def test_exact_dedup(ray_session):
    from uckg_ray.stages.dedup import exact_dedup
    ds = _docs_ds(ray_session, ["a b c", "d e f", "a b c", "a b c"])
    got = {r["text_hash"]: r["doc_id"] for r in exact_dedup(ds).take_all()}
    assert sorted(got.values()) == [0, 1]  # min doc_id kept per text


def test_token_jaccard_exact(ray_session):
    from uckg_ray.stages.dedup import token_jaccard_pairs
    texts = ["a b c d", "a b c e", "x y z w", "a b c d"]
    ds = _docs_ds(ray_session, texts)
    rows = token_jaccard_pairs(ds, num=3, den=5).take_all()
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["uni"]) for r in rows}
    # brute force oracle
    sets = [set(t.split()) for t in texts]
    want = {}
    for i, j in itertools.combinations(range(4), 2):
        inter = len(sets[i] & sets[j])
        uni = len(sets[i] | sets[j])
        if inter and 5 * inter >= 3 * uni:
            want[(i, j)] = (inter, uni)
    assert got == want


def test_ngram_jaccard_exact(ray_session):
    from uckg_ray.stages.dedup import ngram_jaccard_pairs
    texts = ["the quick brown fox", "the quick brown cat",
             "completely different", "the quick brown fox", "tiny"]
    ds = _docs_ds(ray_session, texts)
    rows = ngram_jaccard_pairs(ds, n=5, num=1, den=2).take_all()
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["uni"]) for r in rows}
    sets = [{t[i:i + 5] for i in range(len(t) - 4)} for t in texts]
    want = {}
    for i, j in itertools.combinations(range(len(texts)), 2):
        inter = len(sets[i] & sets[j])
        uni = len(sets[i] | sets[j])
        if uni and 2 * inter >= uni:
            want[(i, j)] = (inter, uni)
    assert got == want
    assert all((4 not in p) for p in got)  # len<5 doc never pairs


def test_minhash_recall_vs_exact(ray_session):
    """MinHash-LSH must find the clear near-duplicates (high-J pairs)."""
    from uckg_ray.stages.dedup import MinHasher, minhash_lsh_pairs
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = [" ".join(base)]
    texts.append(" ".join(base[:-1] + ["changed"]))     # ~0.86 shingle-J
    texts.append(" ".join(reversed(base)))              # same words, diff shingles
    texts.append("totally different words here now ok yes")
    ds = _docs_ds(ray_session, texts)
    got = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_pairs(ds, tau=0.5).take_all()}
    # exact shingle-jaccard oracle
    h = MinHasher()
    sh = [h.shingles(t) for t in texts]
    want = set()
    for i, j in itertools.combinations(range(len(texts)), 2):
        inter = len(sh[i] & sh[j])
        if inter and inter / len(sh[i] | sh[j]) >= 0.5:
            want.add((i, j))
    assert (0, 1) in want
    assert got == want  # verification stage makes candidates exact


def test_minhash_never_streams_corpus_through_driver(ray_session):
    """The docs Dataset must be consumed only inside Ray tasks — any
    driver-side pull (iter_batches / take_all / iter_rows / to_pandas)
    on the corpus is a scale-killer at 100 TB."""
    from uckg_ray.stages.dedup import minhash_lsh_pairs
    texts = ["alpha beta gamma delta epsilon zeta eta theta",
             "alpha beta gamma delta epsilon zeta eta changed",
             "totally different words here now ok yes indeed"]
    ds = _docs_ds(ray_session, texts)

    def forbidden(*a, **kw):
        raise AssertionError("driver-side corpus pull")

    for m in ("iter_batches", "take_all", "iter_rows", "to_pandas",
              "take", "to_arrow_refs"):
        setattr(ds, m, forbidden)
    got = {(r["doc_a"], r["doc_b"])
           for r in minhash_lsh_pairs(ds, tau=0.5).take_all()}
    assert got == {(0, 1)}


def test_simhash_never_streams_corpus_through_driver(ray_session):
    """Signatures must reach the verify via the sharded shuffle join,
    never a driver-side gather (round-2 weak residue, now fixed). The
    patch is CLASS-wide so derived datasets (the signature table — the
    old gather target) are covered too, for the whole pipeline-build
    phase including every .materialize()."""
    import ray.data
    from uckg_ray.stages.dedup import simhash64, simhash_pairs
    texts = ["a b c d e f g h", "a b c d e f g x",
             "completely different again thing"]
    sigs = [simhash64(t.split(" ")) for t in texts]
    want = {(i, j) for i, j in itertools.combinations(range(len(texts)), 2)
            if bin(sigs[i] ^ sigs[j]).count("1") <= 3}
    ds = _docs_ds(ray_session, texts)

    def forbidden(*a, **kw):
        raise AssertionError("driver-side corpus pull")

    patched = ("iter_batches", "take_all", "iter_rows", "to_pandas", "take")
    saved = {m: getattr(ray.data.Dataset, m) for m in patched}
    for m in patched:
        setattr(ray.data.Dataset, m, forbidden)
    try:
        out = simhash_pairs(ds, max_hamming=3)
    finally:
        for m, fn in saved.items():
            setattr(ray.data.Dataset, m, fn)
    rows = out.take_all()
    assert {(r["doc_a"], r["doc_b"]) for r in rows} == want


def test_simhash_pairs_property(ray_session):
    from uckg_ray.stages.dedup import simhash64, simhash_pairs
    texts = ["a b c d e f g h", "a b c d e f g x",  # near-identical token sets
             "q w e r t y u i", "completely different again thing"]
    ds = _docs_ds(ray_session, texts)
    rows = simhash_pairs(ds, max_hamming=3).take_all()
    sigs = [simhash64(t.split(" ")) for t in texts]
    # every reported pair truly has hamming <= 3
    for r in rows:
        d = bin(sigs[r["doc_a"]] ^ sigs[r["doc_b"]]).count("1")
        assert d <= 3
    # pigeonhole recall: every true pair with hamming <= 3 is reported
    want = {(i, j) for i, j in itertools.combinations(range(len(texts)), 2)
            if bin(sigs[i] ^ sigs[j]).count("1") <= 3}
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert got == want


def test_minhash_join_path_identical_and_driverless(ray_session):
    """Forcing the pair ⨝ shingles shuffle-join verification
    (broadcast_max_candidates=0) must produce the exact same pair set as
    the broadcast path, with NO driver-side pull anywhere in the build —
    class-wide patch, so the candidate-state gather the broadcast path
    uses (small.iter_batches) would trip it."""
    import ray.data
    from uckg_ray.stages.dedup import minhash_lsh_pairs
    texts = ["alpha beta gamma delta epsilon zeta eta theta",
             "alpha beta gamma delta epsilon zeta eta changed",
             "alpha beta gamma delta epsilon zeta eta theta iota",
             "totally different words here now ok yes indeed"]
    ds = _docs_ds(ray_session, texts)
    want = {(r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(ds, tau=0.5).take_all()}
    assert want  # the fixture must exercise the verify

    def forbidden(*a, **kw):
        raise AssertionError("driver-side corpus pull")

    patched = ("iter_batches", "take_all", "iter_rows", "to_pandas", "take")
    saved = {m: getattr(ray.data.Dataset, m) for m in patched}
    for m in patched:
        setattr(ray.data.Dataset, m, forbidden)
    try:
        out = minhash_lsh_pairs(ds, tau=0.5, broadcast_max_candidates=0)
    finally:
        for m, fn in saved.items():
            setattr(ray.data.Dataset, m, fn)
    got = {(r["doc_a"], r["doc_b"]) for r in out.take_all()}
    assert got == want


def test_neardup_canonical_join_path_identical(ray_session):
    """broadcast_max=0 forces the co-partitioned map application; the
    output must be row-identical to the broadcast path."""
    import ray.data
    from uckg_ray.stages.dedup import neardup_canonical_docs
    docs = _docs_ds(ray_session, ["a"] * 6)
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": [0, 1, 3], "doc_b": [1, 2, 4]}))
    rows = neardup_canonical_docs(docs, pairs, broadcast_max=0).take_all()
    got = {r["doc_id"]: (r["canonical_id"], r["is_dup"]) for r in rows}
    assert got == {0: (0, False), 1: (0, True), 2: (0, True),
                   3: (3, False), 4: (3, True), 5: (5, False)}


def test_fingerprint_normalization(ray_session):
    from uckg_ray.stages.dedup import fingerprints
    ds = _docs_ds(ray_session, ["Hello,  World!", "hello world"])
    rows = fingerprints(ds).take_all()
    fps = {r["doc_id"]: r["fingerprint"] for r in rows}
    assert fps[0] == fps[1]  # punctuation/case/extra-space collapse


def test_neardup_canonical_docs(ray_session):
    """Pairs → clusters → one canonical (min id) per cluster; docs in no
    pair map to themselves."""
    import ray.data
    from uckg_ray.stages.dedup import neardup_canonical_docs
    docs = _docs_ds(ray_session, ["a"] * 6)  # texts unused by the operator
    pairs = ray.data.from_pandas(pd.DataFrame({
        "doc_a": [0, 1, 3], "doc_b": [1, 2, 4]}))  # {0,1,2} and {3,4}; 5 alone
    rows = neardup_canonical_docs(docs, pairs).take_all()
    got = {r["doc_id"]: (r["canonical_id"], r["is_dup"]) for r in rows}
    assert got == {0: (0, False), 1: (0, True), 2: (0, True),
                   3: (3, False), 4: (3, True), 5: (5, False)}


def test_corpus_delta_dedup(ray_session):
    """New-batch docs are known iff their NORMALIZED fingerprint exists
    in the corpus (case/punct/whitespace-invariant); novel text is new;
    corpus duplicates don't double-mark."""
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.dedup import corpus_delta_dedup

    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["hello world", "hello world", "rare document"]}))
    new = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": ["  HELLO,   world!! ",     # normalizes to corpus text
                 "rare DOCUMENT",           # case-invariant match
                 "genuinely novel text"]}))
    got = {r["doc_id"]: r["is_known"]
           for r in corpus_delta_dedup(new, corpus).take_all()}
    assert got == {10: 1, 11: 1, 12: 0}


def test_containment_asymmetric(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.dedup import containment_pairs

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "source": ["s", "s", "s"],
        # doc 1 ⊂ doc 2 (containment 1.0, Jaccard only 3/8);
        # doc 3 shares nothing
        "text": ["a b c",
                 "a b c d e f g h",
                 "x y z"],
    })
    got = containment_pairs(ray.data.from_arrow(t).repartition(2),
                            num=9, den=10).take_all()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["inter"] == 3 and r["min_size"] == 3
