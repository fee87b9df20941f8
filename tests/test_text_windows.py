"""Text analysis + window operators: quick semantic checks."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_quality_and_lang(ray_session):
    import ray.data
    from uckg_ray.stages.text import lang_id, quality_stats
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the cat and the dog in the house for fun on it",
                 "der hund ist nicht mit der katze auf zu",
                 "x x x x x x x x x x"],
    }))
    q = {r["doc_id"]: r for r in quality_stats(ds).take_all()}
    assert q[0]["is_quality"] is True
    assert q[2]["is_quality"] is False  # 10 tokens, 1 unique → repetitive
    langs = {r["doc_id"]: r["lang_guess"] for r in lang_id(ds).take_all()}
    assert langs[0] == "en" and langs[1] == "de" and langs[2] == "unk"


def test_tumbling_window(ray_session):
    import ray.data
    from uckg_ray.stages.windows import tumbling_window_agg
    ts = pd.to_datetime(["2024-01-01 00:10", "2024-01-01 00:50",
                         "2024-01-01 01:10", "2024-01-01 00:20"])
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 2], "ts": ts,
        "value": [1.00, 2.00, 3.00, 4.50]}))
    rows = {(r["user_id"], str(r["window_start"])):
            (r["n_events"], r["sum_value_c100"])
            for r in tumbling_window_agg(ds).take_all()}
    assert rows[(1, "2024-01-01 00:00:00")] == (2, 300)
    assert rows[(1, "2024-01-01 01:00:00")] == (1, 300)
    assert rows[(2, "2024-01-01 00:00:00")] == (1, 450)


def test_sessionize(ray_session):
    import ray.data
    from uckg_ray.stages.windows import sessionize
    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                         "2024-01-01 02:00"])
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": [7, 7, 7], "ts": ts, "value": [0.0, 0.0, 0.0]}))
    rows = sessionize(ds, gap_minutes=30).take_all()
    assert len(rows) == 2
    n_by_start = {r["session_start_us"]: r["n_events"] for r in rows}
    assert sorted(n_by_start.values()) == [1, 2]


def test_wav_decode_real_parse(ray_session):
    """WavDecoder genuinely chunk-walks RIFF: the LIST chunk before
    'data' and the odd-length pad byte must not leak into features;
    a 16-bit stereo container decodes frame counts via block align."""
    import hashlib

    import pytest
    import ray.data

    from uckg_ray.stages.multimodal import (WavDecoder, attach_wav_payload,
                                            decode_wav, wav_bytes)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["abcde", ""]}))  # odd + empty data
    rows = {r["doc_id"]: r
            for r in decode_wav(attach_wav_payload(ds),
                                concurrency=1).take_all()}
    assert rows[0]["n_samples"] == 5                      # not the pad byte
    assert rows[0]["data_md5"] == hashlib.md5(b"abcde").hexdigest()
    assert rows[1]["n_samples"] == 0
    assert (rows[0]["n_channels"], rows[0]["sample_rate"],
            rows[0]["bits_per_sample"]) == (1, 16000, 8)
    # 16-bit stereo: n_samples counts frames (data bytes / block align)
    pcm = bytes(range(16))
    f = WavDecoder.parse(wav_bytes(pcm, channels=2, bits=16, sample_rate=8000))
    assert (f["n_samples"], f["n_channels"], f["sample_rate"],
            f["bits_per_sample"]) == (4, 2, 8000, 16)
    assert f["data_md5"] == hashlib.md5(pcm).hexdigest()
    # malformed payloads: strict raises, lenient yields null features
    with pytest.raises(ValueError):
        WavDecoder.parse(b"RIFFxxxxJUNK")
    bad = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([9], pa.int64()),
         "payload": pa.array([b"not a wav"], pa.binary())}))
    r = bad.map_batches(WavDecoder, fn_constructor_kwargs={"strict": False},
                        batch_format="pyarrow", concurrency=1).take_all()[0]
    assert r["n_samples"] is None and r["data_md5"] is None


def test_ppm_decode_real_parse():
    """PpmDecoder parses the P6 header (comment skipping, dims, maxval)
    and extracts exactly width*height*3 pixel bytes."""
    import hashlib

    import pytest

    from uckg_ray.stages.multimodal import PpmDecoder, ppm_bytes
    px = bytes(range(24))                     # 4x2 RGB
    f = PpmDecoder.parse(ppm_bytes(px, 4, 2))
    assert (f["width"], f["height"], f["n_pixels"]) == (4, 2, 8)
    assert f["mean_value"] == int(sum(px) / len(px))
    assert f["pixel_md5"] == hashlib.md5(px).hexdigest()
    with pytest.raises(ValueError):
        PpmDecoder.parse(ppm_bytes(px, 4, 2)[:-1])   # truncated pixels
    with pytest.raises(ValueError):
        PpmDecoder.parse(b"P5\n1 1\n255\n\x00")      # not P6


def test_winnow_fingerprints(ray_session):
    """Winnowing: distinct k-gram-window minima; short docs collapse."""
    import hashlib

    import ray.data

    from uckg_ray.stages.text import winnow_fingerprints

    def h(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")

    texts = ["abcdefghijk", "short", ""]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    got = {}
    for r in winnow_fingerprints(ds, k=8, w=4).take_all():
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    # doc 0: grams at 0..3, windows of 4 -> one window = global min
    grams = [texts[0][j:j + 8] for j in range(4)]
    assert got[0] == {min(h(g) for g in grams)}
    # doc 1 shorter than k: single gram = whole text
    assert got[1] == {h("short")}
    # empty doc: md5 of ""
    assert got[2] == {h("")}


def test_hopping_window_agg(ray_session):
    """Each event lands in exactly size/hop overlapping windows."""
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.windows import hopping_window_agg

    hop_us = 15 * 60 * 1_000_000
    ts0 = 40 * hop_us + 123  # arbitrary epoch offset inside a hop
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([ts0], pa.timestamp("us")),
        "value": pa.array([2.5], pa.float64())}))
    rows = hopping_window_agg(ds, size_minutes=60, hop_minutes=15).take_all()
    starts = sorted(r["window_start_us"] for r in rows)
    base = (ts0 // hop_us) * hop_us
    assert starts == [base - 3 * hop_us, base - 2 * hop_us,
                      base - hop_us, base]
    assert all(r["n_events"] == 1 and r["sum_value_c100"] == 250
               for r in rows)
    import pytest
    with pytest.raises(ValueError):
        hopping_window_agg(ds, size_minutes=50, hop_minutes=15)


def test_tfidf_components(ray_session):
    import ray.data

    from uckg_ray.stages.text import tfidf_components

    ds = ray.data.from_items([
        {"doc_id": 0, "text": "a b a"},
        {"doc_id": 1, "text": "a c"},
    ])
    got = {(r["doc_id"], r["term"]): (r["tf"], r["df"], r["n_docs"])
           for r in tfidf_components(ds).take_all()}
    assert got == {
        (0, "a"): (2, 2, 2), (0, "b"): (1, 1, 2),
        (1, "a"): (1, 2, 2), (1, "c"): (1, 1, 2)}


def test_ngram_contamination(ray_session):
    import ray.data

    from uckg_ray.stages.text import ngram_contamination

    # doc 10 (test: %10==0) shares the 3-gram "w x y" with train docs 1
    # and 2 (twice in doc 2's text but distinct-per-doc → counted once),
    # plus "x y z" with doc 1; doc 20 shares nothing long enough
    ds = ray.data.from_items([
        {"doc_id": 10, "text": "w x y z q"},
        {"doc_id": 20, "text": "p q r"},
        {"doc_id": 1, "text": "a w x y z b"},
        {"doc_id": 2, "text": "w x y c w x y"},
        {"doc_id": 3, "text": "nothing shared here"},
    ])
    got = {(r["test_doc"], r["train_doc"]): r["overlap"]
           for r in ngram_contamination(ds, n=3).take_all()}
    assert got == {(10, 1): 2, (10, 2): 1}


def test_ngram_counts(ray_session):
    import ray.data

    from uckg_ray.stages.text import ngram_counts

    ds = ray.data.from_items([
        {"doc_id": 0, "text": "a b a b"},
        {"doc_id": 1, "text": "a b"},
        {"doc_id": 2, "text": "solo"},
    ])
    got = {r["ngram"]: r["count"] for r in ngram_counts(ds, n=2).take_all()}
    assert got == {"a b": 3, "b a": 1}


def test_frame_sampler_expansion(ray_session):
    """1→N frame expansion: every stride-th fixed-width frame becomes a
    row; short payloads yield no frames; hashes are md5_number_upper."""
    import hashlib

    import pandas as pd
    import ray.data
    from uckg_ray.stages.multimodal import attach_binary_payload, sample_frames
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a" * 40, "xy"]})
    out = sample_frames(attach_binary_payload(ray.data.from_pandas(df)),
                        stride=1, frame_chars=16).take_all()
    # doc 1: 40 // 16 = 2 frames; doc 2: none
    assert sorted((r["doc_id"], r["frame_idx"]) for r in out) == \
        [(1, 0), (1, 1)]
    want = int.from_bytes(hashlib.md5(("a" * 16).encode()).digest()[:8],
                          "little")
    assert all(r["frame_h"] == want for r in out)


def test_scrub_pii(ray_session):
    import ray.data
    from uckg_ray.stages.text import scrub_pii
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["mail bob@example.com or 10.1.2.3 now",
                 "ssn 123-45-6789 phone 555-123-4567",
                 "nothing here"]}))
    rows = {r["doc_id"]: r for r in scrub_pii(ds).take_all()}
    assert rows[0]["clean_text"] == "mail [EMAIL] or [IP] now"
    assert rows[0]["n_email"] == 1 and rows[0]["n_ip"] == 1
    assert rows[1]["clean_text"] == "ssn [SSN] phone [PHONE]"
    assert rows[1]["n_ssn"] == 1 and rows[1]["n_phone"] == 1
    assert rows[2]["clean_text"] == "nothing here"
    assert rows[2]["n_email"] == rows[2]["n_ip"] == 0


def test_chunk_documents(ray_session):
    import ray.data
    from uckg_ray.stages.text import chunk_documents
    toks = [f"w{i}" for i in range(10)]
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1], "text": [" ".join(toks), "short"]}))
    rows = chunk_documents(ds, size=4, stride=3).take_all()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
           for r in rows}
    # doc 0: starts 0,3,6,9 over 10 tokens
    assert got[(0, 0)] == ("w0 w1 w2 w3", 4)
    assert got[(0, 1)] == ("w3 w4 w5 w6", 4)
    assert got[(0, 2)] == ("w6 w7 w8 w9", 4)
    assert got[(0, 3)] == ("w9", 1)
    assert got[(1, 0)] == ("short", 1)
    assert len(got) == 5


def test_embedding_centroids(ray_session):
    import ray.data
    from uckg_ray.stages.similarity import embedding_centroids
    M = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.5]], dtype=np.float32)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [r.tolist() for r in M],
        "label": np.array([7, 7, 9], np.int32)}))
    rows = {(r["label"], r["dim"]): (r["n"], r["sum_q"])
            for r in embedding_centroids(ds).take_all()}
    assert rows[(7, 1)] == (2, 4_000_000)      # 1e6 + 3e6
    assert rows[(7, 2)] == (2, 6_000_000)
    assert rows[(9, 1)] == (1, 5_000_000)
    assert rows[(9, 2)] == (1, 6_500_000)


def test_top_terms_per_group(ray_session):
    import ray.data
    from uckg_ray.stages.text import top_terms_per_group
    df = pd.DataFrame({
        "doc_id": range(6),
        "source": ["a", "a", "a", "b", "b", "b"],
        "text": ["x y x", "x z", "y x", "q q q", "q r", "r s"]})
    rows = top_terms_per_group(ray.data.from_pandas(df), k=2).take_all()
    got = {(r["source"], r["rk"]): (r["tok"], r["n"]) for r in rows}
    # a: x=4, y=2, z=1 → top2 x, y;  b: q=4, r=2, s=1 → top2 q, r
    assert got == {("a", 1): ("x", 4), ("a", 2): ("y", 2),
                   ("b", 1): ("q", 4), ("b", 2): ("r", 2)}


def test_repetition_stats_semantics(ray_session):
    """3-gram repetition profile: a fully repetitive doc, a unique doc,
    and sub-gram-width docs (zeros)."""
    import ray.data
    from uckg_ray.stages.text import repetition_stats
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b a b a b",      # 6 grams, 2 distinct
                 "v w x y z",            # 3 grams, all distinct
                 "a b",                  # shorter than gram width
                 ""]}))
    rows = {r["doc_id"]: r for r in repetition_stats(ds, n=3).take_all()}
    assert (rows[0]["n_grams"], rows[0]["n_distinct_grams"],
            rows[0]["max_gram_count"]) == (6, 2, 3)
    assert (rows[1]["n_grams"], rows[1]["n_distinct_grams"],
            rows[1]["max_gram_count"]) == (3, 3, 1)
    assert (rows[2]["n_tokens"], rows[2]["n_grams"]) == (2, 0)
    assert (rows[3]["n_tokens"], rows[3]["n_grams"]) == (1, 0)


def test_token_freq_histogram(ray_session):
    import ray.data
    from uckg_ray.stages.text import token_freq_histogram
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a a b", "a c"]}))      # a:3, b:1, c:1
    rows = {r["freq"]: r["n_tokens"]
            for r in token_freq_histogram(ds).take_all()}
    assert rows == {3: 1, 1: 2}


def test_fingerprint_overlap(ray_session):
    """Shared winnow fingerprints counted once per source pair; pairs
    ordered src_a < src_b; disjoint sources absent."""
    import ray.data
    from uckg_ray.stages.text import fingerprint_overlap
    # k=3, w=1 → fps = distinct 3-gram hashes; texts chosen so A∩B
    # share exactly the grams of "xyz" (1 fp), A∩C nothing
    ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "source": ["A", "B", "C"],
        "text": ["xyzq", "axyz", "qrstu"]}))
    rows = {(r["src_a"], r["src_b"]): r["n_shared_fps"]
            for r in fingerprint_overlap(ds, k=3, w=1).take_all()}
    assert rows == {("A", "B"): 1}   # the md5 of "xyz" only


def test_event_funnel(ray_session):
    """Strictly-after chaining: u1 converts fully; u2's purchase
    precedes the click, so it must not count; u3 never clicks."""
    import ray.data
    from uckg_ray.stages.windows import event_funnel
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:01", "2024-01-01 00:02",  # u1
        "2024-01-01 00:00", "2024-01-01 00:02", "2024-01-01 00:01",  # u2
        "2024-01-01 00:00"])                                         # u3
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 2, 3],
        "event_type": ["view", "click", "purchase",
                       "view", "click", "purchase", "view"],
        "ts": ts}))
    rows = {r["step"]: r["n_users"] for r in event_funnel(ds).take_all()}
    assert rows == {"view": 3, "click": 2, "purchase": 1}


def test_pagerank_int_hand_computed(ray_session):
    """3-node chain A→{B,C}, B→C plus a literal edge (excluded from the
    link graph; its subject D still ranks as an isolated node). Ranks
    after 3 fixed-point iterations verified by hand."""
    import ray.data
    from uckg_ray.stages.graph import pagerank_int
    ds = ray.data.from_arrow(pa.table({
        "subj": pa.array(["A", "A", "B", "D"]),
        "pred": pa.array(["p"] * 4),
        "obj": pa.array(["B", "C", "C", "a literal"]),
        "obj_is_literal": pa.array([False, False, False, True])}))
    got = {r["node"]: r["rank"] for r in pagerank_int(ds).take_all()}
    # iter1: A=150000, B=575000, C=1425000
    # iter2: A=150000, B=213750, C=702500
    # iter3: A=150000, B=213750, C=150000+63750+181687
    assert got == {"A": 150000, "B": 213750, "C": 395437, "D": 150000}


def test_pagerank_distributed_path_identical(ray_session):
    """force_distributed (co-partitioned rank attach, no driver rank
    state) produces exactly the broadcast-path ranks on a 60-node
    deterministic graph with hubs and dangling nodes."""
    import ray.data
    from uckg_ray.stages.graph import pagerank_int
    subs, objs = [], []
    for i in range(60):
        for j in ((i * 7 + 3) % 60, (i * 13 + 5) % 60, 0):
            if j != i:
                subs.append(f"n{i:02d}"); objs.append(f"n{j:02d}")
    ds = ray.data.from_arrow(pa.table({
        "subj": pa.array(subs), "pred": pa.array(["p"] * len(subs)),
        "obj": pa.array(objs),
        "obj_is_literal": pa.array([False] * len(subs))}))
    a = {r["node"]: r["rank"] for r in pagerank_int(ds).take_all()}
    b = {r["node"]: r["rank"]
         for r in pagerank_int(ds, force_distributed=True,
                               num_partitions=7).take_all()}
    assert a == b and len(a) == 60 and len(set(a.values())) > 3


def test_event_funnel_empty_input_yields_zero_rows(ray_session):
    """Oracle parity: an events table with no funnel-step events still
    reports all steps with n_users = 0 (seeded zero rows)."""
    import ray.data
    from uckg_ray.stages.windows import event_funnel
    ds = ray.data.from_pandas(pd.DataFrame({
        "user_id": [1], "event_type": ["error"],
        "ts": pd.to_datetime(["2024-01-01"])}))
    rows = {(r["step_idx"], r["step"]): r["n_users"]
            for r in event_funnel(ds).take_all()}
    assert rows == {(1, "view"): 0, (2, "click"): 0, (3, "purchase"): 0}


def test_wav_sample_stats(ray_session):
    """Integer features computed over the DECODED data bytes: the LIST
    chunk and pad byte never leak in; empty data reports zeros."""
    import ray.data
    from uckg_ray.stages.multimodal import attach_wav_payload, decode_wav_stats
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["abc", ""]}))
    rows = {r["doc_id"]: r
            for r in decode_wav_stats(attach_wav_payload(ds),
                                      concurrency=1).take_all()}
    a, b, c = 97, 98, 99
    assert (rows[0]["n_samples"], rows[0]["sum_code"],
            rows[0]["sum_code_sq"], rows[0]["max_code"]) == (
        3, a + b + c, a*a + b*b + c*c, c)
    assert (rows[1]["n_samples"], rows[1]["sum_code"],
            rows[1]["max_code"]) == (0, 0, 0)


def test_ppm_resizer(ray_session):
    """2x box-downsample: floor mean per 2x2 block per channel; odd
    trailing columns crop; output re-encodes as a parseable P6."""
    import ray.data
    from uckg_ray.stages.multimodal import PpmDecoder, PpmResizer, ppm_bytes
    # 4x2 image: each 2x2 block has channel values (c, c+3, c+12, c+15)
    px = bytes(range(24))
    small, w2, h2 = PpmResizer(factor=2).resize(ppm_bytes(px, 4, 2))
    assert (w2, h2) == (2, 1)
    f = PpmDecoder.parse(small)
    assert (f["width"], f["height"]) == (2, 1)
    _, _, _, out_px = PpmDecoder.walk(small)
    # block mean floor: (0+3+12+15)//4 = 7 for R of the first block, etc.
    assert list(out_px) == [7, 8, 9, 13, 14, 15]
    # composes as a Dataset stage: resize → decode over a real payload
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "payload": pa.array([ppm_bytes(bytes(range(48)), 4, 4)],
                            pa.binary())}))
    rows = (ds.map_batches(PpmResizer, batch_format="pyarrow",
                           concurrency=1)
            .map_batches(PpmDecoder, batch_format="pyarrow",
                         concurrency=1).take_all())
    assert rows[0]["width"] == 2 and rows[0]["height"] == 2
    # sub-block images resize to an empty 0x0 image
    tiny, w0, h0 = PpmResizer(factor=4).resize(ppm_bytes(bytes(3), 1, 1))
    assert (w0, h0) == (0, 0) and PpmDecoder.parse(tiny)["n_pixels"] == 0


def test_wav_sample_stats_rejects_non_8bit_mono(ray_session):
    """Code statistics are an 8-bit-mono contract: 16-bit payloads
    raise in strict mode and yield a null row in lenient mode."""
    import pytest
    import ray.data
    from uckg_ray.stages.multimodal import WavSampleStats, wav_bytes
    p16 = wav_bytes(bytes(range(8)), channels=2, bits=16)
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "payload": pa.array([p16], pa.binary())})
    with pytest.raises(Exception):
        ray.data.from_arrow(tbl).map_batches(
            WavSampleStats, batch_format="pyarrow",
            concurrency=1).take_all()
    r = ray.data.from_arrow(tbl).map_batches(
        WavSampleStats, fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow", concurrency=1).take_all()[0]
    assert r["n_samples"] is None and r["sum_code"] is None


def test_normalize_text_composition_and_whitespace(ray_session):
    """lower → NFC → whitespace collapse → trim; decomposed accents
    compose, codepoint counts follow the normalized form."""
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.text import normalize_text

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["  Hello\t WORLD  ",
                 "CafÉ and café",   # decomposed + composed
                 "NAÏVE",
                 ""]}))
    got = {r["doc_id"]: (r["norm_text"], r["n_chars"])
           for r in normalize_text(docs).take_all()}
    assert got[1] == ("hello world", 11)
    # both spellings normalize to the SAME composed bytes
    assert got[2] == ("café and café", 13)
    assert got[2][0].count("é") == 2 and "́" not in got[2][0]
    assert got[3] == ("naïve", 5)
    assert got[4] == ("", 0)


def test_normalize_text_nbsp_parity_with_duckdb(ray_session):
    """The whitespace class is EXPLICIT ASCII on both engines: Unicode
    whitespace (NBSP, thin space, ideographic space) must survive
    un-collapsed identically in the Ray path and the DuckDB kernel the
    oracle uses — a Rust-regex \\s here would silently diverge."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.text import normalize_text

    texts = ["A  B", "x y", "w　 \tz", "a   b"]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts}))
    got = {r["doc_id"]: (r["norm_text"], r["n_chars"])
           for r in normalize_text(docs).take_all()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want, = con.execute(
            "SELECT regexp_replace(regexp_replace(nfc_normalize("
            "lower(?)), '[\t\n\x0B\f\r ]+', ' ', 'g'),"
            " '^ | $', '', 'g')", [t]).fetchone()
        assert got[i] == (want, len(want)), (i, t)
    assert " " in got[0][0] and " " in got[1][0]
    assert "　" in got[2][0]


def test_sft_pairs_adjacent_user_assistant_only(ray_session):
    """Pairs form ONLY for user→assistant at consecutive turn_idx in
    the SAME conversation; token counts follow the literal-space rule
    (empty string = 1 token)."""
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.text import sft_pairs

    rows = [
        # c1: u0→a1 pairs; a1→u2 doesn't; u2→t3(tool) doesn't; u4→a5 pairs
        ("c1", 0, "user", "hi there"), ("c1", 1, "assistant", "hello"),
        ("c1", 2, "user", "run it"), ("c1", 3, "tool", "ok"),
        ("c1", 4, "user", ""), ("c1", 5, "assistant", "a b  c"),
        # c2: adjacency must not cross conversations (c1 idx4 ↛ c2 idx5)
        ("c2", 5, "assistant", "orphan"),
        ("c2", 7, "user", "q"), ("c2", 8, "assistant", "r"),
    ]
    turns = ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [r[3] for r in rows]}))
    got = {(r["conv_id"], r["turn_idx"]):
           (r["prompt"], r["response"], r["prompt_tokens"],
            r["response_tokens"]) for r in sft_pairs(turns).take_all()}
    assert got == {
        ("c1", 0): ("hi there", "hello", 2, 1),
        ("c1", 4): ("", "a b  c", 1, 4),
        ("c2", 7): ("q", "r", 1, 1)}


def test_conversation_stats(ray_session):
    """Role counts, literal-space token totals and microsecond duration
    per conversation; single-turn conv has duration 0."""
    import datetime

    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.text import conversation_stats

    t0 = datetime.datetime(2024, 1, 1)
    us = datetime.timedelta(microseconds=1)
    rows = [
        ("c1", "user", "a b", t0),
        ("c1", "assistant", "x", t0 + 1500 * us),
        ("c1", "tool", "", t0 + 700 * us),
        ("c2", "system", "lone turn here", t0)]
    turns = ray.data.from_arrow(pa.table({
        "conv_id": [r[0] for r in rows],
        "role": [r[1] for r in rows],
        "text": [r[2] for r in rows],
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us"))}))
    got = {r["conv_id"]: r for r in conversation_stats(turns).take_all()}
    c1 = got["c1"]
    assert (c1["n_turns"], c1["n_user"], c1["n_assistant"], c1["n_tool"],
            c1["n_tokens"], c1["duration_us"]) == (3, 1, 1, 1, 4, 1500)
    c2 = got["c2"]
    assert (c2["n_turns"], c2["n_user"], c2["n_tokens"],
            c2["duration_us"]) == (1, 0, 3, 0)


def test_bm25_topk(ray_session):
    """Fixed-point BM25: rarer term dominates (idf), repetition
    saturates (tf part bounded by k1+1), rank ties break by doc_id —
    verified against a pure-Python replica of the integer formula."""
    import ray.data

    from uckg_ray.stages.text import bm25_topk

    docs = [
        {"doc_id": 0, "text": "rare common common filler filler"},
        {"doc_id": 1, "text": "common filler pad pad pad"},
        {"doc_id": 2, "text": "rare rare rare rare pad"},
        {"doc_id": 3, "text": "unrelated words only here"},
    ]
    qs = (("q0", ("rare", "common")),)
    got = {r["doc_id"]: (r["score"], r["rank"])
           for r in bm25_topk(ray.data.from_items(docs).repartition(3),
                              queries=qs, k=3).take_all()}

    # python replica of the documented integer formula
    texts = {d["doc_id"]: d["text"].split(" ") for d in docs}
    N = len(texts)
    L = sum(len(t) for t in texts.values())
    def df(t): return sum(t in toks for toks in texts.values())
    def score(d, terms):
        s = 0
        for t in terms:
            tf = texts[d].count(t)
            if not tf:
                continue
            idf = ((N - df(t) + 1) * 1_000_000) // (df(t) + 1)
            r = (9 * len(texts[d]) * N) // L
            tfc = (22 * tf * 10_000) // (10 * tf + 3 + r)
            s += (idf * tfc) // 10_000
        return s
    want = sorted(((score(d, qs[0][1]), d) for d in texts
                   if score(d, qs[0][1]) > 0 or
                   any(t in texts[d] for t in qs[0][1])),
                  key=lambda x: (-x[0], x[1]))[:3]
    assert got == {d: (s, i + 1) for i, (s, d) in enumerate(want)}
    # tf saturates at k1+1: doc 0 (two distinct terms) outranks doc 2
    # (one term repeated 4×), and doc 3 (no match) never appears
    assert got[0][1] == 1 and 3 not in got


def test_pack_token_shards(ray_session):
    """Concat-and-chunk packing: exclusive prefix offsets in doc_id
    order survive multi-bucket stitching and shard cuts mid-document."""
    import ray.data

    from uckg_ray.stages.text import pack_token_shards

    docs = [{"doc_id": i, "text": " ".join(["w"] * n)}
            for i, n in [(0, 3), (1, 4), (2, 5), (7, 2), (9, 6)]]
    rows = {r["doc_id"]: (r["n_tokens"], r["token_offset"], r["shard_id"])
            for r in pack_token_shards(
                ray.data.from_items(docs).repartition(4),
                capacity=8, bucket_size=2).take_all()}
    # offsets: 0,3,7,12,14 — shards of 8 tokens: 0,0,0,1,1
    assert rows == {0: (3, 0, 0), 1: (4, 3, 0), 2: (5, 7, 0),
                    7: (2, 12, 1), 9: (6, 14, 1)}


def test_turn_transitions(ray_session):
    """Adjacent-turn role pairs counted within conversations only."""
    import ray.data

    from uckg_ray.stages.text import turn_transitions

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user"},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant"},
        {"conv_id": "c1", "turn_idx": 2, "role": "user"},
        {"conv_id": "c1", "turn_idx": 3, "role": "assistant"},
        {"conv_id": "c2", "turn_idx": 0, "role": "user"},
        {"conv_id": "c2", "turn_idx": 1, "role": "tool"},
        # gap in c2: turn 3 has no predecessor at idx 2
        {"conv_id": "c2", "turn_idx": 3, "role": "assistant"},
    ]
    got = {(r["role"], r["next_role"]): r["n_transitions"]
           for r in turn_transitions(
               ray.data.from_items(rows).repartition(3)).take_all()}
    assert got == {("user", "assistant"): 2, ("assistant", "user"): 1,
                   ("user", "tool"): 1}


def test_doc_surprisal(ray_session):
    """Rare bigrams score higher than common ones; per-occurrence
    contributions floor exactly like the SQL oracle."""
    import ray.data

    from uckg_ray.stages.text import doc_surprisal

    ds = ray.data.from_items([
        {"doc_id": 0, "text": "a b a b"},      # bigrams: "a b"×2, "b a"
        {"doc_id": 1, "text": "a b c"},        # "a b", "b c"
        {"doc_id": 2, "text": "solo"},         # no bigrams → no row
    ]).repartition(3)
    got = {r["doc_id"]: (r["n_bigrams"], r["surprisal_fp"])
           for r in doc_surprisal(ds, num_partitions=4).take_all()}
    # corpus: "a b"→3, "b a"→1, "b c"→1; TB=5, unit=5000
    # doc0 = 2*(5000//3) + 5000//1 = 3332 + 5000
    # doc1 = 5000//3 + 5000//1 = 1666 + 5000
    assert got == {0: (3, 8332), 1: (2, 6666)}
    assert 2 not in got


def test_conv_dedup(ray_session):
    """Identical transcripts collapse (min conv_id keeper); turn order
    and turn boundaries both feed the fingerprint."""
    import ray.data

    from uckg_ray.stages.text import conv_dedup

    rows = [
        {"conv_id": "c2", "turn_idx": 0, "text": "hi"},
        {"conv_id": "c2", "turn_idx": 1, "text": "there"},
        {"conv_id": "c1", "turn_idx": 1, "text": "there"},   # same conv,
        {"conv_id": "c1", "turn_idx": 0, "text": "hi"},      # out of order
        {"conv_id": "c3", "turn_idx": 0, "text": "there"},   # reversed turns
        {"conv_id": "c3", "turn_idx": 1, "text": "hi"},
        {"conv_id": "c4", "turn_idx": 0, "text": "hi\x1fthere"},  # no alias:
        # the fold joins per-turn DIGESTS, so a single turn whose text
        # equals another conv's joined form still hashes distinctly
    ]
    got = {r["conv_id"]: r["n_convs"]
           for r in conv_dedup(
               ray.data.from_items(rows).repartition(3)).take_all()}
    # c1+c2 collapse to c1 (min conv_id keeps c1); c3 (order differs)
    # and c4 (different turn structure) each hash distinctly
    assert got == {"c1": 2, "c3": 1, "c4": 1}


def test_turn_latency(ray_session):
    """Adjacent-turn gaps keyed by (role, next_role), integer micros."""
    from datetime import datetime

    import ray.data

    from uckg_ray.stages.text import turn_latency

    def t(s):  # seconds after epoch-minute, as datetime
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "ts": t(0)},
        {"conv_id": "c1", "turn_idx": 1, "role": "assistant", "ts": t(2)},
        {"conv_id": "c1", "turn_idx": 2, "role": "user", "ts": t(5)},
        {"conv_id": "c2", "turn_idx": 0, "role": "user", "ts": t(10)},
        {"conv_id": "c2", "turn_idx": 1, "role": "assistant", "ts": t(14)},
        # c3: lone turn, no pair
        {"conv_id": "c3", "turn_idx": 7, "role": "tool", "ts": t(1)},
    ]
    got = {(r["role"], r["next_role"]):
           (r["n_pairs"], r["sum_gap_us"], r["max_gap_us"])
           for r in turn_latency(
               ray.data.from_items(rows).repartition(3)).take_all()}
    assert got == {
        ("user", "assistant"): (2, 6_000_000, 4_000_000),
        ("assistant", "user"): (1, 3_000_000, 3_000_000),
    }


def test_tool_sequences(ray_session):
    """Successive tool turns chain within a conversation; intervening
    non-tool turns are skipped; chains never cross conversations."""
    import ray.data

    from uckg_ray.stages.text import tool_sequences

    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "tool": None},
        {"conv_id": "c1", "turn_idx": 1, "role": "tool", "tool": "search"},
        {"conv_id": "c1", "turn_idx": 2, "role": "assistant", "tool": None},
        {"conv_id": "c1", "turn_idx": 3, "role": "tool", "tool": "fetch"},
        {"conv_id": "c1", "turn_idx": 4, "role": "tool", "tool": "fetch"},
        {"conv_id": "c2", "turn_idx": 0, "role": "tool", "tool": "fetch"},
        {"conv_id": "c2", "turn_idx": 1, "role": "tool", "tool": "search"},
        # role=tool but tool null → excluded entirely
        {"conv_id": "c2", "turn_idx": 2, "role": "tool", "tool": None},
    ]
    got = {(r["tool"], r["next_tool"]): r["n_pairs"]
           for r in tool_sequences(
               ray.data.from_items(rows).repartition(3)).take_all()}
    assert got == {("search", "fetch"): 1, ("fetch", "fetch"): 1,
                   ("fetch", "search"): 1}


def test_conv_texts(ray_session):
    """Turn-ordered 0x1f join, one row per conversation."""
    import ray.data

    from uckg_ray.stages.text import conv_texts

    rows = [
        {"conv_id": "conv-1", "turn_idx": 1, "text": "b"},
        {"conv_id": "conv-1", "turn_idx": 0, "text": "a"},
        {"conv_id": "conv-2", "turn_idx": 0, "text": "z"},
    ]
    got = {r["conv_id"]: r["text"]
           for r in conv_texts(
               ray.data.from_items(rows).repartition(2)).take_all()}
    assert got == {"conv-1": "a\x1fb", "conv-2": "z"}


def test_conv_neardup_composition(ray_session):
    """conv_texts → MinHash+LSH composition: two conversations that
    differ by one turn out of many are a near-dup pair; an unrelated
    conversation is not."""
    import ray.data

    from uckg_ray.stages.dedup import _stable64, minhash_lsh_pairs
    from uckg_ray.stages.text import conv_texts

    rows = []
    for i in range(12):
        t = f"turn {i} the quick brown fox jumps over the lazy dog"
        rows.append({"conv_id": "conv-a", "turn_idx": i, "text": t})
        rows.append({"conv_id": "conv-b", "turn_idx": i,
                     "text": t if i != 11 else "a completely new turn"})
        rows.append({"conv_id": "conv-z", "turn_idx": i,
                     "text": f"zz{i}q unrelated content row {i}"})

    ct = conv_texts(ray.data.from_items(rows).repartition(3))

    def to_docs(b):
        ids = pa.array([_stable64(c) >> 1
                        for c in b.column("conv_id").to_pylist()],
                       pa.int64())
        return pa.table({"doc_id": ids, "text": b.column("text")})

    pairs = minhash_lsh_pairs(
        ct.map_batches(to_docs, batch_format="pyarrow"), tau=0.5
    ).take_all()
    ids = {n: _stable64(n) >> 1 for n in ("conv-a", "conv-b", "conv-z")}
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert got == {(min(ids["conv-a"], ids["conv-b"]),
                    max(ids["conv-a"], ids["conv-b"]))}


def test_decontaminate(ray_session):
    import ray.data

    from uckg_ray.stages.text import decontaminate

    # train docs 1 and 2 collide with test doc 10 on "w x y" → dropped;
    # train doc 3 is clean → survives; test docs never appear in output
    ds = ray.data.from_items([
        {"doc_id": 10, "text": "w x y z q", "source": "bench"},
        {"doc_id": 20, "text": "p q r", "source": "bench"},
        {"doc_id": 1, "text": "a w x y z b", "source": "web"},
        {"doc_id": 2, "text": "w x y c w x y", "source": "web"},
        {"doc_id": 3, "text": "nothing shared here", "source": "books"},
    ])
    got = {(r["doc_id"], r["source"])
           for r in decontaminate(ds, n=3).take_all()}
    assert got == {(3, "books")}


def test_window_distinct_users(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.windows import window_distinct_users

    ts = pd.to_datetime([
        "2024-01-01 00:01", "2024-01-01 00:05",   # w0 view: users 1,1
        "2024-01-01 00:14", "2024-01-01 00:16",   # w0 click u2 / w1 click u2
        "2024-01-01 00:20",                        # w1 click u3
    ])
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 2, 2, 3],
        "event_type": ["view", "view", "click", "click", "click"],
        "ts": ts.astype("datetime64[us]"), "value": [0.0] * 5}))
    got = {(r["window_start_us"], r["event_type"]):
           (r["n_events"], r["n_users"])
           for r in window_distinct_users(ds, size_minutes=15).take_all()}
    w0 = int(pd.Timestamp("2024-01-01 00:00").value // 1000)
    w1 = int(pd.Timestamp("2024-01-01 00:15").value // 1000)
    assert got == {(w0, "view"): (2, 1), (w0, "click"): (1, 1),
                   (w1, "click"): (2, 2)}


def test_collocations_topk(ray_session):
    import ray.data

    from uckg_ray.stages.text import collocations_topk

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "new york new york"},
        {"doc_id": 2, "text": "new jersey"}])
    rows = collocations_topk(ds, min_count=1, k=10).take_all()
    got = [(r["w1"], r["w2"], r["c"], r["dice_ppm"]) for r in rows]
    # dice = 2c*1e6 // (c(w1)+c(w2)): new=3, york=2, jersey=1
    assert got == [("new", "york", 2, 800000),
                   ("new", "jersey", 1, 500000),
                   ("york", "new", 1, 400000)]
    # k truncation keeps the strongest pair
    top1 = collocations_topk(ds, min_count=1, k=1).take_all()
    assert [(r["w1"], r["w2"]) for r in top1] == [("new", "york")]


def test_readability_scores(ray_session):
    import ray.data

    from uckg_ray.stages.text import readability_scores

    ds = ray.data.from_items([
        {"doc_id": 1, "text": "The cat sat. It sat well!"},
        {"doc_id": 2, "text": "word"}])
    got = {r["doc_id"]: (r["n_words"], r["n_sents"], r["n_syll"],
                         r["flesch_milli"])
           for r in readability_scores(ds).take_all()}
    # doc 1: 6 words, 2 sents, vowel groups: e,a,a,i,a,e = 6
    # flesch = 206835 - 1015*6//2 - 84600*6//6 = 206835 - 3045 - 84600
    assert got[1] == (6, 2, 6, 119190)
    # doc 2: 1 word, sentence floor 1, 1 vowel group
    assert got[2] == (1, 1, 1, 206835 - 1015 - 84600)


def test_dow_hour_profile(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.windows import dow_hour_profile

    # 1970-01-01 was a Thursday → dow 0 under the epoch convention
    ts = pd.to_datetime(["1970-01-01 05:30",    # dow 0, hour 5
                         "1970-01-02 05:10",    # dow 1 (Friday), hour 5
                         "1970-01-01 05:59"])   # dow 0, hour 5
    ds = ray.data.from_pandas(pd.DataFrame({
        "ts": ts.astype("datetime64[us]"),
        "value": [1.0, 2.0, 3.0]}))
    got = {(r["dow"], r["hour"]): (r["n_events"], r["sum_value_c100"])
           for r in dow_hour_profile(ds).take_all()}
    assert got == {(0, 5): (2, 400), (1, 5): (1, 200)}


def test_collocations_block_invariance(ray_session):
    import ray.data

    from uckg_ray.stages.text import collocations_topk

    docs = [{"doc_id": i,
             "text": f"alpha beta gamma token{i % 7} alpha beta"}
            for i in range(40)]
    one = ray.data.from_items(docs)
    many = ray.data.from_items(docs).repartition(8)
    k1 = [(r["w1"], r["w2"], r["c"], r["dice_ppm"])
          for r in collocations_topk(one, min_count=2, k=20).take_all()]
    k8 = [(r["w1"], r["w2"], r["c"], r["dice_ppm"])
          for r in collocations_topk(many, min_count=2, k=20).take_all()]
    assert k1 == k8 and len(k1) > 0


def test_latest_per_key(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.windows import latest_per_key

    ts = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                         "2024-01-01 01:00", "2024-01-01 00:30"])
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 8],
        "event_type": ["a", "b", "c", "d"],
        "ts": ts.astype("datetime64[us]"),
        "value": [0.0] * 4}).sample(frac=1, random_state=0))
    got = {r["user_id"]: (r["event_id"], r["event_type"])
           for r in latest_per_key(ds).take_all()}
    # user 7: ties at 01:00 → max event_id (3); user 8: its only row
    assert got == {7: (3, "c"), 8: (4, "d")}


def test_turn_dupe_stats(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.text import turn_dupe_stats

    t = pd.DataFrame({
        "conv_id": ["c1"] * 4 + ["c2"] * 2,
        "text": ["hi", "hi", "ok", "hi", "x", "y"]})
    # conv split across blocks: partials must merge before counting
    ds = ray.data.from_pandas(t).repartition(4)
    rows = turn_dupe_stats(ds).take_all()
    assert len(rows) == 1          # c2 has no dupes
    r = rows[0]
    assert (r["conv_id"], r["n_turns"], r["n_distinct_texts"],
            r["n_dupes"]) == ("c1", 4, 2, 2)


def test_activity_streaks_islands(ray_session):
    import ray.data

    from uckg_ray.stages.windows import activity_streaks

    DAY = 86_400_000_000
    # user 1: days 0,1,2 then 5,6 (streaks 3 and 2, two events day 0);
    # user 2: single day
    rows = [(1, 0), (1, 0), (1, DAY), (1, 2 * DAY), (1, 5 * DAY),
            (1, 6 * DAY + 7), (2, 3 * DAY)]
    t = pa.table({
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
    })
    got = {r["user_id"]: r for r in
           activity_streaks(ray.data.from_arrow(t).repartition(3))
           .take_all()}
    assert got[1]["n_active_days"] == 5
    assert got[1]["n_streaks"] == 2 and got[1]["max_streak"] == 3
    assert got[2] == {"user_id": 2, "n_active_days": 1,
                      "n_streaks": 1, "max_streak": 1}


def test_sentence_dedup_first_occurrence(ray_session):
    import ray.data

    from uckg_ray.stages.text import sentence_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # "b" repeats inside doc 1 and again in doc 2; doc 3 is fully
        # duplicated and must vanish from the output
        "text": ["a. b .b", "b. c", "a"],
    })
    out = {r["doc_id"]: r for r in
           sentence_dedup(ray.data.from_arrow(t).repartition(3),
                          num_partitions=4).take_all()}
    assert out[1]["text_dedup"] == "a. b"
    assert out[1]["n_sents"] == 3 and out[1]["n_kept"] == 2
    assert out[2]["text_dedup"] == "c"
    assert out[2]["n_sents"] == 2 and out[2]["n_kept"] == 1
    assert 3 not in out


def test_event_gap_stats(ray_session):
    import ray.data

    from uckg_ray.stages.windows import event_gap_stats

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        # user 1: gaps 10 (to click), 5 (to view); user 2: no gap
        "user_id": pa.array([1, 1, 1, 2, 1], pa.int64()),
        "ts": pa.array([100, 110, 115, 50, 90], pa.timestamp("us")),
        "event_type": ["view", "click", "view", "view", "view"],
        "value": [0.0] * 5,
        "props": ["{}"] * 5,
    })
    got = {r["event_type"]: r for r in
           event_gap_stats(ray.data.from_arrow(t).repartition(3))
           .take_all()}
    # user 1 ordered: 90,100,110,115 → gaps: 10 (→view@100)... wait:
    # 90→100 gap 10 lands on view@100; 100→110 gap 10 on click;
    # 110→115 gap 5 on view
    assert got["click"]["n_gaps"] == 1 and got["click"]["sum_gap_us"] == 10
    v = got["view"]
    assert v["n_gaps"] == 2 and v["sum_gap_us"] == 15
    assert v["min_gap_us"] == 5 and v["max_gap_us"] == 10


def test_doc_novelty_unique_grams(ray_session):
    import ray.data

    from uckg_ray.stages.text import doc_novelty

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # 2-grams: doc1 {a b, b c}; doc2 {a b, b d}; doc3 too short
        "text": ["a b c", "a b d", "x"],
    })
    got = {r["doc_id"]: r for r in
           doc_novelty(ray.data.from_arrow(t).repartition(3), n=2,
                       num_partitions=4).take_all()}
    assert got[1]["n_grams"] == 2 and got[1]["n_novel"] == 1   # "b c"
    assert got[2]["n_grams"] == 2 and got[2]["n_novel"] == 1   # "b d"
    assert 3 not in got


def test_peak_burst_trailing_window(ray_session):
    import ray.data

    from uckg_ray.stages.windows import peak_burst

    MIN = 60_000_000
    # user 1: events at 0, 30m, 59m, 61m → [t-60m, t] windows peak at 3
    # (anchors 59m and 61m each cover three events); user 2: single
    ts = [0, 30 * MIN, 59 * MIN, 61 * MIN, 5 * MIN]
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    got = {r["user_id"]: r["max_burst"] for r in
           peak_burst(ray.data.from_arrow(t).repartition(3))
           .take_all()}
    assert got == {1: 3, 2: 1}
    # boundary inclusivity: events exactly W apart share one window
    t2 = pa.table({
        "user_id": pa.array([7, 7], pa.int64()),
        "ts": pa.array([0, 60 * MIN], pa.timestamp("us")),
    })
    got2 = {r["user_id"]: r["max_burst"] for r in
            peak_burst(ray.data.from_arrow(t2)).take_all()}
    assert got2 == {7: 2}


def test_tool_skipgrams_window(ray_session):
    import ray.data

    from uckg_ray.schema import TRANSCRIPT_SCHEMA
    from uckg_ray.stages.text import tool_skipgrams

    rows = [
        # conv c1 tool turns at 0 (nmap), 2 (ffuf), 9 (hydra):
        # window 5 pairs: (nmap,ffuf); hydra is 9-2=7 > 5 from ffuf
        ("c1", 0, "tool", "nmap"), ("c1", 1, "user", ""),
        ("c1", 2, "tool", "ffuf"), ("c1", 9, "tool", "hydra"),
        # conv c2: adjacent pair + non-tool role with tool name ignored
        ("c2", 0, "tool", "nmap"), ("c2", 1, "tool", "nmap"),
        ("c2", 2, "user", "nmap"),
    ]
    t = pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "text": [""] * len(rows),
        "tool": [r[3] for r in rows],
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    got = {(r["tool_a"], r["tool_b"]): r["n_pairs"] for r in
           tool_skipgrams(ray.data.from_arrow(t).repartition(2),
                          window=5).take_all()}
    assert got == {("nmap", "ffuf"): 1, ("nmap", "nmap"): 1}
