"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the actual decode is a
clearly-marked stub (``ImageDecodeStub`` raises NotImplementedError
unless ``fake=True``); everything around it — schema, actor-pool batch
signature, small-batch sizing for wide binary rows, deterministic
feature output layout — is real and tested. At 100 TB the pattern is:
small ``batch_size`` (binary rows are wide), ``batch_format="pyarrow"``
(binary round-trips Arrow but not pandas), actor pools so codec init
happens once per worker.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def attach_binary_payload(docs: Dataset, text_col: str = "text") -> Dataset:
    """Synthesize an opaque binary column (utf-8 bytes of the text) plus
    typed metadata — the stand-in for an image/audio payload column."""
    def attach(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        payload = [t.encode() for t in texts]
        return (batch
                .append_column("payload", pa.array(payload, pa.binary()))
                .append_column("media_type",
                               pa.array(["application/octet-stream"] * len(texts))))
    return docs.map_batches(attach, batch_format="pyarrow")


class ImageDecodeStub:
    """Actor-pool decode stage. Real codecs are not available in this
    environment; with ``fake=True`` it produces a deterministic
    pseudo-decode (blake2b-seeded 8-dim feature vector) so the
    downstream plumbing is exercised end-to-end."""

    def __init__(self, fake: bool = False):
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image/audio codecs are not available in this container; "
                "run with fake=True for the deterministic stub decode")
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            h = hashlib.blake2b(p or b"", digest_size=32).digest()
            feats.append((np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                          / np.float32(2**32)).tolist())
        return batch.append_column(
            "decoded_features",
            pa.array(feats, pa.list_(pa.float32())))


class FrameSampler:
    """Actor-pool frame-sampling stage: the 1→N expansion a video/audio
    pipeline needs (decode container → emit every ``stride``-th frame as
    its own row). Codecs are absent here, so the frame layout is the
    declared fake contract — the payload is utf-8 text and a "frame" is
    a ``frame_chars``-character window — but the Ray plumbing is the
    real thing: callable-class actor pool (codec init once per worker),
    small input batches (binary rows are wide), flat row expansion with
    a deterministic (doc_id, frame_idx, frame_h) layout the SQL oracle
    reproduces with substr + md5."""

    def __init__(self, stride: int = 4, frame_chars: int = 16):
        self.stride = stride
        self.frame_chars = frame_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        from uckg_ray.stages.dedup import _stable64
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_h = [], [], []
        w = self.frame_chars
        for did, p in zip(ids, payloads):
            text = (p or b"").decode()
            for i in range(0, len(text) // w, self.stride):
                h = _stable64(text[i * w:(i + 1) * w])
                out_id.append(did)
                out_idx.append(i)
                out_h.append(h)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "frame_idx": pa.array(out_idx, pa.int64()),
                         "frame_h": pa.array(out_h, pa.uint64())})


def sample_frames(docs_with_payload: Dataset, *, stride: int = 4,
                  frame_chars: int = 16, concurrency: int = 2) -> Dataset:
    """Frame-sample the binary column with a ``FrameSampler`` actor
    pool; one output row per sampled frame."""
    return docs_with_payload.map_batches(
        FrameSampler, fn_constructor_kwargs={
            "stride": stride, "frame_chars": frame_chars},
        batch_format="pyarrow", batch_size=256, concurrency=concurrency)


def binary_feature_stats(docs_with_payload: Dataset) -> Dataset:
    """(doc_id, n_bytes, payload_md5) — deterministic, SQL-checkable
    feature extraction over the binary column."""
    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "payload_md5": [hashlib.md5(p or b"").hexdigest() for p in payloads],
        })
    return docs_with_payload.map_batches(stats, batch_format="pyarrow",
                                         batch_size=1024)
