"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container ships no codec LIBRARIES, but two media containers are
simple enough to parse genuinely with the stdlib ``struct`` module:
RIFF/WAVE PCM audio (``WavDecoder``) and binary PPM images
(``PpmDecoder``). Payloads are synthesized as REAL containers —
chunk-walked RIFF with an interleaved LIST metadata chunk and odd-size
padding, PPM with a comment line — so the decoders must honor the
actual formats (a naive fixed-offset slice produces wrong features).
Heavier codecs (JPEG/H.264/FLAC) stay out of scope for this
environment; they'd drop into the same actor-pool ``__call__`` slot.

At 100 TB the pattern is: small ``batch_size`` (binary rows are wide),
``batch_format="pyarrow"`` (binary round-trips Arrow but not pandas),
actor pools so codec init happens once per worker.
"""

from __future__ import annotations

import hashlib
import struct

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


def wav_bytes(data: bytes, *, sample_rate: int = 16_000, channels: int = 1,
              bits: int = 8, tag: int = 0) -> bytes:
    """Serialize PCM sample bytes as a REAL RIFF/WAVE container: fmt
    chunk, a LIST-INFO metadata chunk (so the data chunk does NOT sit at
    the canonical offset 44 — parsers must chunk-walk), and the RIFF
    even-size pad byte after odd-length data (the size field stays the
    true length; parsers must honor it, not the padded extent)."""
    block_align = max(1, channels * bits // 8)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align, bits)
    info = f"INFO{tag:016d}".encode()        # even length (20)
    chunks = b"".join([
        b"fmt " + struct.pack("<I", len(fmt)) + fmt,
        b"LIST" + struct.pack("<I", len(info)) + info,
        b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b""),
    ])
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def ppm_bytes(pixels: bytes, width: int, height: int, *,
              maxval: int = 255) -> bytes:
    """Serialize RGB bytes as a binary PPM (P6) image with a comment
    line in the header (legal per the spec; parsers must skip it)."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixels must be width*height*3 bytes")
    return (f"P6\n# synthetic fixture {width}x{height}\n"
            f"{width} {height}\n{maxval}\n").encode() + pixels


def attach_wav_payload(docs: Dataset, text_col: str = "text") -> Dataset:
    """Synthesize a real WAV payload per document: the utf-8 bytes of
    the text become the 8-bit PCM sample stream (deterministic, so a
    SQL oracle can reproduce sample-level features via md5/length over
    the same text column)."""
    def attach(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column("doc_id").to_pylist()
        payload = [wav_bytes((t or "").encode(), tag=i % 10**16)
                   for i, t in zip(ids, texts)]
        n = len(texts)
        return (batch
                .append_column("payload", pa.array(payload, pa.binary()))
                .append_column("media_type", pa.array(["audio/wav"] * n)))
    return docs.map_batches(attach, batch_format="pyarrow", batch_size=512)


class WavDecoder:
    """Actor-pool RIFF/WAVE PCM decode stage — a genuine stdlib-struct
    parser (magic validation, chunk walk with odd-size pad skipping,
    fmt field unpack, data extraction). Output features per payload:
    channels, sample-rate, bit depth, sample count (from the data size
    and block align, NOT the payload size) and the md5 of the extracted
    sample bytes — the last two prove the chunk walk found the right
    bytes. Malformed payloads raise (strict=True) or yield a null
    feature row."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    @staticmethod
    def walk(p: bytes) -> tuple[tuple, bytes]:
        """Chunk-walk a RIFF/WAVE payload to its (fmt fields, raw data
        bytes); raises ValueError on malformed containers."""
        if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        riff_size = struct.unpack_from("<I", p, 4)[0]
        end = min(len(p), 8 + riff_size)
        pos, fmt, data = 12, None, None
        while pos + 8 <= end:
            cid = p[pos:pos + 4]
            size = struct.unpack_from("<I", p, pos + 4)[0]
            body = p[pos + 8:pos + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)     # RIFF pads chunks to even
        if fmt is None or data is None:
            raise ValueError("missing fmt or data chunk")
        if fmt[0] != 1:
            raise ValueError(f"not PCM (format tag {fmt[0]})")
        return fmt, data

    @staticmethod
    def parse(p: bytes) -> dict:
        fmt, data = WavDecoder.walk(p)
        _fmt_tag, channels, rate, _byte_rate, block_align, bits = fmt
        return {"n_channels": channels, "sample_rate": rate,
                "bits_per_sample": bits,
                "n_samples": len(data) // max(1, block_align),
                "data_md5": hashlib.md5(data).hexdigest()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {"doc_id": [], "n_channels": [], "sample_rate": [],
               "bits_per_sample": [], "n_samples": [], "data_md5": []}
        for did, p in zip(ids, batch.column("payload").to_pylist()):
            try:
                f = self.parse(p or b"")
            except ValueError:
                if self.strict:
                    raise
                f = {k: None for k in out if k != "doc_id"}
            out["doc_id"].append(did)
            for k, v in f.items():
                out[k].append(v)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_channels": pa.array(out["n_channels"], pa.int64()),
            "sample_rate": pa.array(out["sample_rate"], pa.int64()),
            "bits_per_sample": pa.array(out["bits_per_sample"], pa.int64()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "data_md5": pa.array(out["data_md5"], pa.string())})


class PpmDecoder:
    """Actor-pool binary-PPM (P6) decode stage: header parse (magic,
    comment skipping, dims, maxval) + pixel extraction. Features:
    width, height, n_pixels, mean channel value (integer-floored) and
    pixel md5."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    @staticmethod
    def walk(p: bytes) -> tuple[int, int, int, bytes]:
        """Parse a binary-PPM header (magic, comment skipping, dims,
        maxval) and return (width, height, maxval, pixel bytes)."""
        if p[:2] != b"P6":
            raise ValueError("not a binary PPM payload")
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(p) and p[pos:pos + 1].isspace():
                pos += 1
            if p[pos:pos + 1] == b"#":            # comment to end of line
                nl = p.find(b"\n", pos)
                pos = len(p) if nl < 0 else nl + 1
                continue
            start = pos
            while pos < len(p) and not p[pos:pos + 1].isspace():
                pos += 1
            fields.append(int(p[start:pos]))
        pos += 1                                   # single ws after maxval
        width, height, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        pixels = p[pos:pos + width * height * 3]
        if len(pixels) != width * height * 3:
            raise ValueError("truncated pixel data")
        return width, height, maxval, pixels

    @staticmethod
    def parse(p: bytes) -> dict:
        width, height, _maxval, pixels = PpmDecoder.walk(p)
        arr = np.frombuffer(pixels, np.uint8)
        return {"width": width, "height": height,
                "n_pixels": width * height,
                "mean_value": int(arr.mean()) if arr.size else 0,
                "pixel_md5": hashlib.md5(pixels).hexdigest()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {"doc_id": [], "width": [], "height": [], "n_pixels": [],
               "mean_value": [], "pixel_md5": []}
        for did, p in zip(ids, batch.column("payload").to_pylist()):
            try:
                f = self.parse(p or b"")
            except ValueError:
                if self.strict:
                    raise
                f = {k: None for k in out if k != "doc_id"}
            out["doc_id"].append(did)
            for k, v in f.items():
                out[k].append(v)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "n_pixels": pa.array(out["n_pixels"], pa.int64()),
            "mean_value": pa.array(out["mean_value"], pa.int64()),
            "pixel_md5": pa.array(out["pixel_md5"], pa.string())})


def decode_wav(docs_with_payload: Dataset, *, concurrency=(1, 4),
               batch_size: int = 512) -> Dataset:
    """Decode a WAV payload column with a ``WavDecoder`` actor pool."""
    return docs_with_payload.map_batches(
        WavDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


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


class WavSampleStats:
    """Actor-pool audio feature extraction over genuinely DECODED PCM
    sample bytes (chunk-walked via ``WavDecoder.walk``): sample count,
    integer energy components (Σcode, Σcode², max code), all int64 so
    a byte-level SQL oracle checks every decoded sample value, not
    just a digest. The code statistics are defined for 8-BIT MONO PCM
    (one byte per sample — anything else would mix frame counts with
    byte aggregates); other formats raise (strict) or yield a null
    row, the same contract as a codec mismatch. Empty sample streams
    report zeros."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {"doc_id": [], "n_samples": [], "sum_code": [],
               "sum_code_sq": [], "max_code": []}
        for did, p in zip(ids, batch.column("payload").to_pylist()):
            try:
                fmt, data = WavDecoder.walk(p or b"")
                if fmt[1] != 1 or fmt[5] != 8:
                    raise ValueError(
                        "sample code statistics are defined for 8-bit "
                        f"mono PCM (got {fmt[1]} ch × {fmt[5]} bit)")
            except ValueError:
                if self.strict:
                    raise
                out["doc_id"].append(did)
                for k in ("n_samples", "sum_code", "sum_code_sq",
                          "max_code"):
                    out[k].append(None)
                continue
            arr = np.frombuffer(data, np.uint8).astype(np.int64)
            out["doc_id"].append(did)
            out["n_samples"].append(len(data))
            out["sum_code"].append(int(arr.sum()))
            out["sum_code_sq"].append(int((arr * arr).sum()))
            out["max_code"].append(int(arr.max()) if arr.size else 0)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "sum_code": pa.array(out["sum_code"], pa.int64()),
            "sum_code_sq": pa.array(out["sum_code_sq"], pa.int64()),
            "max_code": pa.array(out["max_code"], pa.int64())})


def decode_wav_stats(docs_with_payload: Dataset, *, concurrency=(1, 4),
                     batch_size: int = 512) -> Dataset:
    """Sample-level audio features with a ``WavSampleStats`` actor pool."""
    return docs_with_payload.map_batches(
        WavSampleStats, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


class PpmResizer:
    """Actor-pool image RESIZE stage: decode P6 → integer ``factor``×
    box-downsample (floor mean of each factor×factor block per channel;
    trailing rows/columns that don't fill a block are truncated, the
    standard crop-to-multiple convention) → re-encode as P6. Output
    rows keep the payload column (now the resized image) plus the new
    dims, so the stage composes with PpmDecoder / further resizes.
    An image smaller than one block resizes to an empty 0×0 image."""

    def __init__(self, factor: int = 2, strict: bool = True):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        self.strict = strict

    def resize(self, p: bytes) -> tuple[bytes, int, int]:
        w, h, maxval, pixels = PpmDecoder.walk(p)
        f = self.factor
        w2, h2 = w // f, h // f
        arr = (np.frombuffer(pixels, np.uint8)
               .reshape(h, w, 3)[:h2 * f, :w2 * f]
               .astype(np.uint32))
        if w2 == 0 or h2 == 0:
            small = b""
        else:
            small = (arr.reshape(h2, f, w2, f, 3).sum(axis=(1, 3))
                     // (f * f)).astype(np.uint8).tobytes()
        return ppm_bytes(small, w2, h2, maxval=maxval), w2, h2

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = {"doc_id": [], "payload": [], "width": [], "height": []}
        for did, p in zip(ids, batch.column("payload").to_pylist()):
            try:
                small, w2, h2 = self.resize(p or b"")
            except ValueError:
                if self.strict:
                    raise
                small, w2, h2 = None, None, None
            out["doc_id"].append(did)
            out["payload"].append(small)
            out["width"].append(w2)
            out["height"].append(h2)
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "payload": pa.array(out["payload"], pa.binary()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64())})
