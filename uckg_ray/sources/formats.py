"""Transcript source formats beyond Parquet.

The reference ingests JSON REST payloads and Excel sheets
(`reference/data_collection/cve_collection.py`, `attack_collection`
S4–S6); this engine's equivalent surface is: any of Parquet / JSONL /
CSV transcript files read file-parallel into the SAME canonical Arrow
schema, so every downstream stage (extraction, dedup, KG build) is
format-agnostic. JSON and CSV carry timestamps as strings — the
normalizing map casts them back to ``timestamp[us]`` and restores
int32 ``turn_idx``, keeping the schema byte-compatible with the
Parquet path (verified by an identical-edge-set test)."""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

_CANON = {"conv_id": pa.string(), "turn_idx": pa.int32(),
          "role": pa.string(), "text": pa.string(),
          "tool": pa.string(), "ts": pa.timestamp("us")}


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for name, typ in _CANON.items():
        col = batch.column(name)
        # ISO-8601 strings (incl. fractional seconds) cast natively to
        # timestamp; Arrow strptime lacks %f so an explicit format can't
        cols[name] = col.cast(typ)
    return pa.table(cols)


def read_transcripts(path: str | list[str], *, fmt: str | None = None,
                     **read_kwargs) -> Dataset:
    """File-parallel transcript read for ``parquet`` / ``json`` (JSONL)
    / ``csv``, normalized to the canonical schema. ``fmt=None`` infers
    from the file extension; a list of paths (all the same format)
    reads file-parallel like the underlying Ray readers."""
    import os

    import ray.data

    if isinstance(path, list) and not path:
        raise ValueError("read_transcripts: empty path list")

    ext_to_fmt = {".parquet": "parquet", ".jsonl": "json",
                  ".json": "json", ".csv": "csv"}

    def _infer(one: str) -> str | None:
        low = one.lower()
        ext = os.path.splitext(low)[1]
        if ext in ext_to_fmt:
            return ext_to_fmt[ext]
        if ext:
            # an unknown extension is a user mistake — raise the
            # clean error here, not a Parquet magic-bytes failure
            raise ValueError(
                f"cannot infer transcript format from {one!r}; "
                "pass fmt='parquet' | 'json' | 'csv'")
        return None  # extension-less directory

    if fmt is None:
        fmt = _infer(path[0] if isinstance(path, list) else path) \
            or "parquet"  # extension-less directory of parquet files
    if isinstance(path, list):
        # compare RESOLVED formats, not raw extensions — .json and
        # .jsonl both read through the json reader and may mix freely
        mixed = {_infer(p) or "parquet" for p in path}
        if len(mixed) > 1:
            raise ValueError(
                f"mixed transcript formats in one read: {sorted(mixed)}")
    if fmt == "parquet":
        ds = ray.data.read_parquet(path, **read_kwargs)
    elif fmt == "json":
        ds = ray.data.read_json(path, **read_kwargs)
    elif fmt == "csv":
        ds = ray.data.read_csv(path, **read_kwargs)
    else:
        raise ValueError(f"unsupported transcript format: {fmt!r}")
    return ds.map_batches(_normalize, batch_format="pyarrow",
                          batch_size=None)
