"""Composed training-data curation pipeline — the operator library
working end-to-end as a user of the engine would chain it:

    documents
      → normalized-fingerprint dedup (keep the min doc_id per
        fingerprint — the ``dedup_fingerprint`` + ``dedup_exact``
        combination)
      → token-count quality gate (``token_count`` accounting)
      → deterministic train/test split (``train_test_split`` hash)

One text pass computes fingerprint + token count per row (the wide
column never shuffles); the dedup moves (fingerprint, doc_id, n_tokens)
rows through an explicit hash-partition min-per-fingerprint (block-local
drop_duplicates is the combiner); the gate and split are stateless maps
over the surviving rows. Output: (doc_id, n_tokens, split).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def curate_documents(docs: Dataset, *, min_tokens: int = 5,
                     train_pct: int = 80,
                     num_partitions: int = 16) -> Dataset:
    """Dedup → quality gate → split. Exactly mirrored by one SQL chain
    (md5 fingerprint GROUP BY min, whitespace token count, Knuth-hash
    split), so the whole composition is value-hash checkable."""
    import pandas as pd

    from uckg_ray.stages.dedup import normalize_text
    from uckg_ray.stages.materialize import _add_hash_partition

    def per_doc(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        texts = batch.column("text").to_pylist()
        col = batch.column("text")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        # vectorized token count; split_pattern(' ') keeps empty tokens
        # between consecutive spaces == DuckDB len(string_split(t, ' '))
        n_tok = pc.list_value_length(pc.split_pattern(col, " ")) \
            .cast(pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id").cast(pa.int64()),
            # md5 of normalized text is the only per-row Python left
            "fp": pa.array(
                [hashlib.md5(normalize_text(t).encode()).hexdigest()
                 for t in texts], pa.string()),
            "n_tokens": n_tok,
        })

    def local_min(batch: pa.Table) -> pa.Table:
        # block-local combiner: one candidate row per fingerprint
        df = (batch.to_pandas().sort_values(["fp", "doc_id"])
              .drop_duplicates("fp"))
        return pa.Table.from_pandas(df, preserve_index=False)

    def part_min(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["fp", "doc_id"]).drop_duplicates("fp")
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64),
                                 pa.int64())})

    def gate_and_split(batch: pa.Table) -> pa.Table:
        from uckg_ray.partitioning import knuth_mod100
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(n >= min_tokens))
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        h = knuth_mod100(ids)
        return batch.append_column(
            "split", pa.array(np.where(h < train_pct, "train", "test"),
                              pa.string()))

    kept = (docs.map_batches(per_doc, batch_format="pyarrow",
                             batch_size=None)
            .map_batches(local_min, batch_format="pyarrow",
                         batch_size=None)
            .map_batches(lambda b: _add_hash_partition(
                b, num_partitions, col="fp"),
                batch_format="pyarrow", batch_size=None)
            .groupby("p")
            .map_groups(lambda g: part_min(g.drop(columns=["p"])),
                        batch_format="pandas"))
    return kept.map_batches(gate_and_split, batch_format="pyarrow",
                            batch_size=None)
