"""Shared hash-partitioning kernels for the explicit co-partition
operators. Every stage that co-partitions on (key, time-bucket) — as-of
join, range join, sessionize, running aggregates — MUST use the same
arithmetic or their exchanges silently stop co-locating; keeping the
single definition here makes a future hash change (e.g. a skew fix)
atomic across all of them."""

from __future__ import annotations

import numpy as np

KNUTH = 2654435761            # Knuth multiplicative hash constant
GOLDEN64 = 0x9E3779B97F4A7C15  # 64-bit golden-ratio constant


def default_partitions() -> int:
    """Default exchange width for the explicit co-partition operators:
    one partition per cluster CPU, floored at 16 so small clusters (and
    the un-initialized import path) still get enough partitions for
    skew-spreading. Single definition — graph/text/relational stages
    all size their exchanges through this, so a tuning change (cap,
    multiplier) lands everywhere at once."""
    import ray
    return max(16, int(ray.cluster_resources().get("CPU", 16))
               if ray.is_initialized() else 16)


def key_bucket_partition_ids(u: np.ndarray, bk: np.ndarray,
                             n_parts: int) -> np.ndarray:
    """(key, time-bucket) → int32 partition id."""
    h = ((u.astype(np.uint64) * np.uint64(KNUTH))
         ^ (bk.astype(np.uint64) * np.uint64(GOLDEN64)))
    return (h % np.uint64(n_parts)).astype(np.int32)


def key_partition_ids(k: np.ndarray, n_parts: int) -> np.ndarray:
    """key → int32 partition id (single-key co-partition / stitch)."""
    return ((k.astype(np.uint64) * np.uint64(KNUTH))
            % np.uint64(n_parts)).astype(np.int32)


def knuth_mod100(ids: np.ndarray) -> np.ndarray:
    """Deterministic percentile bucket ``(id * KNUTH) % 2**32 % 100`` —
    the split/sample hash shared by train_test_split, stratified_sample
    and the curation pipeline, mirrored verbatim by their SQL oracles.
    uint64 wraparound equals the exact big-int arithmetic for ANY int64
    id: the multiply keeps the low 64 bits and 2**64 ≡ 0 (mod 2**32),
    so the % 2**32 result is identical even under wraparound."""
    return ((ids.astype(np.uint64) * np.uint64(KNUTH))
            % np.uint64(1 << 32)) % np.uint64(100)


def knuth32(ids: np.ndarray) -> np.ndarray:
    """Full-width deterministic shuffle key ``(id * KNUTH) % 2**32`` —
    the tie-poor ordering hash behind per-group cap sampling (the
    mod-100 bucket of :func:`knuth_mod100` has only 100 distinct
    values, far too coarse to ORDER BY). Same uint64-wraparound
    argument: exact for any int64 id."""
    return ((ids.astype(np.uint64) * np.uint64(KNUTH))
            % np.uint64(1 << 32))
