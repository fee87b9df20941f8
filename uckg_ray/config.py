"""Pipeline tuning knobs, sized for a fixed multi-node cluster but tested
single-node. All shuffle-relevant choices are explicit here."""

from __future__ import annotations

from dataclasses import dataclass


def default_num_partitions() -> int:
    """Shuffle-partition default for join-shaped exchanges: cluster
    CPUs / 4, min 8. Dataset.join spawns one aggregator actor per
    partition — at sub-GB scale 8 partitions measured 2.5× faster than
    32, but a fixed 8 would serialize a large cluster."""
    import ray
    n_cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(8, n_cpus // 4)


def join_num_partitions(*row_counts: int | None) -> int:
    """``Dataset.join`` partition count: cluster-scaled like
    ``default_num_partitions`` but clamped by the smallest known input
    row count — a partition that receives an empty schema-less block
    raises ArrowInvalid (observed: tiny input + num_partitions > rows),
    so never spread fewer rows than 2× the partition count."""
    n = default_num_partitions()
    known = [r for r in row_counts if r is not None]
    if known:
        n = max(1, min(n, min(known) // 2))
    return n


@dataclass
class PipelineConfig:
    # turns per Arrow batch handed to the extraction actors. Emitter
    # cost is dominated by per-batch fixed work (polars query build,
    # emission frames), so bigger batches win almost linearly: 93k
    # rows/s/core at 16384 → 376k at 65536 in the single-core
    # microbench; the full build dropped 21.2 → 17.6 s at sf0.1/32 CPUs
    # (bigger extraction output blocks also halve the dedup+sort
    # exchange, 8.5 → 4.9 s). Ray bundles input blocks to reach the
    # batch size, so this also sets extraction task granularity
    # (~146 tasks over 24 actors at sf0.1). The fused witness-dedup
    # combiner sees more rows per call and collapses more (7.6M rows /
    # 1.2 GB materialized at 16384; less at 65536). Raw per-call memory
    # stays small (~300k edge rows before the in-call dedup).
    batch_size: int = 65536
    # extraction actor pool: sized from the cluster at pipeline build time
    # (None → ~3/4 of cluster CPUs, fixed size so there is no autoscale
    # ramp); each actor holds the CWE/CPE/alias dictionaries loaded once
    # in __init__.
    concurrency_min: int | None = None
    concurrency_max: int | None = None
    # resume granularity: input parquet files per checkpointed shard group
    # (None = single group — max pipelining; set smaller for finer resume,
    # mirroring the reference's 2000-record page checkpoint at a
    # distributed granularity).
    files_per_group: int | None = None
    # canonicalization label-propagation bound (alias graphs are shallow)
    cc_max_iters: int = 15
    # union-find placement: at or below this many candidate pairs the
    # component computation runs driver-side (the pair set is bounded by
    # the alias dictionary — the pipeline's small side, and measured at
    # ~4 ms for the fixture dictionaries, so keeping it off the cluster
    # is the FAST choice, not a shortcut); above it, the distributed
    # groupby label-propagation path takes over. 50k is a conservative
    # cutover: driver memory stays trivially bounded and the distributed
    # path is exercised well before pair volume could hurt.
    cc_driver_max_pairs: int = 50_000
    force_distributed_cc: bool = False
    # explicit hub-key salting for the distributed union-find: sub-group
    # count per node in the message groupby (1 = off; hub fan-out is
    # split across this many tasks when on)
    cc_salt: int = 4

    @property
    def concurrency(self) -> tuple[int, int] | int:
        if self.concurrency_min is None or self.concurrency_max is None:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 8)) \
                if ray.is_initialized() else 8
            lo = self.concurrency_min
            hi = self.concurrency_max
            if hi is None:
                # actors permanently reserve their CPU: leave ~1/4 of the
                # cluster (and never less than one whole CPU — a 2-CPU
                # cluster with 2 actors starves the read tasks and the
                # pipeline stalls) for read/write tasks. A 1-CPU cluster
                # cannot host an actor pool AND its feeding read tasks at
                # all — fail loudly instead of stalling forever.
                if cpus < 2:
                    raise ValueError(
                        "actor-pool stages need >= 2 CPUs (one actor + "
                        "one read/write slot); this cluster has "
                        f"{cpus} — raise num_cpus or set "
                        "concurrency_min/max explicitly")
                hi = max(1, min(cpus - 1, (cpus * 3) // 4))
            if lo is None:
                lo = hi  # fixed-size pool: full parallelism from the start
            lo = min(lo, hi)  # a pinned floor never exceeds the ceiling
            return (lo, hi) if lo != hi else hi
        return (self.concurrency_min, self.concurrency_max)
