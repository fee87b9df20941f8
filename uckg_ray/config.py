"""Pipeline tuning knobs, sized for a fixed multi-node cluster but tested
single-node. All shuffle-relevant choices are explicit here."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class PipelineConfig:
    # turns per Arrow batch handed to the extraction actors; each turn emits
    # ~10-20 narrow edge rows, so 4096 turns ≈ 50-80k edge rows per output
    # batch — well under block-size limits even with IRI-length strings.
    batch_size: int = 4096
    # extraction actor pool: (min, max) autoscaling; each actor holds the
    # CWE/CPE/alias dictionaries loaded once in __init__.
    concurrency_min: int = 2
    concurrency_max: int = 16
    # resume granularity: input parquet files per checkpointed shard group
    # (None = single group — max pipelining; set smaller for finer resume,
    # mirroring the reference's 2000-record page checkpoint at a
    # distributed granularity).
    files_per_group: int | None = None
    # canonicalization label-propagation bound (alias graphs are shallow)
    cc_max_iters: int = 15

    @property
    def concurrency(self) -> tuple[int, int]:
        return (self.concurrency_min, self.concurrency_max)
