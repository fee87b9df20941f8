"""Paged REST collection with retry/backoff and offset checkpointing.

Re-expresses the reference's live NVD collectors
(``data_collection/cve_collection.py:26-33`` ``try_call`` retry loop;
``:311-336`` the ``cve_meta`` offset/``init_finished`` checkpoint row;
``:349-375`` the startIndex/resultsPerPage page loop with 403/503
throttle retries and save-and-exit early abort) as an engine component
with the TRANSPORT INJECTED: this container has no network, and the
collector's value is the paging/retry/checkpoint/shard discipline, not
an HTTP client. A deployment passes ``fetch=lambda offset, n:`` around
``requests.get``; tests pass a scripted fake.

Semantics kept from the reference:

- retry with backoff on throttle/error statuses, bounded attempts;
  after the last failed attempt the collector CHECKPOINTS AND EXITS
  cleanly (partial progress survives) instead of raising mid-page.
- the offset checkpoint is written after every page, so a crash or
  early exit resumes at the first unfetched record; a finished
  collection is marked ``init_finished`` and reruns are no-ops.
- a short page (fewer than ``page_size`` records) terminates.

Scale posture: one collector instance per endpoint is inherently
sequential (offset paging + API rate limits — same as the reference),
but each page lands as its own parquet shard under ``out_dir/pages/``,
so the 100-TB ingest side streams ``read_parquet`` over the shard tree
with full parallelism and a failed collection never refetches finished
pages. Multiple endpoints/feeds fan out as independent collectors.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

#: transport contract: fetch(offset, page_size) -> (status_code, records)
#: status 200 + records = a page; any other status = retryable failure
#: (the reference treats 403/503 as throttling and everything else as
#: retry-then-give-up; we retry all non-200s uniformly, bounded).
Fetch = Callable[[int, int], tuple[int, Sequence[dict[str, Any]]]]


@dataclass
class CollectorResult:
    finished: bool            # init_finished: short page seen
    pages_fetched: int        # pages fetched THIS run (resume excludes old)
    records_fetched: int
    offset: int               # next unfetched record index
    retries: int              # failed attempts that were retried this run
    backoffs: list[float] = field(default_factory=list)  # sleeps requested


def _meta_path(out_dir: str) -> str:
    return os.path.join(out_dir, "collect_meta.json")


def read_collect_meta(out_dir: str) -> dict:
    """The checkpoint row (analogue of the reference's ``cve_meta``
    SQLite table: offset + init_finished)."""
    try:
        with open(_meta_path(out_dir)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError):
        return {"offset": 0, "init_finished": False, "pages": 0}


def _write_meta(out_dir: str, meta: dict) -> None:
    tmp = _meta_path(out_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, _meta_path(out_dir))


def collect_paged(fetch: Fetch, out_dir: str, *, page_size: int = 2000,
                  max_retries: int = 4, backoff_base_sec: float = 10.0,
                  backoff_factor: float = 1.0,
                  sleep: Callable[[float], None] | None = None,
                  schema: pa.Schema | None = None,
                  max_pages: int | None = None) -> CollectorResult:
    """Run (or resume) a paged collection into ``out_dir``.

    Each fetched page is written as ``pages/page-{offset:012d}.parquet``
    (offset-named: a rerun that refetches the same offset overwrites
    the same shard — idempotent, never duplicated) and the checkpoint
    advances only after the shard is durably on disk.

    ``backoff_factor=1.0`` reproduces the reference's fixed 10-second
    waits; >1 gives exponential backoff. ``sleep`` is injectable so
    tests assert the schedule without waiting. ``max_pages`` bounds one
    run (operational batching) without marking the feed finished.
    """
    import glob

    sleep = sleep or (lambda _s: None)
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    # bound crash-orphaned partial writes: any .page-*.tmp is from a
    # run that died mid-write and its page will be refetched anyway
    for orphan in glob.glob(os.path.join(out_dir, ".page-*.tmp")):
        os.unlink(orphan)
    meta = read_collect_meta(out_dir)
    result = CollectorResult(finished=bool(meta.get("init_finished")),
                             pages_fetched=0, records_fetched=0,
                             offset=int(meta.get("offset", 0)), retries=0)
    if result.finished:
        return result                      # reference: "already complete"

    while max_pages is None or result.pages_fetched < max_pages:
        status, records = fetch(result.offset, page_size)
        attempt = 0
        while status != 200 and attempt < max_retries:
            delay = backoff_base_sec * (backoff_factor ** attempt)
            result.backoffs.append(delay)
            sleep(delay)
            attempt += 1
            result.retries += 1
            status, records = fetch(result.offset, page_size)
        if status != 200:
            # reference: "unable to receive response, saving and exiting"
            _write_meta(out_dir, {"offset": result.offset,
                                  "init_finished": False,
                                  "pages": meta.get("pages", 0)
                                  + result.pages_fetched})
            return result

        records = list(records)
        if records:
            table = (pa.Table.from_pylist(records, schema=schema)
                     if schema is not None else pa.Table.from_pylist(records))
            shard = os.path.join(out_dir, "pages",
                                 f"page-{result.offset:012d}.parquet")
            # tmp lives OUTSIDE pages/: a crash-orphaned partial write
            # must never be visible to the ingest read
            tmp = os.path.join(out_dir, f".page-{result.offset:012d}.tmp")
            pq.write_table(table, tmp)
            os.replace(tmp, shard)
            result.offset += len(records)
            result.records_fetched += len(records)
            result.pages_fetched += 1
        if len(records) < page_size:
            result.finished = True         # short page: feed exhausted
            break
        _write_meta(out_dir, {"offset": result.offset,
                              "init_finished": False,
                              "pages": meta.get("pages", 0)
                              + result.pages_fetched})

    _write_meta(out_dir, {"offset": result.offset,
                          "init_finished": result.finished,
                          "pages": meta.get("pages", 0)
                          + result.pages_fetched})
    return result


def collected_dataset(out_dir: str, **read_kwargs):
    """The ingest side: stream the collected shard tree as a Dataset
    (file-parallel; pass ``columns=[...]`` to prune at the read)."""
    import ray.data
    read_kwargs.setdefault("file_extensions", ["parquet"])
    return ray.data.read_parquet(os.path.join(out_dir, "pages"),
                                 **read_kwargs)
