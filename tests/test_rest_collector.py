"""Paged REST collector: retry/backoff, offset checkpoint, resume,
idempotent page shards (transport injected — no network in CI)."""

import os

from uckg_ray.sources.rest import (CollectorResult, collect_paged,
                                   collected_dataset, read_collect_meta)


def _feed(n_records):
    """A well-behaved paged endpoint over n_records synthetic rows."""
    rows = [{"id": i, "name": f"rec-{i:04d}"} for i in range(n_records)]

    def fetch(offset, page_size):
        return 200, rows[offset:offset + page_size]
    return rows, fetch


def test_collect_happy_path(tmp_path, ray_session):
    out = str(tmp_path / "feed")
    rows, fetch = _feed(25)
    r = collect_paged(fetch, out, page_size=10)
    assert isinstance(r, CollectorResult)
    assert (r.finished, r.pages_fetched, r.records_fetched, r.offset,
            r.retries) == (True, 3, 25, 25, 0)
    shards = sorted(os.listdir(os.path.join(out, "pages")))
    assert shards == ["page-000000000000.parquet",
                      "page-000000000010.parquet",
                      "page-000000000020.parquet"]
    got = sorted(row["id"] for row in collected_dataset(out).take_all())
    assert got == list(range(25))          # every record exactly once
    assert read_collect_meta(out)["init_finished"] is True
    # rerun after finish is a no-op — fetch must never be called
    def boom(offset, page_size):
        raise AssertionError("finished feed must not refetch")
    r2 = collect_paged(boom, out, page_size=10)
    assert r2.finished and r2.pages_fetched == 0


def test_throttle_retry_then_success(tmp_path):
    out = str(tmp_path / "feed")
    rows, base = _feed(15)
    throttles = iter([503, 503])
    calls = []

    def fetch(offset, page_size):
        calls.append(offset)
        if offset == 10:
            try:
                return next(throttles), []
            except StopIteration:
                pass
        return base(offset, page_size)

    slept = []
    r = collect_paged(fetch, out, page_size=10, sleep=slept.append)
    assert r.finished and r.records_fetched == 15 and r.retries == 2
    assert r.backoffs == [10.0, 10.0] == slept   # reference's fixed waits


def test_exponential_backoff_schedule(tmp_path):
    out = str(tmp_path / "feed")

    def always_down(offset, page_size):
        return 503, []
    slept = []
    r = collect_paged(always_down, out, page_size=10, max_retries=4,
                      backoff_factor=2.0, sleep=slept.append)
    assert not r.finished and r.retries == 4
    assert slept == [10.0, 20.0, 40.0, 80.0]


def test_giveup_checkpoints_and_resume_refetches_nothing(tmp_path,
                                                         ray_session):
    out = str(tmp_path / "feed")
    rows, base = _feed(35)
    healthy = [True]
    offsets_seen = []

    def fetch(offset, page_size):
        offsets_seen.append(offset)
        if offset >= 20 and not healthy[0]:
            return 503, []
        return base(offset, page_size)

    healthy[0] = False                       # endpoint dies after 2 pages
    r1 = collect_paged(fetch, out, page_size=10, max_retries=2,
                       sleep=lambda _s: None)
    assert not r1.finished and r1.offset == 20 and r1.pages_fetched == 2
    assert read_collect_meta(out)["offset"] == 20

    healthy[0] = True                        # endpoint recovers; resume
    offsets_seen.clear()
    r2 = collect_paged(fetch, out, page_size=10)
    assert r2.finished and r2.offset == 35 and r2.pages_fetched == 2
    assert min(offsets_seen) == 20           # finished pages never refetch
    got = sorted(row["id"] for row in collected_dataset(out).take_all())
    assert got == list(range(35))


def test_max_pages_bounds_run_without_finishing(tmp_path):
    out = str(tmp_path / "feed")
    rows, fetch = _feed(100)
    r = collect_paged(fetch, out, page_size=10, max_pages=3)
    assert not r.finished and r.offset == 30 and r.pages_fetched == 3
    m = read_collect_meta(out)
    assert m["offset"] == 30 and m["init_finished"] is False
    r2 = collect_paged(fetch, out, page_size=10)      # finish the feed
    assert r2.finished and r2.offset == 100 and r2.pages_fetched == 7
