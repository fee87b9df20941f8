"""Stream-shaped operators over the ordered `events` log.

Ray Data has no event-time windowing; tumbling windows are expressed as
a computed window-key column + groupby (the ordering assumption: events
are processed by (user_id, window) key, not arrival order — ts is data,
not time). Sums are carried as integer cents so the DuckDB oracle
matches bit-for-bit (float accumulation order never matters).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum


def tumbling_window_agg(events: Dataset, *, every: str = "hour") -> Dataset:
    """(user_id, window_start, n_events, sum_value_c100) per tumbling
    window. Per-block partial aggregation is the combiner; the global
    groupby moves ≤ one row per (user, window) per block."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        from uckg_ray.stages.relational import _cents
        win = pc.floor_temporal(batch.column("ts"), unit=every)
        df = pd.DataFrame({
            "user_id": batch.column("user_id").to_numpy(zero_copy_only=False),
            "window_start": win.to_numpy(zero_copy_only=False),
            "c": _cents(batch.column("value")),
        })
        g = (df.groupby(["user_id", "window_start"], sort=False)["c"]
             .agg(n_events="size", sum_value_c100="sum").reset_index())
        return pa.Table.from_pydict({
            "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
            "window_start": pa.array(
                g["window_start"].to_numpy().astype("datetime64[us]"),
                pa.timestamp("us")),
            "n_events": pa.array(g["n_events"].to_numpy(np.int64), pa.int64()),
            "sum_value_c100": pa.array(
                g["sum_value_c100"].to_numpy(np.int64), pa.int64()),
        })

    return (events.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["user_id", "window_start"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value_c100", alias_name="sum_value_c100")))


def sessionize(events: Dataset, *, gap_minutes: int = 30,
               bucket_minutes: int = 60) -> Dataset:
    """Session windows per user: a new session starts when the gap from
    the previous event exceeds `gap_minutes`.
    Output: (user_id, session_start_us, n_events, duration_us).

    Skew-safe partitioning: events hash-partition by (user, time-bucket)
    and each partition computes maximal intra-bucket session FRAGMENTS
    (start, end, count) for ALL its (user, bucket) groups in ONE
    vectorized pandas pass (a sort + run-break cumsum — never one
    Python call per micro-group; the per-group map_groups variant
    measured 25 s vs <4 s at sf0.1/32 CPUs). A second partition pass by
    user stitches consecutive fragments whose boundary gap is ≤ the
    session gap. The stitch input holds fragments, not events — bounded
    by #buckets + #sessions per user, so one hot user (half the log)
    spreads its event volume across (user, bucket) partitions instead
    of one giant group. Result is identical to single-group
    sessionization: fragments are maximal runs within buckets, so the
    only possible merges are at fragment boundaries, which the stitch
    tests exactly."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import (key_bucket_partition_ids,
                                       key_partition_ids)

    gap_us = gap_minutes * 60 * 1_000_000
    bucket_us = bucket_minutes * 60 * 1_000_000
    n_parts = default_num_partitions()

    def tag(b: pa.Table) -> pa.Table:
        # partition id computed here (hash of (user, bucket)) — one map
        # pass feeds the fragment shuffle directly
        ts_us = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        u = (b.column("user_id").cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        bk = np.floor_divide(ts_us, bucket_us)
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "bucket": pa.array(bk, pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "p": pa.array(key_bucket_partition_ids(u, bk, n_parts),
                          pa.int32()),
        })

    def fragments_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Maximal gap-bounded runs within every (user, bucket) group of
        one hash partition, in one vectorized pass: sort by (user,
        bucket, ts), break a run at any user/bucket change or gap."""
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "start_us": pd.Series([], dtype="int64"),
                "end_us": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "q": pd.Series([], dtype="int32")})
        g = g.sort_values(["user_id", "bucket", "ts_us"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        bk = g["bucket"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        brk = np.ones(len(ts), dtype=bool)
        brk[1:] = ((u[1:] != u[:-1]) | (bk[1:] != bk[:-1])
                   | ((ts[1:] - ts[:-1]) > gap_us))
        fid = np.cumsum(brk) - 1
        users = u[brk]
        # stitch partition id (hash of user alone) rides along so the
        # second shuffle needs no extra map pass
        q = key_partition_ids(users, n_parts)
        return pd.DataFrame({
            "user_id": users,
            "start_us": ts[brk],
            "end_us": ts[np.append(brk[1:], True)],
            "n": np.bincount(fid).astype(np.int64),
            "q": q})

    def stitch_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Merge consecutive fragments (gap ≤ gap_us) for every user in
        one hash partition — same sort + run-break shape."""
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "session_start_us": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "duration_us": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "start_us"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        s = g["start_us"].to_numpy(np.int64)
        e = g["end_us"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        brk = np.ones(len(s), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | ((s[1:] - e[:-1]) > gap_us)
        sid = np.cumsum(brk) - 1
        out_start = s[brk]
        out_end = e[np.append(brk[1:], True)]
        out_n = np.bincount(sid, weights=n).astype(np.int64)
        return pd.DataFrame({
            "user_id": u[brk],
            "session_start_us": out_start,
            "n_events": out_n,
            "duration_us": out_end - out_start})

    frags = (events.map_batches(tag, batch_format="pyarrow", batch_size=None)
             .groupby("p")
             .map_groups(lambda g: fragments_partition(
                 g.drop(columns=["p"])), batch_format="pandas"))
    return (frags.groupby("q")
            .map_groups(lambda g: stitch_partition(g.drop(columns=["q"])),
                        batch_format="pandas"))


def running_aggregates(events: Dataset, *, key: str = "user_id",
                       bucket_hours: int = 6) -> Dataset:
    """Per-key ordered window functions over the event log — the
    distributed prefix scan. For every event, ordered by (ts, event_id)
    within its key: ``rn`` (row_number), ``run_sum_c100`` (running sum
    of integer cents, inclusive), ``prev_event_id`` (lag(event_id),
    null for the key's first event).
    ≡ SQL ``row_number()/sum() ROWS UNBOUNDED PRECEDING/lag() OVER
    (PARTITION BY key ORDER BY ts, event_id)``.

    Scale shape (textbook two-pass scan, no per-key single group):
    1. events hash-partition by (key, time-bucket); ONE vectorized pass
       per partition computes in-bucket rn/cumsum/lag for all its
       (key, bucket) groups (sort + segmented cumsum) and a one-row
       summary (n, sum, last_id) per (key, bucket).
    2. summaries (one row per key×bucket, tiny) hash-partition by key;
       an exclusive shift+cumsum per key yields each bucket's offsets
       and carry-in lag.
    3. offsets union back with the in-bucket rows, co-partitioned on the
       same (key, bucket) hash, and one vectorized merge adds them.
    A hot key spreads its events across its time range; only its
    per-bucket summary rows (#buckets, not #events) ever co-locate."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import (key_bucket_partition_ids,
                                       key_partition_ids)
    from uckg_ray.stages.relational import _cents

    bucket_us = bucket_hours * 3600 * 1_000_000
    n_parts = default_num_partitions()


    def tag(b: pa.Table) -> pa.Table:
        ts_us = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        u = b.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = np.floor_divide(ts_us, bucket_us)
        return pa.table({
            key: pa.array(u, pa.int64()),
            "bucket": pa.array(bk, pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "event_id": b.column("event_id").cast(pa.int64()),
            "c": pa.array(_cents(b.column("value")), pa.int64()),
            "p": pa.array(key_bucket_partition_ids(u, bk, n_parts),
                          pa.int32()),
        })

    def scan_partition(g: pd.DataFrame) -> pa.Table:
        """In-bucket scan for every (key, bucket) group of one hash
        partition, one vectorized pass: sort, segment-break at group
        changes, segmented cumsum/rank/shift. Emits event rows and
        summary rows (is_summary=True: rn0→n, csum0→sum, prev0→last_id)
        in one table; `p` re-tags both for the stage-3 merge shuffle and
        `q` routes summaries to their per-key stitch partition."""
        g = g.sort_values([key, "bucket", "ts_us", "event_id"],
                          ignore_index=True)
        u = g[key].to_numpy(np.int64)
        bk = g["bucket"].to_numpy(np.int64)
        ids = g["event_id"].to_numpy(np.int64)
        c = g["c"].to_numpy(np.int64)
        n = len(g)
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (bk[1:] != bk[:-1])
        seg = np.cumsum(brk) - 1
        # segmented rank + inclusive cumsum (subtract each segment's
        # running total at its start)
        idx = np.arange(n, dtype=np.int64)
        seg_start = idx[brk]
        rn0 = idx - seg_start[seg] + 1
        cs = np.cumsum(c)
        base = np.concatenate([[0], cs[seg_start[1:] - 1]]) if n else cs
        csum0 = cs - base[seg]
        prev0 = np.empty(n, dtype=np.int64)
        prev0[1:] = ids[:-1]
        prev0_valid = ~brk  # first row of each segment has no in-bucket lag
        seg_end = np.append(seg_start[1:] - 1, n - 1) if n else idx
        su, sb = u[seg_start], bk[seg_start]
        ev = pa.table({
            key: pa.array(u, pa.int64()),
            "bucket": pa.array(bk, pa.int64()),
            "event_id": pa.array(ids, pa.int64()),
            "rn0": pa.array(rn0, pa.int64()),
            "csum0": pa.array(csum0, pa.int64()),
            "prev0": pa.array(np.where(prev0_valid, prev0, 0), pa.int64(),
                              mask=~prev0_valid),
            "is_summary": pa.array(np.zeros(n, dtype=bool)),
            "p": pa.array(key_bucket_partition_ids(u, bk, n_parts),
                          pa.int32()),
            "q": pa.array(np.zeros(n, dtype=np.int32), pa.int32()),
        })
        sm = pa.table({
            key: pa.array(su, pa.int64()),
            "bucket": pa.array(sb, pa.int64()),
            "event_id": pa.array(np.zeros(len(su), np.int64), pa.int64()),
            "rn0": pa.array(rn0[seg_end], pa.int64()),          # n in bucket
            "csum0": pa.array(csum0[seg_end], pa.int64()),      # bucket sum
            "prev0": pa.array(ids[seg_end], pa.int64()),        # last id
            "is_summary": pa.array(np.ones(len(su), dtype=bool)),
            "p": pa.array(np.zeros(len(su), np.int32), pa.int32()),
            "q": pa.array(key_partition_ids(su, n_parts), pa.int32()),
        })
        return pa.concat_tables([ev, sm])

    def empty_scan() -> pa.Table:
        return pa.table({
            key: pa.array([], pa.int64()), "bucket": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "rn0": pa.array([], pa.int64()), "csum0": pa.array([], pa.int64()),
            "prev0": pa.array([], pa.int64()),
            "is_summary": pa.array([], pa.bool_()),
            "p": pa.array([], pa.int32()), "q": pa.array([], pa.int32())})

    scanned = (events.map_batches(tag, batch_format="pyarrow",
                                  batch_size=None)
               .groupby("p")
               .map_groups(lambda g: scan_partition(g.drop(columns=["p"]))
                           if len(g) else empty_scan(),
                           batch_format="pandas")
               .materialize())

    def _take(want_summary: bool):
        def f(b: pa.Table) -> pa.Table:
            mask = b.column("is_summary")
            if not want_summary:
                mask = pa.compute.invert(mask)
            return b.filter(mask)
        return f

    events_scanned = scanned.map_batches(_take(False), batch_format="pyarrow",
                                         batch_size=None)
    summaries = scanned.map_batches(_take(True), batch_format="pyarrow",
                                    batch_size=None)

    def offsets_partition(g: pd.DataFrame) -> pa.Table:
        """Exclusive per-key prefix over the (time-ordered) bucket
        summaries of one key-hash partition: offsets into rn / running
        sum, plus the carry-in lag (last id of the previous nonempty
        bucket)."""
        g = g.sort_values([key, "bucket"], ignore_index=True)
        u = g[key].to_numpy(np.int64)
        bk = g["bucket"].to_numpy(np.int64)
        n = g["rn0"].to_numpy(np.int64)
        s = g["csum0"].to_numpy(np.int64)
        last = g["prev0"].to_numpy(np.int64)
        m = len(g)
        first = np.ones(m, dtype=bool)
        first[1:] = u[1:] != u[:-1]
        # exclusive cumsum within key
        cn, cs_ = np.cumsum(n), np.cumsum(s)
        idx = np.arange(m)
        start = idx[first]
        kseg = np.cumsum(first) - 1
        base_n = np.concatenate([[0], cn[start[1:] - 1]]) if m else cn
        base_s = np.concatenate([[0], cs_[start[1:] - 1]]) if m else cs_
        off_n = np.concatenate([[0], cn[:-1]]) - base_n[kseg] if m else cn
        off_s = np.concatenate([[0], cs_[:-1]]) - base_s[kseg] if m else cs_
        off_n[first] = 0
        off_s[first] = 0
        carry = np.empty(m, dtype=np.int64)
        carry[1:] = last[:-1]
        carry_valid = ~first
        return pa.table({
            key: pa.array(u, pa.int64()),
            "bucket": pa.array(bk, pa.int64()),
            "off_n": pa.array(off_n, pa.int64()),
            "off_s": pa.array(off_s, pa.int64()),
            "carry_prev": pa.array(np.where(carry_valid, carry, 0),
                                   pa.int64(), mask=~carry_valid),
            "p": pa.array(key_bucket_partition_ids(u, bk, n_parts),
                          pa.int32()),
        })

    def empty_offsets() -> pa.Table:
        return pa.table({
            key: pa.array([], pa.int64()), "bucket": pa.array([], pa.int64()),
            "off_n": pa.array([], pa.int64()), "off_s": pa.array([], pa.int64()),
            "carry_prev": pa.array([], pa.int64()),
            "p": pa.array([], pa.int32())})

    offsets = (summaries
               .groupby("q")
               .map_groups(lambda g: offsets_partition(
                   g.drop(columns=["q", "p", "event_id", "is_summary"]))
                   if len(g) else empty_offsets(),
                   batch_format="pandas"))

    def widen_events(b: pa.Table) -> pa.Table:
        z = pa.nulls(b.num_rows, pa.int64())
        return pa.table({
            key: b.column(key), "bucket": b.column("bucket"),
            "event_id": b.column("event_id"), "rn0": b.column("rn0"),
            "csum0": b.column("csum0"), "prev0": b.column("prev0"),
            "off_n": z, "off_s": z, "carry_prev": z,
            "is_ev": pa.array(np.ones(b.num_rows, dtype=bool)),
            "p": b.column("p")})

    def widen_offsets(b: pa.Table) -> pa.Table:
        z = pa.nulls(b.num_rows, pa.int64())
        return pa.table({
            key: b.column(key), "bucket": b.column("bucket"),
            "event_id": z, "rn0": z, "csum0": z, "prev0": z,
            "off_n": b.column("off_n"), "off_s": b.column("off_s"),
            "carry_prev": b.column("carry_prev"),
            "is_ev": pa.array(np.zeros(b.num_rows, dtype=bool)),
            "p": b.column("p")})

    unioned = (events_scanned
               .drop_columns(["is_summary", "q"])
               .map_batches(widen_events, batch_format="pyarrow",
                            batch_size=None)
               .union(offsets.map_batches(widen_offsets,
                                          batch_format="pyarrow",
                                          batch_size=None)))

    def merge_partition(g: pd.DataFrame) -> pa.Table:
        ev = g[g["is_ev"]]
        off = g[~g["is_ev"]]
        if len(ev) == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             key: pa.array([], pa.int64()),
                             "rn": pa.array([], pa.int64()),
                             "run_sum_c100": pa.array([], pa.int64()),
                             "prev_event_id": pa.array([], pa.int64())})
        m = ev[[key, "bucket", "event_id", "rn0", "csum0", "prev0"]].merge(
            off[[key, "bucket", "off_n", "off_s", "carry_prev"]],
            on=[key, "bucket"], how="left")
        off_n = m["off_n"].fillna(0).to_numpy(np.int64)
        off_s = m["off_s"].fillna(0).to_numpy(np.int64)
        prev0 = m["prev0"]
        carry = m["carry_prev"]
        # in-bucket lag wins; the bucket's first event takes the carry-in
        prev = prev0.where(prev0.notna(), carry)
        pv = prev.to_numpy(dtype=object)
        mask = prev.isna().to_numpy()
        return pa.table({
            "event_id": pa.array(m["event_id"].to_numpy(np.int64), pa.int64()),
            key: pa.array(m[key].to_numpy(np.int64), pa.int64()),
            "rn": pa.array(m["rn0"].to_numpy(np.int64) + off_n, pa.int64()),
            "run_sum_c100": pa.array(
                m["csum0"].to_numpy(np.int64) + off_s, pa.int64()),
            "prev_event_id": pa.array(
                np.where(mask, 0, pv).astype(np.int64),
                pa.int64(), mask=mask)})

    return (unioned.groupby("p")
            .map_groups(lambda g: merge_partition(g.drop(columns=["p"])),
                        batch_format="pandas"))


def hopping_window_agg(events: Dataset, *, size_minutes: int = 60,
                       hop_minutes: int = 15) -> Dataset:
    """Hopping (sliding) windows: each event lands in size/hop
    overlapping epoch-aligned windows. Vectorized flat emission
    (numpy repeat, one row per (event, hop offset)) feeds a per-block
    partial aggregate, then the global groupby — the same combiner
    shape as tumbling windows, ×(size/hop) message volume.

    Output: (user_id, window_start_us, n_events, sum_value_c100) with
    window_start_us = (floor(ts/hop) - k) * hop for k in 0..size/hop-1
    (exactly the windows whose [start, start+size) contains ts).
    size must be a multiple of hop."""
    import pandas as pd

    if size_minutes % hop_minutes:
        raise ValueError("size_minutes must be a multiple of hop_minutes")
    hop_us = hop_minutes * 60 * 1_000_000
    n_hops = size_minutes // hop_minutes

    def partial(batch: pa.Table) -> pa.Table:
        from uckg_ray.stages.relational import _cents
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        cents = _cents(batch.column("value"))
        base = (ts // hop_us) * hop_us
        k = np.tile(np.arange(n_hops, dtype=np.int64), len(ts))
        starts = np.repeat(base, n_hops) - k * hop_us
        df = pd.DataFrame({
            "user_id": np.repeat(users, n_hops),
            "window_start_us": starts,
            "c": np.repeat(cents, n_hops),
        })
        g = (df.groupby(["user_id", "window_start_us"], sort=False)["c"]
             .agg(n_events="size", sum_value_c100="sum").reset_index())
        return pa.Table.from_pydict({
            "user_id": pa.array(g["user_id"].to_numpy(), pa.int64()),
            "window_start_us": pa.array(
                g["window_start_us"].to_numpy(np.int64), pa.int64()),
            "n_events": pa.array(g["n_events"].to_numpy(np.int64), pa.int64()),
            "sum_value_c100": pa.array(
                g["sum_value_c100"].to_numpy(np.int64), pa.int64()),
        })

    return (events.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["user_id", "window_start_us"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value_c100", alias_name="sum_value_c100")))


def event_funnel(events: Dataset,
                 steps: tuple[str, ...] = ("view", "click", "purchase"),
                 *, num_partitions: int | None = None) -> Dataset:
    """Ordered conversion funnel: how many users performed step 1, step
    2 strictly after their first step 1, step 3 strictly after that
    reach, … (first-occurrence semantics — t_k is the earliest step-k
    event after t_{k-1}). Output: (step_idx 1.., step, n_users), one
    row per step.

    Scale shape: rows are pruned to funnel event types at the read,
    users are hash-co-partitioned ONCE (`key_partition_ids` — every
    user's history lands whole in one partition), each partition runs
    the k-step chain as vectorized polars joins over (user, ts) frames,
    and the per-partition counts merge with a k-row Sum groupby. Skew
    note: the per-user state is one timestamp per step, so even a
    pathological hot user costs O(its events) in one partition, never
    cross-partition traffic."""
    import polars as pl

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    if num_partitions is None:
        num_partitions = default_num_partitions()
    step_list = list(steps)

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        b = b.filter(pc.is_in(b.column("event_type"),
                              pa.array(step_list, pa.string())))
        users = b.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "ts": b.column("ts").cast(pa.int64()),
            "p": pa.array(key_partition_ids(users, num_partitions),
                          pa.int32())})

    _OUT = pa.schema([("step_idx", pa.int64()), ("step", pa.string()),
                      ("n_users", pa.int64())])

    def funnel_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(["user_id", "event_type", "ts"]))
        counts = []
        cur = None           # (user_id, t): users who reached the step
        for s in step_list:
            ev = df.filter(pl.col("event_type") == s)
            if cur is None:
                cur = ev.group_by("user_id").agg(pl.col("ts").min().alias("t"))
            else:
                cur = (ev.join(cur, on="user_id")
                       .filter(pl.col("ts") > pl.col("t"))
                       .group_by("user_id")
                       .agg(pl.col("ts").min().alias("t")))
            counts.append(cur.height)
        return pa.table({
            "step_idx": pa.array(range(1, len(step_list) + 1), pa.int64()),
            "step": pa.array(step_list, pa.string()),
            "n_users": pa.array(counts, pa.int64())})

    # seed a zero row per step so an input with no funnel events still
    # yields the k-row funnel (matching the SQL oracle's UNION ALL of
    # scalar counts) — the same empty-input seeding as events_rollup
    import ray.data
    seed = ray.data.from_arrow(pa.table({
        "step_idx": pa.array(range(1, len(step_list) + 1), pa.int64()),
        "step": pa.array(step_list, pa.string()),
        "n_users": pa.array([0] * len(step_list), pa.int64())}))
    return (events.select_columns(["user_id", "event_type", "ts"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(funnel_partition, batch_format="pyarrow")
            .union(seed)
            .groupby(["step_idx", "step"])
            .aggregate(Sum("n_users", alias_name="n_users")))


def retention_cohorts(events: Dataset, *,
                      num_partitions: int | None = None) -> Dataset:
    """Classic retention-cohort matrix over the event stream: users are
    cohorted by the calendar day of their FIRST event; for every
    (cohort_day, day_offset) pair the output counts how many cohort
    members were active exactly ``day_offset`` days after their first
    day. Days are exact integer epoch days (``ts_us // 86_400e6`` ==
    DuckDB ``datediff('day', DATE '1970-01-01', CAST(ts AS DATE))`` for
    the fixture's positive timestamps), so the SQL oracle value-hashes
    match. Output: (cohort_day, day_offset, n_users).

    Scale shape: blocks collapse to distinct (user, day) rows BEFORE
    the exchange (the combiner — a user active 1000× one day ships one
    row); ONE user-keyed hash co-partition lands each user's history
    whole; per-partition polars derives first day + offsets and
    collapses to per-(cohort, offset) PARTIAL counts — bounded by
    active-days², never events — then a tiny Sum groupby merges
    partitions. Mirrors the funnel's skew posture: a hot user costs
    O(its distinct days) in one partition, no cross-partition traffic."""
    import polars as pl

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    if num_partitions is None:
        num_partitions = default_num_partitions()

    US_PER_DAY = 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = b.column("user_id").to_numpy(zero_copy_only=False)
        df = (pl.DataFrame({"user_id": users, "day": ts // US_PER_DAY})
              .unique())                    # block-local distinct
        u = df["user_id"].to_numpy()
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "day": pa.array(df["day"].to_numpy(), pa.int64()),
            "p": pa.array(key_partition_ids(u, num_partitions),
                          pa.int32())})

    _OUT = pa.schema([("cohort_day", pa.int64()),
                      ("day_offset", pa.int64()),
                      ("n_users", pa.int64())])

    def part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(g.select(["user_id", "day"])).unique()
        d0 = df.group_by("user_id").agg(pl.col("day").min().alias("d0"))
        out = (df.join(d0, on="user_id")
               .group_by([pl.col("d0").alias("cohort_day"),
                          (pl.col("day") - pl.col("d0"))
                          .alias("day_offset")])
               .agg(pl.len().cast(pl.Int64).alias("n_users")))
        t = out.to_arrow()
        return pa.table({
            "cohort_day": t.column("cohort_day").cast(pa.int64()),
            "day_offset": t.column("day_offset").cast(pa.int64()),
            "n_users": t.column("n_users").cast(pa.int64())})

    def pin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OUT.empty_table()
        return pa.table({
            "cohort_day": b.column("cohort_day").cast(pa.int64()),
            "day_offset": b.column("day_offset").cast(pa.int64()),
            "n_users": b.column("n_users").cast(pa.int64())})

    return (events.select_columns(["user_id", "ts"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(part, batch_format="pyarrow")
            .groupby(["cohort_day", "day_offset"])
            .aggregate(Sum("n_users", alias_name="n_users"))
            .map_batches(pin, batch_format="pyarrow", batch_size=None))


def window_distinct_users(events: Dataset, *,
                          size_minutes: int = 15) -> Dataset:
    """Per (tumbling window, event_type) exact event count and distinct
    user count — ``COUNT(DISTINCT user_id)`` over fixed epoch-aligned
    windows, the standard reach/audience metric. Two-phase distinct:
    the block-local (window, type, user) dedup+count is the combiner
    (shuffle 1 moves distinct triples with partial counts, never raw
    events); after the global triple Sum every (window, type, user) is
    one row, so the per-(window, type) roll-up (rows → n_users, summed
    counts → n_events) runs over the bounded deduped table. Shuffle
    volume is capped by #windows × #types × #active-users, independent
    of event count. numpy ``//`` floors, so pre-1970 timestamps align
    identically to the oracle's sign-safe modulo splice."""
    import pandas as pd

    w_us = size_minutes * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "window_start_us": (ts // w_us) * w_us,
            "event_type": batch.column("event_type").to_pandas(),
            "user_id": batch.column("user_id").to_numpy(
                zero_copy_only=False)})
        g = (df.groupby(["window_start_us", "event_type", "user_id"],
                        sort=False).size().reset_index(name="n"))
        return pa.Table.from_pydict({
            "window_start_us": pa.array(
                g["window_start_us"].to_numpy(np.int64), pa.int64()),
            "event_type": g["event_type"].tolist(),
            "user_id": pa.array(g["user_id"].to_numpy(np.int64),
                                pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64())})

    def rollup(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "n" not in batch.schema.names:
            return pa.table({
                "window_start_us": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "n_events": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64())})
        df = pd.DataFrame({
            "window_start_us": batch.column("window_start_us").to_pandas(),
            "event_type": batch.column("event_type").to_pandas(),
            "n": batch.column("n").to_pandas()})
        g = (df.groupby(["window_start_us", "event_type"], sort=False)["n"]
             .agg(n_events="sum", n_users="size").reset_index())
        return pa.Table.from_pydict({
            "window_start_us": pa.array(
                g["window_start_us"].to_numpy(np.int64), pa.int64()),
            "event_type": g["event_type"].tolist(),
            "n_events": pa.array(g["n_events"].to_numpy(np.int64),
                                 pa.int64()),
            "n_users": pa.array(g["n_users"].to_numpy(np.int64),
                                pa.int64())})

    return (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby(["window_start_us", "event_type", "user_id"])
            .aggregate(Sum("n", alias_name="n"))
            .map_batches(rollup, batch_format="pyarrow", batch_size=None)
            .groupby(["window_start_us", "event_type"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_users", alias_name="n_users")))


def dow_hour_profile(events: Dataset) -> Dataset:
    """Temporal activity heatmap: event count and integer-cent value
    sum per (day-of-week, hour-of-day) — the seasonality profile a
    traffic/load dashboard draws. Day-of-week is pure integer epoch
    arithmetic (0 = Thursday 1970-01-01, matching the SQL oracle's
    identical expression — no engine dayname() conventions to
    reconcile); timestamps are µs, numpy ``//`` floors and every
    operand is post-1970 in the fixture so truncation vs floor can't
    diverge. One block-local partial into a ≤ 7×24-row Sum groupby."""
    import pandas as pd

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from uckg_ray.stages.relational import _cents

        ts = batch.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        days = ts // DAY_US
        dow = ((days % 7) + 7) % 7
        hour = (ts % DAY_US) // 3_600_000_000
        g = (pd.DataFrame({"dow": dow, "hour": hour,
                           "c": _cents(batch.column("value"))})
             .groupby(["dow", "hour"], sort=False)["c"]
             .agg(n_events="size", sum_value_c100="sum").reset_index())
        return pa.table({
            "dow": pa.array(g["dow"].to_numpy(np.int64), pa.int64()),
            "hour": pa.array(g["hour"].to_numpy(np.int64), pa.int64()),
            "n_events": pa.array(g["n_events"].to_numpy(np.int64),
                                 pa.int64()),
            "sum_value_c100": pa.array(
                g["sum_value_c100"].to_numpy(np.int64), pa.int64())})

    return (events.select_columns(["ts", "value"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby(["dow", "hour"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value_c100", alias_name="sum_value_c100")))


def latest_per_key(events: Dataset, *, key_col: str = "user_id",
                   ts_col: str = "ts",
                   tie_col: str = "event_id") -> Dataset:
    """Latest-record-per-key compaction — the CDC/upsert-merge
    primitive that collapses an append-only change log to current
    state: for every key keep the row with the max timestamp (ties →
    max ``tie_col``). Block-local argmax per key is the combiner, so
    the per-key merge sees ≤ 1 row per key per block and the shuffle
    moves one row per (key, block), independent of log length.
    Output: (key, event_id, ts_us, event_type)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key_col: batch.column(key_col).to_numpy(
                zero_copy_only=False),
            "ts_us": batch.column(ts_col).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            tie_col: batch.column(tie_col).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            "event_type": batch.column("event_type").to_pandas()})
        df = df.sort_values(["ts_us", tie_col])
        keep = df.groupby(key_col, sort=False).tail(1)
        return pa.table({
            key_col: pa.array(keep[key_col].to_numpy(np.int64),
                              pa.int64()),
            tie_col: pa.array(keep[tie_col].to_numpy(np.int64),
                              pa.int64()),
            "ts_us": pa.array(keep["ts_us"].to_numpy(np.int64),
                              pa.int64()),
            "event_type": pa.array(keep["event_type"].tolist(),
                                   pa.string())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts_us", tie_col])
        return g.tail(1)[[key_col, tie_col, "ts_us", "event_type"]]

    return (events.select_columns([key_col, ts_col, tie_col,
                                   "event_type"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby(key_col).map_groups(merge, batch_format="pandas"))


def activity_streaks(events: Dataset) -> Dataset:
    """Gaps-and-islands per user: collapse the event log to distinct
    active days, then report each user's total active days, number of
    maximal consecutive-day streaks, and longest streak — the
    engagement/retention statistic behind "7-day streak" product
    metrics, and the classic windowed islands query expressed without
    a global sort.

    Plan: block-distinct ``(user, epoch_day)`` combiner → ONE global
    distinct exchange (bounded by users × days, not events) → hash
    partition by user (a user's distinct days are calendar-bounded, so
    even the hottest user fits a partition) → per-partition vectorized
    run-break scan (sort + diff, no Python per group)."""
    import pandas as pd
    import polars as pl

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    DAY_US = 86_400_000_000
    n_parts = default_num_partitions()

    _DAYS = pa.schema([("user_id", pa.int64()), ("day", pa.int64())])

    def day_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _DAYS.empty_table()
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        u = (b.column("user_id").cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        d = (pl.DataFrame({"user_id": u, "day": ts // DAY_US})
             .unique())
        return pa.table({"user_id": d["user_id"].to_arrow(),
                         "day": d["day"].to_arrow()})

    def tag(b: pa.Table) -> pa.Table:
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        return b.append_column(
            "q", pa.array(key_partition_ids(u, n_parts), pa.int32()))

    def islands_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_active_days": pd.Series([], dtype="int64"),
                "n_streaks": pd.Series([], dtype="int64"),
                "max_streak": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "day"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        d = g["day"].to_numpy(np.int64)
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | ((d[1:] - d[:-1]) > 1)
        sid = np.cumsum(brk) - 1
        run_len = np.bincount(sid).astype(np.int64)
        runs = pd.DataFrame({"user_id": u[brk], "len": run_len})
        out = (runs.groupby("user_id", sort=False)["len"]
               .agg(n_active_days="sum", n_streaks="size",
                    max_streak="max").reset_index())
        return out.astype({"user_id": "int64", "n_active_days": "int64",
                           "n_streaks": "int64", "max_streak": "int64"})

    from ray.data.aggregate import Count

    return (events.select_columns(["user_id", "ts"])
            .map_batches(day_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby(["user_id", "day"])
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("q")
            .map_groups(lambda g: islands_partition(g.drop(columns=["q"])),
                        batch_format="pandas"))


def event_gap_stats(events: Dataset) -> Dataset:
    """Inter-arrival profile: exact integer statistics of the gaps
    between each user's consecutive events, grouped by the TYPE of the
    later event — (event_type, n_gaps, sum_gap_us, min_gap_us,
    max_gap_us), the arrival-process descriptor behind rate-limit /
    burst tuning. Per-user ordering is established inside (user,
    time-bucket) co-partitions with carry rows (the ``sessionize`` /
    ``running_aggregates`` partitioning), expressed here with a direct
    user-keyed partition: a user's events are calendar-bounded, so the
    hot-user partition load is bounded; the gap stream then folds to a
    ≤ |types|-row Sum/Min/Max groupby with block partials."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    from ray.data.aggregate import Max, Min, Sum

    n_parts = default_num_partitions()

    def tag(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        u = (b.column("user_id").cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "event_type": b.column("event_type").cast(pa.string()),
            "event_id": b.column("event_id").cast(pa.int64()),
            "q": pa.array(key_partition_ids(u, n_parts), pa.int32())})

    def gaps_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype="object"),
                "n_gaps": pd.Series([], dtype="int64"),
                "sum_gap_us": pd.Series([], dtype="int64"),
                "min_gap_us": pd.Series([], dtype="int64"),
                "max_gap_us": pd.Series([], dtype="int64")})
        # event_id tiebreak keeps simultaneous events deterministic
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gap = np.empty(len(u), np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        d = pd.DataFrame({"event_type": g["event_type"].to_numpy()[same],
                          "gap": gap[same]})
        out = (d.groupby("event_type", sort=False)["gap"]
               .agg(n_gaps="size", sum_gap_us="sum", min_gap_us="min",
                    max_gap_us="max").reset_index())
        return out.astype({"n_gaps": "int64", "sum_gap_us": "int64",
                           "min_gap_us": "int64", "max_gap_us": "int64"})

    return (events.select_columns(["user_id", "ts", "event_type",
                                   "event_id"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("q")
            .map_groups(lambda g: gaps_partition(g.drop(columns=["q"])),
                        batch_format="pandas")
            .groupby("event_type")
            .aggregate(Sum("n_gaps", alias_name="n_gaps"),
                       Sum("sum_gap_us", alias_name="sum_gap_us"),
                       Min("min_gap_us", alias_name="min_gap_us"),
                       Max("max_gap_us", alias_name="max_gap_us")))


def peak_burst(events: Dataset, *, window_minutes: int = 60) -> Dataset:
    """Per-user peak burst rate: the maximum number of events falling
    in ANY trailing ``window_minutes`` window ``[t - W, t]`` anchored
    at an event — the rate-limit / abuse-detection statistic a
    tumbling window underestimates (a burst straddling two tumbling
    buckets splits; the trailing window sees it whole). Exact RANGE
    window semantics: events sharing the anchor timestamp count as
    peers (matches SQL ``RANGE BETWEEN W PRECEDING AND CURRENT ROW``).

    One user-keyed exchange; each partition sorts its users' events
    once and runs a two-sided ``searchsorted`` per user — the inner
    scan is numpy over that user's timestamps (calendar-bounded), the
    per-user Python step is bounded by users-per-partition, not
    events."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids

    W = window_minutes * 60 * 1_000_000
    n_parts = default_num_partitions()

    def tag(b: pa.Table) -> pa.Table:
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        u = (b.column("user_id").cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        return pa.table({
            "user_id": pa.array(u, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "q": pa.array(key_partition_ids(u, n_parts), pa.int32())})

    def burst_partition(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "max_burst": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "ts_us"], ignore_index=True)
        u = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        bounds = np.r_[starts, len(u)]
        users, peaks = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            t = ts[s:e]
            # left side on the lower bound: [t-W, t] inclusive both
            # ends, = SQL RANGE BETWEEN W PRECEDING AND CURRENT ROW
            lo = np.searchsorted(t, t - W, side="left")
            hi = np.searchsorted(t, t, side="right")
            users.append(u[s])
            peaks.append(int((hi - lo).max()))
        return pd.DataFrame({"user_id": np.array(users, np.int64),
                             "max_burst": np.array(peaks, np.int64)})

    return (events.select_columns(["user_id", "ts"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("q")
            .map_groups(lambda g: burst_partition(g.drop(columns=["q"])),
                        batch_format="pandas"))
