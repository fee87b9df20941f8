"""Join operators beyond broadcast lookups.

- ``asof_join_events`` — per-key as-of join over an ordered log (each
  left event matched to the most recent right event at or before its
  timestamp). Ray Data has no native as-of join; semantics allow the
  (key, time-bucket) co-partition + pd.merge_asof composition (SURVEY.md
  custom operator path (a)), with per-bucket carry rows stitching the
  range boundaries so a hot key never serializes into one task.

- ``range_join_events`` — interval join (left.ts < right.ts ≤ left.ts+W)
  via the same (key, time-bucket) co-partition; the right side is
  replicated into its two reachable buckets so every pair meets in
  exactly one partition.

- ``hash_join_sum`` — both-sides-large shuffle hash join via
  ``Dataset.join`` (hash-partitioned on the key), demonstrated as
  orders ⨝ lineitem → revenue by order status.

- ``topk_per_group`` — per-group top-k with deterministic tie-breaks
  (block-local partial top-k is the combiner; the global per-key merge
  sees ≤ k rows per key per block).

- ``train_test_split`` — deterministic multiplicative-hash split
  (reproducible across engines: exact integer arithmetic, mirrored in
  the SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset



def asof_join_events(events: Dataset, *, left_type: str, right_type: str,
                     key: str = "user_id",
                     bucket_minutes: int = 60) -> Dataset:
    """For each `left_type` event: the most recent `right_type` event of
    the same key with ts ≤ left ts. Output: (left_id, right_id, key) —
    right_id null when no prior right event exists.
    ≡ DuckDB: ``FROM left ASOF JOIN right ON key AND left.ts >= right.ts``
    (but we keep unmatched lefts, i.e. ASOF LEFT JOIN).

    Skew-safe partitioning: events group by (key, time-bucket), not by
    key alone, so one hot key (a user holding half the log) spreads
    across its time range instead of serializing into one task. The
    range boundary is handled with one carry row per bucket: the best
    right event from all EARLIER buckets (a per-key exclusive prefix
    max over the per-bucket summaries — the summary table has one row
    per (key, bucket), so the per-key stitch stays tiny even when the
    raw key group would not). The result is bit-identical to the
    single-group merge_asof."""
    from uckg_ray.config import default_num_partitions

    from uckg_ray.partitioning import (key_bucket_partition_ids,
                                       key_partition_ids)

    bucket_us = bucket_minutes * 60 * 1_000_000
    n_parts = default_num_partitions()

    # the merge partition id is computed inline wherever rows are built
    # (tag, carries) so no extra map pass runs just to append it — each
    # pass over the block set costs ~1 s of task overhead at 32 CPUs

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        et = b.column("event_type")
        t = b.filter(pa.compute.or_(pc.equal(et, left_type),
                                    pc.equal(et, right_type)))
        ts_us = t.column("ts").cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        u = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = np.floor_divide(ts_us, bucket_us)
        return pa.table({
            key: pa.array(u, pa.int64()),
            "bucket": pa.array(bk, pa.int64()),
            "is_left": pc.equal(t.column("event_type"), left_type),
            "event_id": t.column("event_id").cast(pa.int64()),
            "ts_us": pa.array(ts_us, pa.int64()),
            "p": pa.array(key_bucket_partition_ids(u, bk, n_parts),
                          pa.int32()),
        })

    tagged = events.map_batches(tag, batch_format="pyarrow",
                                batch_size=None).materialize()

    # per-(key, bucket) summary: best right event (max ts, then max id —
    # exactly the row backward merge_asof would pick) + has-left flag;
    # block-local partial first, global merge inside key-hash partitions.
    # The key-hash stitch partition id "q" is emitted here inline.
    def summarize(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            key: b.column(key).to_numpy(zero_copy_only=False),
            "bucket": b.column("bucket").to_numpy(zero_copy_only=False),
            "is_left": b.column("is_left").to_numpy(zero_copy_only=False),
            "event_id": b.column("event_id").to_numpy(zero_copy_only=False),
            "ts_us": b.column("ts_us").to_numpy(zero_copy_only=False),
        })
        r = df[~df["is_left"]].sort_values(["ts_us", "event_id"]) \
            .groupby([key, "bucket"], sort=False).last().reset_index()
        r = r[[key, "bucket", "event_id", "ts_us"]]
        r["has_left"] = False
        le = (df[df["is_left"]][[key, "bucket"]].drop_duplicates()
              .assign(event_id=np.int64(-1), ts_us=np.int64(-2**62),
                      has_left=True))
        out = pd.concat([r, le], ignore_index=True)
        u = out[key].to_numpy(np.int64)
        q = key_partition_ids(u, n_parts)
        return pa.Table.from_pydict({
            key: pa.array(u, pa.int64()),
            "bucket": pa.array(out["bucket"].to_numpy(np.int64), pa.int64()),
            "event_id": pa.array(out["event_id"].to_numpy(np.int64), pa.int64()),
            "ts_us": pa.array(out["ts_us"].to_numpy(np.int64), pa.int64()),
            "has_left": pa.array(out["has_left"].to_numpy(bool), pa.bool_()),
            "q": pa.array(q, pa.int32()),
        })

    summaries = tagged.map_batches(summarize, batch_format="pyarrow",
                                   batch_size=None)

    def carries_partition(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized carry rows for EVERY key in one hash partition
        (one pandas pass per partition, never one call per key). Time
        buckets are time-ordered, so the best right event from all
        earlier buckets is simply the bucket-best of the nearest earlier
        bucket that has one — an exclusive shift + forward-fill within
        each key, no (ts, id) comparisons needed."""
        g = g.sort_values([key, "bucket", "ts_us", "event_id"],
                          ignore_index=True)
        # merge block partials: per (key, bucket) the last (ts,id)-sorted
        # right row is the bucket best; has_left is an OR. Real right
        # rows are has_left=False — selecting on the flag (not on
        # event_id >= 0) keeps genuine negative event ids distinct from
        # the has-left sentinel rows
        right = g[~g["has_left"]]
        best = (right.groupby([key, "bucket"], sort=False)
                [["event_id", "ts_us"]].last())
        flags = g.groupby([key, "bucket"], sort=False)["has_left"].any()
        s = flags.to_frame().join(best).reset_index()
        # exclusive prefix: shift bucket-best down one bucket row, then
        # forward-fill across right-less buckets — all within the key
        s["carry_id"] = s.groupby(key, sort=False)["event_id"].shift(1)
        s["carry_ts"] = s.groupby(key, sort=False)["ts_us"].shift(1)
        s["carry_id"] = s.groupby(key, sort=False)["carry_id"].ffill()
        s["carry_ts"] = s.groupby(key, sort=False)["carry_ts"].ffill()
        out = s[s["has_left"] & s["carry_id"].notna()]
        u = out[key].to_numpy(np.int64)
        bk = out["bucket"].to_numpy(np.int64)
        return pd.DataFrame({
            key: u,
            "bucket": bk,
            "is_left": np.zeros(len(out), dtype=bool),
            "event_id": out["carry_id"].to_numpy(np.int64),
            "ts_us": out["carry_ts"].to_numpy(np.int64),
            "p": key_bucket_partition_ids(u, bk, n_parts),
        })

    def to_arrow(b: pa.Table) -> pa.Table:
        # pin block type + schema so the union with `tagged` (arrow
        # blocks) is well-formed even for empty carry groups
        return pa.table({
            key: b.column(key).cast(pa.int64()),
            "bucket": b.column("bucket").cast(pa.int64()),
            "is_left": b.column("is_left").cast(pa.bool_()),
            "event_id": b.column("event_id").cast(pa.int64()),
            "ts_us": b.column("ts_us").cast(pa.int64()),
            "p": b.column("p").cast(pa.int32()),
        })

    # key-hash stitch partitions ("q", emitted by summarize): each key's
    # (tiny) summary rows co-locate so the shift+ffill stays within one
    # task; carry rows come out tagged with their merge partition "p"
    carry_ds = (summaries
                .groupby("q")
                .map_groups(lambda g: carries_partition(
                    g.drop(columns=["q"])), batch_format="pandas")
                .map_batches(to_arrow, batch_format="pyarrow"))

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        """ONE vectorized merge_asof per hash partition: ``by=[key,
        bucket]`` does every (key, bucket) group in a single call (the
        previous per-group map_groups dispatched one pandas call per
        micro-group — measured 13× slower at sf0.1). Carry rows sit in
        their target bucket with their original (earlier) timestamp, so
        backward matching inside the bucket remains exact."""
        left = g[g["is_left"]].sort_values(["ts_us", key, "bucket",
                                            "event_id"], ignore_index=True)
        right = g[~g["is_left"]].sort_values(["ts_us", key, "bucket",
                                              "event_id"],
                                             ignore_index=True)
        if len(left) == 0:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             key: pa.array([], pa.int64())})
        if len(right) == 0:
            return pa.table({
                "left_id": pa.array(left["event_id"].to_numpy(np.int64)),
                "right_id": pa.nulls(len(left), pa.int64()),
                key: pa.array(left[key].to_numpy(np.int64))})
        m = pd.merge_asof(
            left.rename(columns={"event_id": "left_id"}),
            right[[key, "bucket", "event_id", "ts_us"]].rename(
                columns={"event_id": "right_id"}),
            on="ts_us", by=[key, "bucket"], direction="backward")
        # right_id comes back float64 (NaN where unmatched); emit arrow
        # int64-with-nulls directly so no final cast pass is needed
        rid = m["right_id"].to_numpy()
        return pa.table({
            "left_id": pa.array(m["left_id"].to_numpy(np.int64)),
            "right_id": pa.array(np.where(np.isnan(rid), 0, rid)
                                 .astype(np.int64), pa.int64(),
                                 mask=np.isnan(rid)),
            key: pa.array(m[key].to_numpy(np.int64))})

    return (tagged.union(carry_ds)
            .groupby("p")
            .map_groups(lambda g: merge_partition(g.drop(columns=["p"])),
                        batch_format="pandas"))


def range_join_events(events: Dataset, *, left_type: str, right_type: str,
                      key: str = "user_id",
                      window_minutes: int = 30) -> Dataset:
    """Range (interval) join over the event log: every (left, right) pair
    of the same key with ``left.ts < right.ts <= left.ts + window``.
    Output: (left_id, right_id, key). Ray Data has no range join; this is
    the bucketed co-partition composition (SURVEY.md custom-operator
    path (a)).

    Scale shape: both sides hash-partition by (key, time-bucket) with
    bucket width = the window, and each RIGHT event is replicated into
    its own bucket and the previous one — the only two buckets whose
    left events can reach it. Every qualifying pair therefore meets in
    exactly ONE partition (the left event's bucket), so no dedup pass is
    needed. Per-partition matching is one vectorized pandas merge on
    (key, bucket) + a window filter; candidate volume inside a partition
    is bounded by events-per-key-per-2·window, the same order as the
    output itself. A hot key spreads across its time range instead of
    serializing into one task (same skew posture as ``asof_join_events``)."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_bucket_partition_ids

    window_us = window_minutes * 60 * 1_000_000
    n_parts = default_num_partitions()

    def tag(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        et = b.column("event_type")
        t = b.filter(pc.or_(pc.equal(et, left_type), pc.equal(et, right_type)))
        ts_us = (t.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
                 .to_numpy(zero_copy_only=False))
        u = t.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        is_left = pa.compute.equal(t.column("event_type"), left_type) \
            .to_numpy(zero_copy_only=False)
        ids = t.column("event_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bk = np.floor_divide(ts_us, window_us)
        # left rows once in their own bucket; right rows replicated into
        # (bucket, bucket-1)
        lu, lb, lid, lts = u[is_left], bk[is_left], ids[is_left], ts_us[is_left]
        ru, rb = u[~is_left], bk[~is_left]
        rid, rts = ids[~is_left], ts_us[~is_left]
        ou = np.concatenate([lu, ru, ru])
        ob = np.concatenate([lb, rb, rb - 1])
        return pa.table({
            key: pa.array(ou, pa.int64()),
            "bucket": pa.array(ob, pa.int64()),
            "is_left": pa.array(np.concatenate(
                [np.ones(len(lu), bool), np.zeros(2 * len(ru), bool)])),
            "event_id": pa.array(np.concatenate([lid, rid, rid]), pa.int64()),
            "ts_us": pa.array(np.concatenate([lts, rts, rts]), pa.int64()),
            "p": pa.array(key_bucket_partition_ids(ou, ob, n_parts),
                          pa.int32()),
        })

    def match_partition(g: pd.DataFrame) -> pa.Table:
        left = g[g["is_left"]]
        right = g[~g["is_left"]]
        if len(left) == 0 or len(right) == 0:
            return pa.table({"left_id": pa.array([], pa.int64()),
                             "right_id": pa.array([], pa.int64()),
                             key: pa.array([], pa.int64())})
        m = left[[key, "bucket", "event_id", "ts_us"]].rename(
            columns={"event_id": "left_id", "ts_us": "l_ts"}).merge(
            right[[key, "bucket", "event_id", "ts_us"]].rename(
                columns={"event_id": "right_id", "ts_us": "r_ts"}),
            on=[key, "bucket"])
        m = m[(m["r_ts"] > m["l_ts"]) & (m["r_ts"] <= m["l_ts"] + window_us)]
        return pa.table({
            "left_id": pa.array(m["left_id"].to_numpy(np.int64), pa.int64()),
            "right_id": pa.array(m["right_id"].to_numpy(np.int64), pa.int64()),
            key: pa.array(m[key].to_numpy(np.int64), pa.int64())})

    return (events.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("p")
            .map_groups(lambda g: match_partition(g.drop(columns=["p"])),
                        batch_format="pandas"))


def hash_join_sum(orders: Dataset, lineitem: Dataset,
                  num_partitions: int | None = None) -> Dataset:
    """orders ⨝ lineitem on orderkey (shuffle hash join, both sides
    large) → (o_orderstatus, n_items, sum_price_c100).

    num_partitions defaults to ``config.join_num_partitions()`` —
    cluster-scaled (CPUs / 4) but clamped by the smaller input's row
    count, since a join partition receiving an empty schema-less block
    raises ArrowInvalid on tiny inputs. The count() probes take the
    parquet-metadata fast path on bare reads; callers with expensive
    upstream pipelines should pass num_partitions explicitly."""
    from ray.data.aggregate import Sum

    from uckg_ray.config import join_num_partitions

    if num_partitions is None:
        num_partitions = join_num_partitions(orders.count(), lineitem.count())

    joined = lineitem.select_columns(["l_orderkey", "l_extendedprice"]).join(
        orders.select_columns(["o_orderkey", "o_orderstatus"]),
        join_type="inner",
        num_partitions=num_partitions,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def prep(b: pa.Table) -> pa.Table:
        vals = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "o_orderstatus": b.column("o_orderstatus"),
            "price_c100": pa.array(
                np.floor(vals * 100 + 0.5).astype(np.int64), pa.int64()),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64), pa.int64()),
        })

    return (joined.map_batches(prep, batch_format="pyarrow", batch_size=None)
            .groupby("o_orderstatus")
            .aggregate(Sum("n", alias_name="n_items"),
                       Sum("price_c100", alias_name="sum_price_c100")))


def anti_join_keys(left: Dataset, right: Dataset, *, left_key: str,
                   right_key: str, value_col: str | None = None,
                   out_key: str = "k", out_value: str = "v_c100",
                   semi: bool = False) -> Dataset:
    """Hash ANTI join (default) or SEMI join (``semi=True``): rows of
    `left` whose key has NO match / A match in `right` (``WHERE NOT
    EXISTS`` / ``WHERE EXISTS``). Ray's ``Dataset.join`` has neither
    type; this is the robust explicit-partition shape: both sides
    hash-partition on the key and each partition filters vectorized
    (``np.isin``). The right side's block-local distinct-keys pass is
    the combiner — the shuffle moves distinct keys, not raw rows.
    Output: (out_key, out_value) with out_value = integer cents of
    `value_col` (0 when value_col is None)."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids
    from uckg_ray.stages.relational import _cents

    n_parts = default_num_partitions()


    def tag_left(b: pa.Table) -> pa.Table:
        k = b.column(left_key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if value_col is None:
            v = np.zeros(len(k), dtype=np.int64)
        else:
            v = _cents(b.column(value_col))
        return pa.table({"k": pa.array(k, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "is_left": pa.array(np.ones(len(k), dtype=bool)),
                         "p": pa.array(key_partition_ids(k, n_parts), pa.int32())})

    def tag_right(b: pa.Table) -> pa.Table:
        k = np.unique(b.column(right_key).cast(pa.int64())
                      .to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(k, pa.int64()),
                         "v": pa.array(np.zeros(len(k), np.int64), pa.int64()),
                         "is_left": pa.array(np.zeros(len(k), dtype=bool)),
                         "p": pa.array(key_partition_ids(k, n_parts), pa.int32())})

    def filter_partition(g: pd.DataFrame) -> pa.Table:
        lk = g[g["is_left"]]
        seen = g.loc[~g["is_left"], "k"].to_numpy(np.int64)
        mask = np.isin(lk["k"].to_numpy(np.int64), seen)
        keep = lk[mask if semi else ~mask]
        return pa.table({
            out_key: pa.array(keep["k"].to_numpy(np.int64), pa.int64()),
            out_value: pa.array(keep["v"].to_numpy(np.int64), pa.int64())})

    tagged = (left.map_batches(tag_left, batch_format="pyarrow",
                               batch_size=None)
              .union(right.map_batches(tag_right, batch_format="pyarrow",
                                       batch_size=None)))
    return (tagged.groupby("p")
            .map_groups(lambda g: filter_partition(g.drop(columns=["p"])),
                        batch_format="pandas"))


def snapshot_diff(old: Dataset, new: Dataset, *, key_col: str = "doc_id",
                  text_col: str = "text") -> Dataset:
    """Incremental-update diff between two corpus snapshots — the
    distributed analogue of the reference's daily re-sync change
    detection (A6): rows are keyed by `key_col` and compared by a
    64-bit content hash of `text_col`.
    Output: (key, op) with op ∈ ('add', 'del', 'chg') — key only in the
    new snapshot / only in the old / in both with different content.

    Scale shape: each side reduces to (key, hash) inside its own block
    scan (the wide text never shuffles), both hash-partition on the key
    and each partition classifies with one vectorized outer merge."""
    import pandas as pd

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids
    from uckg_ray.stages.dedup import _stable64

    n_parts = default_num_partitions()

    def tag(is_new: bool):
        def f(b: pa.Table) -> pa.Table:
            k = b.column(key_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            texts = b.column(text_col).to_pylist()
            h = np.fromiter((_stable64(t) for t in texts), dtype=np.uint64,
                            count=len(texts))
            return pa.table({
                "k": pa.array(k, pa.int64()),
                "h": pa.array(h, pa.uint64()),
                "is_new": pa.array(np.full(len(k), is_new)),
                "p": pa.array(key_partition_ids(k, n_parts), pa.int32())})
        return f

    def classify(g: pd.DataFrame) -> pa.Table:
        # nullable UInt64 keeps hash equality exact through the outer
        # merge (numpy uint64 would decay to lossy float64 with NaNs)
        o = g[~g["is_new"]][["k", "h"]].assign(
            h=lambda d: d["h"].astype("UInt64"))
        n = g[g["is_new"]][["k", "h"]].assign(
            h=lambda d: d["h"].astype("UInt64"))
        m = o.merge(n, on="k", how="outer", suffixes=("_o", "_n"))
        add = m["h_o"].isna()
        del_ = m["h_n"].isna()
        chg = (~add & ~del_
               & (m["h_o"] != m["h_n"]).fillna(False).astype(bool))
        keep = m[add | del_ | chg]
        op = np.where(keep["h_o"].isna(), "add",
                      np.where(keep["h_n"].isna(), "del", "chg"))
        return pa.table({key_col: pa.array(keep["k"].to_numpy(np.int64),
                                           pa.int64()),
                         "op": pa.array(op.tolist(), pa.string())})

    tagged = (old.map_batches(tag(False), batch_format="pyarrow",
                              batch_size=None)
              .union(new.map_batches(tag(True), batch_format="pyarrow",
                                     batch_size=None)))
    return (tagged.groupby("p")
            .map_groups(lambda g: classify(g.drop(columns=["p"])),
                        batch_format="pandas"))


def priority_sample(ds: Dataset, *, group_col: str, id_col: str,
                    k: int = 20) -> Dataset:
    """Deterministic reservoir-style sample: the k rows per group with
    the smallest md5 priority of their id — a uniform pseudo-random
    sample that is reproducible across engines and runs (the
    distributed replacement for random reservoir sampling). Block-local
    partial k-smallest is the combiner; the per-group merge sees ≤ k
    rows per group per block. Priority = DuckDB
    ``md5_number_upper(CAST(id AS VARCHAR))``."""
    import pandas as pd

    from uckg_ray.stages.dedup import _stable64

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        pri = np.fromiter((_stable64(str(i)) for i in ids),
                          dtype=np.uint64, count=len(ids))
        df = pd.DataFrame({id_col: batch.column(id_col)
                           .cast(pa.int64()).to_numpy(zero_copy_only=False),
                           group_col: batch.column(group_col).to_pandas(),
                           "pri": pri})
        df = df.sort_values(["pri", id_col])
        return pa.Table.from_pandas(df.groupby(group_col, sort=False).head(k),
                                    preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pri", id_col]).head(k)
        return g[[id_col, group_col]]

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def topk_per_group(ds: Dataset, *, group_col: str, value_col: str,
                   id_col: str, k: int = 3) -> Dataset:
    """Top-k rows per group by value desc (ties → min id). Block-local
    partial top-k is the combiner; the groupby merge sees ≤ k rows per
    group per block."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, value_col, id_col]).to_pandas()
        df = df.sort_values([group_col, value_col, id_col],
                            ascending=[True, False, True])
        return pa.Table.from_pandas(df.groupby(group_col, sort=False)
                                    .head(k), preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col, id_col],
                          ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[[group_col, id_col, "rank"]]

    return (ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def train_test_split(ds: Dataset, *, id_col: str, train_pct: int = 80
                     ) -> Dataset:
    """(id, split) with split = 'train' iff Knuth-hash(id) mod 100 <
    train_pct. Exact integer arithmetic; ≡ SQL
    ``(id * 2654435761) % 4294967296 % 100 < train_pct``."""

    from uckg_ray.partitioning import knuth_mod100

    def split(batch: pa.Table) -> pa.Table:
        # null ids drop, matching the SQL oracle's NULL-comparison filter
        batch = batch.filter(pa.compute.is_valid(batch.column(id_col)))
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        h = knuth_mod100(ids)
        return pa.Table.from_pydict({
            id_col: batch.column(id_col).cast(pa.int64()),
            "split": pa.array(np.where(h < train_pct, "train", "test"),
                              pa.string()),
        })

    return ds.map_batches(split, batch_format="pyarrow")


def stratified_sample(ds: Dataset, *, id_col: str, group_col: str,
                      rates_pct: dict[str, int],
                      default_pct: int = 100) -> Dataset:
    """Deterministic per-group downsampling (corpus mixing): keep a row
    iff Knuth-hash(id) mod 100 < rate(group). Rates are integer
    percents per group value; unknown groups use default_pct. Exact
    integer arithmetic so the SQL oracle matches bit-for-bit; stateless
    map (no shuffle — the sample decision is pure per row)."""

    from uckg_ray.partitioning import knuth_mod100

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null ids drop, matching the SQL oracle's NULL-comparison filter
        batch = batch.filter(pa.compute.is_valid(batch.column(id_col)))
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # per-row rate via dictionary-encode: the Python dict lookup runs
        # once per DISTINCT group value per block, not once per row
        col = batch.column(group_col)
        enc = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)
        uniq = enc.dictionary.to_pylist()
        rate = np.array([rates_pct.get(g, default_pct) for g in uniq]
                        + [default_pct], np.uint64)  # tail = null group
        idx = enc.indices
        if idx.null_count:
            idx = pc.fill_null(idx, len(uniq))
        thresh = rate[idx.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(knuth_mod100(ids) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def source_mixture(docs: Dataset, *, group_col: str = "source",
                   budget: int = 10_000) -> Dataset:
    """Temperature-scaled source mixing table — the corpus re-weighting
    step of multilingual/multi-source LM data prep (alpha = 1/2 as in
    XLM-R's p_s ∝ n_s^alpha): per-source sampling weight proportional
    to sqrt(n_s), plus a largest-remainder integer allocation of a
    global document ``budget`` across sources.

    All arithmetic is exact-integer (``math.isqrt`` per source, integer
    div/mod for weights/quotas, remainder ties broken by source name)
    so the DuckDB oracle matches bit-for-bit. The per-source count is a
    block-local ``value_counts`` partial + one tiny Sum groupby; the
    largest-remainder pass runs on the driver over the per-SOURCE table
    (cardinality = #corpora, O(100s) at any data scale — the standard
    collapsed small side, same posture as q5's dictionary sides).
    Output: (source, n_docs, weight_ppm, quota) sorted by source;
    sum(quota) == budget exactly.
    """
    import math

    import ray
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = b.column(group_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        col = col.drop_null()  # SQL oracle filters NULL sources
        vc = pc.value_counts(col)
        return pa.table({group_col: vc.field("values"),
                         "n_docs": vc.field("counts")})

    rows = (docs.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("n_docs", alias_name="n_docs"))
            .take_all())
    rows.sort(key=lambda r: r[group_col])
    n = np.array([r["n_docs"] for r in rows], np.int64)
    s = np.array([math.isqrt(int(v)) for v in n], np.int64)
    tot = int(s.sum())
    if tot == 0:  # empty corpus → empty 4-column table, schema intact
        empty = pa.table({group_col: pa.array([], pa.string()),
                          "n_docs": pa.array([], pa.int64()),
                          "weight_ppm": pa.array([], pa.int64()),
                          "quota": pa.array([], pa.int64())})
        return ray.data.from_arrow(empty)
    weight_ppm = s * 1_000_000 // tot
    base = s * budget // tot
    rem = s * budget % tot
    leftover = int(budget - base.sum())
    # largest remainder, ties by source name (rows are name-sorted, so
    # a stable sort on -rem preserves name order inside equal remainders)
    order = np.argsort(-rem, kind="stable")
    quota = base.copy()
    quota[order[:leftover]] += 1
    out = pa.table({
        group_col: pa.array([r[group_col] for r in rows], pa.string()),
        "n_docs": pa.array(n),
        "weight_ppm": pa.array(weight_ppm),
        "quota": pa.array(quota)})
    return ray.data.from_arrow(out)


def mixture_sample(docs: Dataset, *, group_col: str = "source",
                   id_col: str = "doc_id",
                   budget: int = 10_000) -> Dataset:
    """Realize ``source_mixture``'s quotas as an actual deterministic
    subsample: for each source s, keep the quota_s docs with the
    smallest md5 priority of their id (the variable-k sibling of
    ``priority_sample`` — same DuckDB ``md5_number_upper`` priority,
    ties broken by id). The quota table is tiny (one row per corpus)
    and rides into the combiner closure; block-local per-source
    k_s-smallest is the combiner, so the per-group merge sees at most
    k_s rows per source per block. Output: (id, source) rows,
    Σ min(quota_s, n_s) of them — sqrt-temperature UP-weights small
    sources, so quota_s may exceed n_s; sampling without replacement
    then returns the whole source (an epoch-repetition schedule is the
    with-replacement story and out of scope here)."""
    import pyarrow.compute as pc

    from uckg_ray.stages.dedup import _stable64

    pruned = docs.select_columns([id_col, group_col])
    qrows = source_mixture(pruned, group_col=group_col,
                           budget=budget).take_all()
    k = {r[group_col]: int(r["quota"]) for r in qrows}

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(group_col)))
        ids = batch.column(id_col).to_pylist()
        pri = np.fromiter((_stable64(str(i)) for i in ids),
                          dtype=np.uint64, count=len(ids))
        df = pd.DataFrame({
            id_col: batch.column(id_col).cast(pa.int64())
            .to_numpy(zero_copy_only=False),
            group_col: batch.column(group_col).to_pandas(),
            "pri": pri})
        df = df.sort_values(["pri", id_col])
        cc = df.groupby(group_col, sort=False).cumcount().to_numpy()
        kv = df[group_col].map(k).fillna(0).to_numpy(dtype=np.int64)
        return pa.Table.from_pandas(df[cc < kv], preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        kk = k.get(g[group_col].iloc[0], 0)
        g = g.sort_values(["pri", id_col]).head(kk)
        return g[[id_col, group_col]]

    return (pruned.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby(group_col).map_groups(merge, batch_format="pandas"))


def cap_per_group(ds: Dataset, *, group_col: str, id_col: str,
                  cap: int) -> Dataset:
    """Per-group document cap — the "at most N docs per source/domain"
    curation rule applied before corpus mixing. Deterministic and
    seed-free: within each group, rows rank by the full-width Knuth
    hash of their id (ties → min id) and only the first ``cap``
    survive, so reruns and resharded inputs select the identical set.
    Output: the kept (group, id) pairs. ≡ SQL ``row_number() OVER
    (PARTITION BY g ORDER BY (id*2654435761)%4294967296, id) <= cap``.

    Scale shape: the block-local partial keeps ≤ cap rows per group
    per block (the same k-smallest combiner as topk_per_group), so the
    groupby merge shuffles ≤ cap · #blocks rows per group — never the
    corpus; a hot group costs one task the final cap-row selection."""
    import pandas as pd

    from uckg_ray.partitioning import knuth32

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.is_valid(batch.column(id_col)))
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            group_col: batch.column(group_col).to_numpy(
                zero_copy_only=False),
            id_col: ids, "_h": knuth32(ids).astype(np.int64)})
        df = df.sort_values([group_col, "_h", id_col])
        return pa.Table.from_pandas(
            df.groupby(group_col, sort=False).head(cap),
            preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col]).head(cap)
        return g[[group_col, id_col]]

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
            .groupby(group_col).map_groups(merge, batch_format="pandas"))
