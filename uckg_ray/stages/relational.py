"""Relational building blocks over the TPC-H-ish tables — demonstrates
the engine's aggregate/join surface (the reference's count-audit ops A1/J7
generalized). Money sums are integer cents so oracles match exactly.

Also the distributed order/statistics operators a training-data curation
pass needs over an event log:

- ``grouped_quantiles`` — EXACT discrete quantiles per group without a
  global sort: values are integer cents (bounded cardinality), so a
  per-block (group, value)→count histogram is the combiner, the shuffle
  moves only distinct (group, value) rows, and the final per-group
  selection walks a tiny cumulative histogram. Matches DuckDB
  ``quantile_disc`` bit-for-bit (index = max(0, ceil(q·n) − 1) into the
  sorted multiset — verified against DuckDB 1.x empirically).
- ``distinct_count_per_key`` — exact COUNT(DISTINCT) via two-phase
  aggregation: block-local (key, value) dedup+count is the combiner, so
  the shuffle moves distinct pairs, never raw events.
- ``pivot_counts`` — pivot the event log to one wide row per key
  (per-category counts). The category set is a declared argument so the
  output schema is static (streaming execution needs a fixed schema);
  unseen categories land in ``n_other``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def _cents(col) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(vals * 100 + 0.5).astype(np.int64)


def _no_nulls(batch: pa.Table, col: str, op: str) -> None:
    """Loud null-key guard (repo convention): pandas groupby silently
    DROPS null keys while SQL GROUP BY emits a NULL group row — a
    silent divergence; raising makes the non-null contract explicit."""
    if batch.column(col).null_count:
        raise ValueError(f"{op}: null values in group column {col!r}")


def _cent_histogram(events: Dataset, group_col: str, value_col: str
                    ) -> Dataset:
    """Shared distributed (group, cent) → count histogram: block-local
    combiner, then one global Sum groupby — the combiner both
    ``grouped_quantiles`` and ``grouped_mode`` consume (single
    definition so fixes stay atomic)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        _no_nulls(batch, group_col, "cent_histogram")
        c = _cents(batch.column(value_col))
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(),
                           "c": c})
        g = df.groupby([group_col, "c"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pydict({
            group_col: g[group_col].tolist(),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64())})

    return (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby([group_col, "c"]).aggregate(Sum("n", alias_name="n")))


def q1_pricing(lineitem: Dataset, cutoff: str = "1998-09-01") -> Dataset:
    """TPC-H Q1-shaped pricing summary: filter by shipdate, group by
    (returnflag, linestatus), integer-cent sums + counts. The filter and
    the cents transform are one vectorized Arrow pass; per-block partial
    aggregation happens inside Ray's aggregate."""
    cut = np.datetime64(cutoff)

    def prep(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        keep = ship <= cut
        b = batch.filter(pa.array(keep))
        qty = _cents(b.column("l_quantity"))
        price = _cents(b.column("l_extendedprice"))
        return pa.Table.from_pydict({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "qty_c100": pa.array(qty, pa.int64()),
            "price_c100": pa.array(price, pa.int64()),
            "n": pa.array(np.ones(len(qty), dtype=np.int64), pa.int64()),
        })

    return (lineitem.map_batches(prep, batch_format="pyarrow", batch_size=None)
            .groupby(["l_returnflag", "l_linestatus"])
            .aggregate(Sum("qty_c100", alias_name="sum_qty_c100"),
                       Sum("price_c100", alias_name="sum_price_c100"),
                       Sum("n", alias_name="count_order")))


def orders_by_nation(orders: Dataset, customer_tbl: pa.Table,
                     nation_tbl: pa.Table) -> Dataset:
    """Broadcast hash join: orders ⨝ customer ⨝ nation (dimension side
    built once on the driver, shipped via closure capture — the
    ray.put-once pattern for small sides), grouped by nation name.
    Output: (n_name, n_orders, sum_total_c100)."""
    cust_nation = dict(zip(customer_tbl.column("c_custkey").to_pylist(),
                           customer_tbl.column("c_nationkey").to_pylist()))
    nation_name = dict(zip(nation_tbl.column("n_nationkey").to_pylist(),
                           nation_tbl.column("n_name").to_pylist()))

    def join(batch: pa.Table) -> pa.Table:
        import pandas as pd
        cust = pd.Series(batch.column("o_custkey").to_numpy(zero_copy_only=False))
        total = _cents(batch.column("o_totalprice"))
        names = cust.map(cust_nation).map(nation_name).tolist()
        return pa.Table.from_pydict({
            "n_name": names,
            "total_c100": pa.array(total, pa.int64()),
            "n": pa.array(np.ones(len(names), dtype=np.int64), pa.int64()),
        })

    return (orders.map_batches(join, batch_format="pyarrow", batch_size=None)
            .groupby("n_name")
            .aggregate(Sum("n", alias_name="n_orders"),
                       Sum("total_c100", alias_name="sum_total_c100")))


def grouped_quantiles(events: Dataset, *, group_col: str = "event_type",
                      value_col: str = "value",
                      qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> Dataset:
    """Exact discrete quantiles of integer cents per group.
    Output: (group, n, p<q>_c100 ...) — e.g. p50_c100, p90_c100, p99_c100.

    Scale shape: no global sort. The per-block combiner collapses events
    to a (group, cent)→count histogram, the groupby sums those partials
    (shuffle volume = distinct (group, cent) pairs, bounded by value
    cardinality × #groups, independent of row count), and the final
    per-group selection scans the sorted cumulative histogram. Exactly
    DuckDB's ``quantile_disc``: the element at index
    max(0, ceil(q·n) − 1) of the sorted-with-duplicates multiset."""
    import pandas as pd

    # round, not truncate: int(0.29*100) == 28. Names must be unique or
    # the pick dict would silently drop a quantile.
    names = [f"p{round(q * 100)}_c100" for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"quantile column names collide: {names}")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 **{nm: pd.Series([], dtype="int64")
                                    for nm in names}})
        g = g.sort_values("c", ignore_index=True)
        cum = g["n"].to_numpy(np.int64).cumsum()
        total = int(cum[-1])
        out = {group_col: [g[group_col].iloc[0]], "n": [total]}
        vals = g["c"].to_numpy(np.int64)
        for q, nm in zip(qs, names):
            idx = max(0, math.ceil(q * total) - 1)
            # smallest cent whose cumulative count exceeds idx
            out[nm] = [int(vals[np.searchsorted(cum, idx, side="right")])]
        return pd.DataFrame(out)

    return (_cent_histogram(events, group_col, value_col)
            .groupby(group_col).map_groups(pick, batch_format="pandas"))


def grouped_mad(events: Dataset, *, group_col: str = "event_type",
                value_col: str = "value") -> Dataset:
    """Robust per-group scale: exact discrete median and median
    absolute deviation in integer cents. Output: (group, n,
    median_c100, mad_c100), both picks DuckDB ``quantile_disc(·, 0.5)``
    semantics (element at max(0, ceil(n/2) - 1) of the sorted
    multiset).

    Scale shape: BOTH statistics come from ONE pass over the shared
    ``_cent_histogram`` — the median from the cumulative scan, and the
    deviation median from folding the same histogram around it
    (|c - m| with counts re-summed), so the raw events are read once
    and never re-shuffled; the SQL oracle needs a two-pass join to say
    the same thing. Shuffle volume stays bounded by value cardinality ×
    #groups, independent of row count."""
    import pandas as pd

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 **{nm: pd.Series([], dtype="int64")
                                    for nm in ("n", "median_c100",
                                               "mad_c100")}})
        g = g.sort_values("c", ignore_index=True)
        cnt = g["n"].to_numpy(np.int64)
        cum = cnt.cumsum()
        total = int(cum[-1])
        vals = g["c"].to_numpy(np.int64)
        idx = max(0, math.ceil(0.5 * total) - 1)
        m = int(vals[np.searchsorted(cum, idx, side="right")])
        # fold the histogram around m: |c - m| keyed counts re-summed
        dev = np.abs(vals - m)
        order = np.argsort(dev, kind="stable")
        dv, dc = dev[order], cnt[order]
        brk = np.ones(len(dv), dtype=bool)
        brk[1:] = dv[1:] != dv[:-1]
        dvals = dv[brk]
        dcum = dc.cumsum()[np.concatenate([brk[1:], [True]])]
        mad = int(dvals[np.searchsorted(dcum, idx, side="right")])
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "n": [total], "median_c100": [m],
                             "mad_c100": [mad]})

    return (_cent_histogram(events, group_col, value_col)
            .groupby(group_col).map_groups(pick, batch_format="pandas"))


def grouped_trimmed_sum(events: Dataset, *, group_col: str = "event_type",
                        value_col: str = "value",
                        q_lo: float = 0.1, q_hi: float = 0.9) -> Dataset:
    """Robust (winsor-window) aggregate: per group, the quantile_disc
    bounds [p(q_lo), p(q_hi)] and the count + integer-cent sum of the
    values inside them — the outlier-trimmed statistic a curation
    pipeline reports instead of a skew-dominated mean. Output:
    (group, n_total, lo_c100, hi_c100, n_kept, sum_kept_c100).

    Scale shape: identical to ``grouped_quantiles`` — the shared
    ``_cent_histogram`` combiner bounds shuffle volume by value
    cardinality × #groups; bounds AND the trimmed sum both come from
    one scan of the per-group sorted histogram (the raw events are
    never re-read, unlike the SQL oracle's two-pass join)."""
    import pandas as pd

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 **{nm: pd.Series([], dtype="int64")
                                    for nm in ("n_total", "lo_c100",
                                               "hi_c100", "n_kept",
                                               "sum_kept_c100")}})
        g = g.sort_values("c", ignore_index=True)
        cnt = g["n"].to_numpy(np.int64)
        cum = cnt.cumsum()
        total = int(cum[-1])
        vals = g["c"].to_numpy(np.int64)
        bounds = []
        for q in (q_lo, q_hi):
            idx = max(0, math.ceil(q * total) - 1)
            bounds.append(int(vals[np.searchsorted(cum, idx,
                                                   side="right")]))
        lo, hi = bounds
        keep = (vals >= lo) & (vals <= hi)
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]], "n_total": [total],
            "lo_c100": [lo], "hi_c100": [hi],
            "n_kept": [int(cnt[keep].sum())],
            "sum_kept_c100": [int((vals[keep] * cnt[keep]).sum())]})

    return (_cent_histogram(events, group_col, value_col)
            .groupby(group_col).map_groups(pick, batch_format="pandas"))


def distinct_count_per_key(events: Dataset, *, key_col: str = "user_id",
                           value_col: str = "event_type") -> Dataset:
    """(key, n_events, n_distinct) — exact COUNT(*) + COUNT(DISTINCT v)
    per key. Two-phase: the block-local (key, value) dedup+count is the
    combiner (shuffle 1 moves distinct pairs with partial counts); after
    the global (key, value) sum each pair is one row, so a second
    two-phase aggregate per key (rows → n_distinct, summed counts →
    n_events) runs over the tiny deduped table."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({key_col: batch.column(key_col).to_pandas(),
                           "v": batch.column(value_col).to_pandas()})
        g = df.groupby([key_col, "v"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pydict({
            key_col: pa.array(g[key_col].to_numpy(np.int64), pa.int64()),
            "v": g["v"].tolist(),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
        })

    def per_key_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key_col not in batch.schema.names:
            # groupby().aggregate() can emit schema-less empty blocks
            return pa.table({key_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_types": pa.array([], pa.int64())})
        df = pd.DataFrame({key_col: batch.column(key_col).to_pandas(),
                           "n": batch.column("n").to_pandas()})
        g = (df.groupby(key_col, sort=False)["n"]
             .agg(n_events="sum", n_types="size").reset_index())
        return pa.Table.from_pydict({
            key_col: pa.array(g[key_col].to_numpy(np.int64), pa.int64()),
            "n_events": pa.array(g["n_events"].to_numpy(np.int64), pa.int64()),
            "n_types": pa.array(g["n_types"].to_numpy(np.int64), pa.int64()),
        })

    return (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby([key_col, "v"]).aggregate(Sum("n", alias_name="n"))
            .map_batches(per_key_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby(key_col)
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_types", alias_name="n_types")))


def rollup_counts(events: Dataset, *, l1: str = "event_type",
                  l2: str = "user_id", value_col: str = "value",
                  cube: bool = False) -> Dataset:
    """``GROUP BY ROLLUP(l1, l2)``: counts + integer-cent sums at three
    hierarchy levels — (l1, l2), (l1, NULL), (NULL, NULL) — with NULLs
    marking rolled-up columns, exactly like the SQL ROLLUP rows.
    ``cube=True`` adds the (NULL, l2) grouping set, completing
    ``GROUP BY CUBE(l1, l2)``.

    Scale shape: the raw data is scanned ONCE (block-local partial at
    the finest level, one (l1, l2) shuffle); the coarser levels are
    re-aggregated from the materialized finest-level table, whose size
    is bounded by the key-combination cardinality, not the row count."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        c = _cents(batch.column(value_col))
        df = pd.DataFrame({l1: batch.column(l1).to_pandas(),
                           l2: batch.column(l2).to_numpy(
                               zero_copy_only=False).astype(np.int64),
                           "c": c})
        g = (df.groupby([l1, l2], sort=False)["c"]
             .agg(n="size", sum_c100="sum").reset_index())
        return pa.Table.from_pydict({
            l1: g[l1].tolist(),
            l2: pa.array(g[l2].to_numpy(np.int64), pa.int64()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "sum_c100": pa.array(g["sum_c100"].to_numpy(np.int64),
                                 pa.int64()),
        })

    def pin(b: pa.Table) -> pa.Table:
        # groupby().aggregate() can emit schema-less empty blocks
        if b.num_rows == 0 or l1 not in b.schema.names:
            return pa.table({l1: pa.array([], pa.string()),
                             l2: pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_c100": pa.array([], pa.int64())})
        return pa.table({l1: b.column(l1).cast(pa.string()),
                         l2: b.column(l2).cast(pa.int64()),
                         "n": b.column("n").cast(pa.int64()),
                         "sum_c100": b.column("sum_c100").cast(pa.int64())})

    fine = (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby([l1, l2])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_c100", alias_name="sum_c100"))
            .map_batches(pin, batch_format="pyarrow", batch_size=None)
            .materialize())

    def null_l2(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or l1 not in b.schema.names:
            return pin(b)
        return pa.table({l1: b.column(l1).cast(pa.string()),
                         l2: pa.nulls(b.num_rows, pa.int64()),
                         "n": b.column("n").cast(pa.int64()),
                         "sum_c100": b.column("sum_c100").cast(pa.int64())})

    lvl1 = (fine.groupby(l1)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_c100", alias_name="sum_c100"))
            .map_batches(null_l2, batch_format="pyarrow", batch_size=None))

    extra = []
    if cube:
        def null_l1(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or l2 not in b.schema.names:
                return pin(b)
            return pa.table({l1: pa.nulls(b.num_rows, pa.string()),
                             l2: b.column(l2).cast(pa.int64()),
                             "n": b.column("n").cast(pa.int64()),
                             "sum_c100": b.column("sum_c100")
                             .cast(pa.int64())})

        extra.append(
            fine.groupby(l2)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_c100", alias_name="sum_c100"))
            .map_batches(null_l1, batch_format="pyarrow", batch_size=None))

    def grand_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.schema.names:
            return pa.table({"g": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64()),
                             "sum_c100": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        return pa.table({"g": pa.array([0], pa.int32()),
                         "n": pa.array([pc.sum(b.column("n")).as_py() or 0],
                                       pa.int64()),
                         "sum_c100": pa.array(
                             [pc.sum(b.column("sum_c100")).as_py() or 0],
                             pa.int64())})

    def grand_total(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.schema.names:
            return pin(pa.table({}))
        n = b.column("n").cast(pa.int64())
        s = b.column("sum_c100").cast(pa.int64())
        # SQL sum() over zero rows is NULL, count(*) is 0 — mirror the
        # ROLLUP grand-total row exactly even on empty input
        import pyarrow.compute as pc
        s = pc.if_else(pc.equal(n, 0), pa.nulls(b.num_rows, pa.int64()), s)
        return pa.table({l1: pa.nulls(b.num_rows, pa.string()),
                         l2: pa.nulls(b.num_rows, pa.int64()),
                         "n": n, "sum_c100": s})

    # seed row: GROUP BY ROLLUP always emits a grand-total row, even
    # over an empty table
    import ray

    seed = ray.data.from_arrow(pa.table({
        "g": pa.array([0], pa.int32()),
        "n": pa.array([0], pa.int64()),
        "sum_c100": pa.array([0], pa.int64())}))
    lvl0 = (fine.map_batches(grand_partial, batch_format="pyarrow",
                             batch_size=None)
            .union(seed)
            .groupby("g")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_c100", alias_name="sum_c100"))
            .map_batches(grand_total, batch_format="pyarrow",
                         batch_size=None))

    return fine.union(lvl1, *extra, lvl0)


def cube_counts(events: Dataset, *, l1: str = "event_type",
                l2: str = "user_id", value_col: str = "value") -> Dataset:
    """``GROUP BY CUBE(l1, l2)`` — all four grouping sets, one raw scan
    (the rollup plan plus the (NULL, l2) level off the same materialized
    finest-level table)."""
    return rollup_counts(events, l1=l1, l2=l2, value_col=value_col,
                         cube=True)


def json_field_agg(events: Dataset, *, group_col: str = "event_type",
                   json_col: str = "props", path: str = "$.k") -> Dataset:
    """Semi-structured column handling: extract an integer field from a
    JSON string column (vectorized Rust JSON path via polars — no
    per-row json.loads) and aggregate it per group.
    Output: (group, n, sum_field) — rows where the path is missing OR
    whose value is not an int64-safe integer literal are dropped. The
    explicit gate (ASCII digits only, ≤ 18 of them so the cast can
    never overflow) keeps the engine and the SQL oracle identical:
    without it, polars cast(strict=False) nulls '2.5' while DuckDB CAST
    rounds it to 3, Rust-regex ``\\d`` admits Unicode digits RE2
    rejects, and a 20-digit literal crashes a strict cast on one side
    while erroring the whole query on the other."""
    import polars as pl

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(json_col)
        vs = (pl.from_arrow(col.combine_chunks()
                            if isinstance(col, pa.ChunkedArray) else col)
              .str.json_path_match(path))
        df = (pl.DataFrame({
            group_col: pl.from_arrow(
                batch.column(group_col).combine_chunks()
                if isinstance(batch.column(group_col), pa.ChunkedArray)
                else batch.column(group_col)),
            "vs": vs})
            .filter(pl.col("vs").str.contains(r"^-?[0-9]{1,18}$"))
            .with_columns(pl.col("vs").cast(pl.Int64).alias("v")))
        g = df.group_by(group_col).agg(
            pl.len().cast(pl.Int64).alias("n"), pl.col("v").sum().alias("s"))
        return pa.table({group_col: g[group_col].to_arrow().cast(pa.string()),
                         "n": g["n"].to_arrow().cast(pa.int64()),
                         "s": g["s"].to_arrow().cast(pa.int64())})

    return (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby(group_col)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="sum_field")))


def pivot_counts(events: Dataset, *, key_col: str = "user_id",
                 cat_col: str = "event_type",
                 categories: tuple[str, ...]) -> Dataset:
    """Pivot: one row per key with a count column per declared category
    (n_<cat> ..., n_other for unseen values). The block-local crosstab is
    the combiner — the shuffle moves one wide row per key per block, and
    the static schema (declared category set) keeps the pipeline
    streaming-friendly."""
    import pandas as pd

    cols = [f"n_{c}" for c in categories] + ["n_other"]
    cat_idx = {c: i for i, c in enumerate(categories)}
    other = len(categories)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.column(key_col).null_count:
            raise ValueError(f"pivot_counts: null {key_col} values")
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        cats = batch.column(cat_col).to_pandas()
        # a NULL category counts NOWHERE (SQL CASE ... NOT IN over NULL
        # yields NULL → 0 in every column), but its key still appears
        valid = cats.notna().to_numpy()
        ci = cats.map(cat_idx).fillna(other).to_numpy(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        mat = np.zeros((len(uk), other + 1), dtype=np.int64)
        np.add.at(mat, (inv[valid], ci[valid]), 1)
        return pa.Table.from_pydict({
            key_col: pa.array(uk.astype(np.int64), pa.int64()),
            **{nm: pa.array(mat[:, i], pa.int64())
               for i, nm in enumerate(cols)},
        })

    return (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby(key_col)
            .aggregate(*[Sum(nm, alias_name=nm) for nm in cols]))


def moment_aggregates(events: Dataset, *, group_col: str = "event_type",
                      value_col: str = "value") -> Dataset:
    """Exact integer moment aggregates per group: (group, n, sum_c100,
    sumsq_c100). Variance/stddev derive client-side as
    (n·Σx² − (Σx)²) / n² — no float ever crosses the oracle boundary,
    so unlike a native float stddev this is value-hash checkable.
    Block-local partials are the combiner (one row per group per
    block)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        _no_nulls(batch, group_col, "moment_aggregates")
        c = _cents(batch.column(value_col))
        df = pd.DataFrame({group_col: batch.column(group_col).to_pandas(),
                           "c": c, "c2": c * c})
        g = (df.groupby(group_col, sort=False)
             .agg(n=("c", "size"), s=("c", "sum"), s2=("c2", "sum"))
             .reset_index())
        return pa.table({
            group_col: pa.array(g[group_col].tolist(), pa.string()),
            "n": pa.array(g["n"].to_numpy(np.int64), pa.int64()),
            "s": pa.array(g["s"].to_numpy(np.int64), pa.int64()),
            "s2": pa.array(g["s2"].to_numpy(np.int64), pa.int64())})

    return (events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
            .groupby(group_col)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("s", alias_name="sum_c100"),
                       Sum("s2", alias_name="sumsq_c100")))


def grouped_mode(events: Dataset, *, group_col: str = "event_type",
                 value_col: str = "value") -> Dataset:
    """Deterministic modal value per group: the cent value with the
    highest count, ties to the SMALLEST value (DuckDB's native mode()
    is first-seen on ties, i.e. plan-dependent — the explicit tie rule
    makes the result engine-independent and oracle-checkable).
    Output: (group, mode_c100, mode_n). Shares the
    ``_cent_histogram`` combiner with ``grouped_quantiles`` — the
    shuffle moves distinct (group, cent) rows only."""
    import pandas as pd

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "mode_c100": pd.Series([], dtype="int64"),
                                 "mode_n": pd.Series([], dtype="int64")})
        g = g.sort_values(["n", "c"], ascending=[False, True],
                          ignore_index=True)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             "mode_c100": [int(g["c"].iloc[0])],
                             "mode_n": [int(g["n"].iloc[0])]})

    return (_cent_histogram(events, group_col, value_col)
            .groupby(group_col).map_groups(pick, batch_format="pandas"))


def q5_local_supplier_volume(lineitem: Dataset, orders: Dataset,
                             customer: pa.Table, supplier: pa.Table,
                             nation: pa.Table, region: pa.Table, *,
                             region_name: str = "ASIA",
                             date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01",
                             num_partitions: int | None = None) -> Dataset:
    """TPC-H Q5 (local supplier volume): revenue per nation from
    lineitems whose supplier and customer share a nation inside one
    region, for one order-date year. Revenue is exact integer cents —
    ``floor(l_extendedprice · (1 − l_discount) · 100 + 0.5)`` per row
    (float64 both sides) — so the value hash matches SQL bit-for-bit.

    Distributed shape (the multi-way-join showcase):
    - region / nation / supplier are dictionary-small: collapsed
      driver-side into a suppkey → nationkey map over the qualifying
      region, carried into tasks by closure (ray.put-equivalent).
    - customer is semi-filtered to the region's nations and column-
      pruned BEFORE the shuffle (two int64 columns move, nothing else).
    - orders ⨝ customer and lineitem ⨝ orders are the two genuinely
      large sides — explicit shuffle hash joins on the join keys, with
      the date predicate applied to orders before its shuffle.
    - the final per-nation aggregate is a block-local partial into a
      ≤ |nations| groupby."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum


    # driver-side dictionary collapse: region -> nations -> suppliers
    rk = region.filter(pc.equal(region.column("r_name"), region_name)) \
        .column("r_regionkey").to_numpy(zero_copy_only=False)
    nat = nation.filter(pc.is_in(nation.column("n_regionkey"),
                                 value_set=pa.array(rk)))
    nat_keys = nat.column("n_nationkey").to_numpy(zero_copy_only=False)
    nat_names = nat.column("n_name").to_pylist()
    n_order = np.argsort(nat_keys)
    nat_keys_s = nat_keys[n_order]
    nat_names_s = [nat_names[i] for i in n_order]
    sup = supplier.filter(pc.is_in(supplier.column("s_nationkey"),
                                   value_set=pa.array(nat_keys)))
    sk = sup.column("s_suppkey").to_numpy(zero_copy_only=False)
    sn = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    s_order = np.argsort(sk)
    sk_s, sn_s = sk[s_order], sn[s_order]

    # customer: semi-filter + column-prune before the shuffle
    cust = customer.filter(pc.is_in(customer.column("c_nationkey"),
                                    value_set=pa.array(nat_keys))) \
        .select(["c_custkey", "c_nationkey"])

    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)

    def orders_prep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        keep = (d >= lo) & (d < hi)
        k = b.filter(pa.array(keep))
        return pa.table({"o_orderkey": k.column("o_orderkey"),
                         "o_custkey": k.column("o_custkey")})

    import ray.data

    from uckg_ray.stages.dedup import _copartition_attach

    if num_partitions is None:
        # no row-count clamp needed: _copartition_attach returns
        # schema-correct empty tables for empty partitions, so the
        # large lineitem shuffle keeps full cluster parallelism even
        # when few customers/orders qualify
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    # both large-side joins run as explicit co-partition attaches (the
    # repo's robust shuffle-join shape): ``Dataset.join`` hands Acero
    # schema-less empty blocks when a narrow date window leaves fewer
    # surviving orders than blocks, and raises ArrowInvalid regardless
    # of the partition count. Join keys are unique on the build side
    # (custkey in customer, orderkey in orders), so attach ≡ inner join.
    o_small = orders.map_batches(orders_prep, batch_format="pyarrow",
                                 batch_size=None)
    cust_state = ray.data.from_arrow(pa.table({
        "doc_id": cust.column("c_custkey").cast(pa.int64()),
        "val": cust.column("c_nationkey").cast(pa.int64())}))
    o2 = _copartition_attach(
        o_small, cust_state, "o_custkey", "c_nationkey", pa.int64(),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        num_partitions)

    def o2_state(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "o_orderkey" not in b.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        return pa.table({"doc_id": b.column("o_orderkey").cast(pa.int64()),
                         "val": b.column("c_nationkey").cast(pa.int64())})

    li = lineitem.select_columns(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
    j = _copartition_attach(
        li, o2.map_batches(o2_state, batch_format="pyarrow",
                           batch_size=None),
        "l_orderkey", "c_nationkey", pa.int64(),
        pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
                   ("l_extendedprice", pa.float64()),
                   ("l_discount", pa.float64())]),
        num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue_c100": pa.array([], pa.int64())})
        sup_k = b.column("l_suppkey").to_numpy(zero_copy_only=False)
        c_nat = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        if len(sk_s) == 0:
            keep = np.zeros(len(sup_k), bool)
        else:
            pos_c = np.clip(np.searchsorted(sk_s, sup_k), 0, len(sk_s) - 1)
            hit = sk_s[pos_c] == sup_k
            # local supplier rule: supplier and customer share a nation
            keep = hit & (np.where(hit, sn_s[pos_c], -1) == c_nat)
        if not keep.any():
            return pa.table({"n_name": pa.array([], pa.string()),
                             "revenue_c100": pa.array([], pa.int64())})
        ep = b.column("l_extendedprice").to_numpy(
            zero_copy_only=False)[keep].astype(np.float64)
        dc = b.column("l_discount").to_numpy(
            zero_copy_only=False)[keep].astype(np.float64)
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        nk = c_nat[keep]
        npos = np.searchsorted(nat_keys_s, nk)
        names = [nat_names_s[i] for i in npos]
        import pandas as pd
        g = (pd.DataFrame({"n_name": names, "c": cents})
             .groupby("n_name", sort=False)["c"].sum().reset_index())
        return pa.table({
            "n_name": pa.array(g["n_name"].tolist(), pa.string()),
            "revenue_c100": pa.array(g["c"].to_numpy(np.int64),
                                     pa.int64())})

    return (j.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("n_name")
            .aggregate(Sum("revenue_c100", alias_name="revenue_c100")))


def grouped_percentile_rank(events: Dataset, *,
                            group_col: str = "event_type",
                            value_col: str = "value",
                            id_col: str = "event_id",
                            num_partitions: int | None = None) -> Dataset:
    """Per-row group-relative rank — the score-calibration transform
    (normalize a quality score against its source's distribution before
    cross-source filtering). For every row: ``n_lt`` = count of
    same-group rows with a strictly smaller integer-cent value
    (≡ ``rank() OVER (PARTITION BY g ORDER BY c) - 1``) and ``n_group``
    = the group size; the consumer forms n_lt/n_group at any precision.
    Output: (id, group, c100, n_lt, n_group) — all-integer, hash-exact.

    Scale shape: the group distribution reduces to the shared
    ``_cent_histogram`` (shuffle bounded by value cardinality × #groups,
    never row count); a per-group prefix scan turns it into a
    (group, cent → n_lt, n_group) lookup; then ONE group-hash
    co-partition joins rows to their lookup slice in-partition. The raw
    rows shuffle once; nothing is driver-side or O(rows) broadcast."""
    import pandas as pd
    import polars as pl

    from uckg_ray.stages.materialize import _add_hash_partition

    if num_partitions is None:
        from uckg_ray.partitioning import default_partitions
        num_partitions = default_partitions()

    def prefix(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({group_col: pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64"),
                                 "n_lt": pd.Series([], dtype="int64"),
                                 "n_group": pd.Series([], dtype="int64")})
        g = g.sort_values("c", ignore_index=True)
        n = g["n"].to_numpy(np.int64)
        cum = n.cumsum()
        return pd.DataFrame({group_col: g[group_col],
                             "c": g["c"].to_numpy(np.int64),
                             "n_lt": cum - n,
                             "n_group": int(cum[-1])})

    lut = (_cent_histogram(events, group_col, value_col)
           .groupby(group_col).map_groups(prefix, batch_format="pandas"))

    _OUT = pa.schema([(id_col, pa.int64()), (group_col, pa.string()),
                      ("c100", pa.int64()), ("n_lt", pa.int64()),
                      ("n_group", pa.int64())])
    _K = pa.schema([(group_col, pa.string()), ("c", pa.int64()),
                    ("side", pa.int8()), (id_col, pa.int64()),
                    ("n_lt", pa.int64()), ("n_group", pa.int64())])

    def tag_rows(b: pa.Table) -> pa.Table:
        _no_nulls(b, group_col, "percentile_rank")
        t = pa.table({
            group_col: b.column(group_col).cast(pa.string()),
            "c": pa.array(_cents(b.column(value_col)), pa.int64()),
            "side": pa.array(np.zeros(b.num_rows, np.int8)),
            id_col: b.column(id_col).cast(pa.int64()),
            "n_lt": pa.nulls(b.num_rows, pa.int64()),
            "n_group": pa.nulls(b.num_rows, pa.int64())})
        return _add_hash_partition(t, num_partitions, group_col)

    def tag_lut(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or group_col not in b.column_names:
            return _add_hash_partition(_K.empty_table(), num_partitions,
                                       group_col)
        t = pa.table({
            group_col: b.column(group_col).cast(pa.string()),
            "c": b.column("c").cast(pa.int64()),
            "side": pa.array(np.ones(b.num_rows, np.int8)),
            id_col: pa.nulls(b.num_rows, pa.int64()),
            "n_lt": b.column("n_lt").cast(pa.int64()),
            "n_group": b.column("n_group").cast(pa.int64())})
        return _add_hash_partition(t, num_partitions, group_col)

    def attach(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(
            [group_col, "c", "side", id_col, "n_lt", "n_group"]))
        rows = (df.filter(pl.col("side") == 0)
                .select(group_col, "c", id_col))
        lu = (df.filter(pl.col("side") == 1)
              .select(group_col, "c", "n_lt", "n_group"))
        # every row's (group, cent) exists in the lut by construction
        j = rows.join(lu, on=[group_col, "c"], how="inner")
        return pa.table({
            id_col: j[id_col].to_arrow().cast(pa.int64()),
            group_col: j[group_col].to_arrow().cast(pa.string()),
            "c100": j["c"].to_arrow().cast(pa.int64()),
            "n_lt": j["n_lt"].to_arrow().cast(pa.int64()),
            "n_group": j["n_group"].to_arrow().cast(pa.int64())})

    tagged = (events.map_batches(tag_rows, batch_format="pyarrow",
                                 batch_size=None)
              .union(lut.map_batches(tag_lut, batch_format="pyarrow",
                                     batch_size=None)))
    return tagged.groupby("p").map_groups(
        lambda t: attach(t.drop_columns(["p"])), batch_format="pyarrow")


def robust_outliers(events: Dataset, *, group_col: str = "event_type",
                    value_col: str = "value",
                    k_mad: int = 3) -> Dataset:
    """Robust per-group outlier flagging: rows whose integer-cent value
    deviates from the group's exact discrete median by MORE than
    ``k_mad`` × the group's median absolute deviation — the
    median/MAD z-score rule that survives the heavy tails a mean/σ
    rule chokes on. Output: (event_id, group, value_c100, dev_c100).

    Scale shape: the (median, MAD) side comes from ``grouped_mad``'s
    single-histogram fold and is one row per GROUP — a driver-side
    ``take_all`` of a #groups-bounded table broadcast into a stateless
    vectorized filter map (the q5 dictionary-side posture); the event
    stream itself is read once and never shuffled. All-integer
    comparison (|c−m| > k·mad), so the SQL oracle matches exactly."""
    import pandas as pd

    stats = {r[group_col]: (int(r["median_c100"]), int(r["mad_c100"]))
             for r in grouped_mad(events, group_col=group_col,
                                  value_col=value_col).take_all()}

    def flag(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column(group_col)
        enc = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray)
            else col)
        uniq = enc.dictionary.to_pylist()
        med = np.array([stats.get(g, (0, 0))[0] for g in uniq] + [0],
                       np.int64)
        mad = np.array([stats.get(g, (0, 0))[1] for g in uniq] + [0],
                       np.int64)
        idx = enc.indices
        if idx.null_count:
            idx = pc.fill_null(idx, len(uniq))
        ix = idx.to_numpy(zero_copy_only=False)
        c = _cents(batch.column(value_col))
        dev = np.abs(c - med[ix])
        keep = dev > k_mad * mad[ix]
        out = batch.filter(pa.array(keep))
        return pa.table({
            "event_id": out.column("event_id").cast(pa.int64()),
            group_col: out.column(group_col),
            "value_c100": pa.array(c[keep], pa.int64()),
            "dev_c100": pa.array(dev[keep], pa.int64())})

    return events.map_batches(flag, batch_format="pyarrow")


def q6_forecast_revenue(lineitem: Dataset, *,
                        date_lo: str = "1994-01-01",
                        date_hi: str = "1995-01-01",
                        disc_lo_c: int = 5, disc_hi_c: int = 7,
                        qty_cap_c100: int = 2400) -> Dataset:
    """TPC-H Q6-shaped forecast-revenue delta: one filtered scan,
    SUM(extendedprice · discount) in integer cents — the canonical
    predicate-pushdown + single-aggregate query. All predicates run on
    integer-cent transforms (discount band in whole cents, quantity
    cap in cents) and the per-row revenue cents use the same
    ``floor(x·100 + 0.5)`` double rounding as q5, so the SQL oracle
    matches bit-for-bit. Output: one row (revenue_c100, n_items);
    per-block partials make the final aggregate a scalar merge."""
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def prep(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        disc_c = np.floor(disc * 100 + 0.5).astype(np.int64)
        qty_c = _cents(batch.column("l_quantity"))
        keep = ((ship >= lo) & (ship < hi)
                & (disc_c >= disc_lo_c) & (disc_c <= disc_hi_c)
                & (qty_c < qty_cap_c100))
        price = batch.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        rev = np.floor(price * disc[keep] * 100 + 0.5).astype(np.int64)
        return pa.table({
            "g": pa.array([0], pa.int32()),
            "revenue_c100": pa.array([int(rev.sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64())})

    def strip(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_items" not in b.schema.names:
            return pa.table({"revenue_c100": pa.array([], pa.int64()),
                             "n_items": pa.array([], pa.int64())})
        import pyarrow.compute as pc

        n = b.column("n_items").cast(pa.int64())
        s = b.column("revenue_c100").cast(pa.int64())
        # SQL SUM over zero qualifying rows is NULL, COUNT(*) is 0
        s = pc.if_else(pc.equal(n, 0), pa.nulls(b.num_rows, pa.int64()), s)
        return pa.table({"revenue_c100": s, "n_items": n})

    import ray

    seed = ray.data.from_arrow(pa.table({
        "g": pa.array([0], pa.int32()),
        "revenue_c100": pa.array([0], pa.int64()),
        "n_items": pa.array([0], pa.int64())}))
    return (lineitem
            .select_columns(["l_shipdate", "l_discount",
                             "l_extendedprice", "l_quantity"])
            .map_batches(prep, batch_format="pyarrow", batch_size=None)
            .union(seed)
            .groupby("g")
            .aggregate(Sum("revenue_c100", alias_name="revenue_c100"),
                       Sum("n_items", alias_name="n_items"))
            .map_batches(strip, batch_format="pyarrow", batch_size=None))


def q3_shipping_priority(lineitem: Dataset, orders: Dataset,
                         customer: pa.Table, *,
                         segment: str = "BUILDING",
                         cutoff: str = "1996-06-30", k: int = 10,
                         num_partitions: int | None = None) -> Dataset:
    """TPC-H Q3 (shipping priority): top-k unshipped orders of one
    market segment by accumulated lineitem revenue. Revenue is exact
    integer cents (``floor(p·(1−d)·100 + 0.5)`` per row, float64), the
    order date rides as int64 epoch-µs, so the SQL oracle value-hashes
    bit-for-bit.

    Distributed shape (one consumption per dataset, three bounded
    exchanges): the segment filter collapses customer to a custkey
    state table that co-partition-attaches onto date-filtered orders
    (exchange 1 — non-segment orders drop inside the partition task);
    lineitem pre-aggregates per-order revenue block-locally into ONE
    orderkey groupby (exchange 2 — the only data-scale shuffle, and it
    moves (orderkey, cents) pairs, never raw rows); the per-order
    revenue then attaches back onto the filtered orders (exchange 3,
    inner ⇒ orders without surviving lineitems drop); ranking is a
    per-block partial top-k into a single-partition merge. Output:
    (l_orderkey, revenue_c100, o_date_us, o_orderpriority)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from uckg_ray.stages.dedup import _copartition_attach

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    cust = customer.filter(
        pc.equal(customer.column("c_mktsegment"), segment))
    cust_state = ray.data.from_arrow(pa.table({
        "doc_id": cust.column("c_custkey").cast(pa.int64()),
        "val": pa.array(np.ones(cust.num_rows, np.int64), pa.int64())}))
    cut = np.datetime64(cutoff)

    def orders_prep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(d < cut))
        return pa.table({
            "o_orderkey": f.column("o_orderkey").cast(pa.int64()),
            "o_custkey": f.column("o_custkey").cast(pa.int64()),
            "o_date_us": f.column("o_orderdate").cast(pa.int64()),
            "o_orderpriority": f.column("o_orderpriority")
            .cast(pa.string())})

    o2 = _copartition_attach(
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate",
                               "o_orderpriority"])
        .map_batches(orders_prep, batch_format="pyarrow",
                     batch_size=None),
        cust_state, "o_custkey", "seg", pa.int64(),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                   ("o_date_us", pa.int64()),
                   ("o_orderpriority", pa.string())]),
        num_partitions)

    def li_prep(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(ship > cut))
        if f.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        ep = f.column("l_extendedprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dc = f.column("l_discount").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        g = (pd.DataFrame({
            "l_orderkey": f.column("l_orderkey").cast(pa.int64())
            .to_numpy(zero_copy_only=False), "c": cents})
            .groupby("l_orderkey", sort=False)["c"].sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64())})

    def rev_state(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        return pa.table({"doc_id": b.column("l_orderkey").cast(pa.int64()),
                         "val": b.column("c").cast(pa.int64())})

    rev = (lineitem.select_columns(["l_orderkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])
           .map_batches(li_prep, batch_format="pyarrow", batch_size=None)
           .groupby("l_orderkey").aggregate(Sum("c", alias_name="c"))
           .map_batches(rev_state, batch_format="pyarrow",
                        batch_size=None))

    joined = _copartition_attach(
        o2, rev, "o_orderkey", "revenue_c100", pa.int64(),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                   ("o_date_us", pa.int64()),
                   ("o_orderpriority", pa.string())]),
        num_partitions)

    _OUT = pa.schema([("l_orderkey", pa.int64()),
                      ("revenue_c100", pa.int64()),
                      ("o_date_us", pa.int64()),
                      ("o_orderpriority", pa.string())])

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "revenue_c100" not in b.schema.names:
            return _OUT.empty_table()
        df = pd.DataFrame({
            "l_orderkey": b.column("o_orderkey").to_pandas()
            if "o_orderkey" in b.schema.names
            else b.column("l_orderkey").to_pandas(),
            "revenue_c100": b.column("revenue_c100").to_pandas(),
            "o_date_us": b.column("o_date_us").to_pandas(),
            "o_orderpriority": b.column("o_orderpriority").to_pandas()})
        df = df.sort_values(["revenue_c100", "o_date_us", "l_orderkey"],
                            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False) \
            .cast(_OUT)

    return (joined.map_batches(topk, batch_format="pyarrow",
                               batch_size=None)
            .repartition(1)
            .map_batches(topk, batch_format="pyarrow", batch_size=None))


def q14_promo_share(lineitem: Dataset, part: Dataset, *,
                    date_lo: str = "1996-01-01",
                    date_hi: str = "1996-02-01",
                    promo_type: str = "PROMO",
                    num_partitions: int | None = None) -> Dataset:
    """TPC-H Q14-shaped promotion revenue share: the fraction of one
    month's lineitem revenue that ships promo-typed parts, as an exact
    integer ppm ratio (``promo·10⁶ // total``) plus both cent
    components.

    Distributed shape: part is a DATA-SCALE dimension (can't broadcast
    at 100 TB), so the part-type flag attaches to the date-filtered,
    column-pruned lineitem rows via ONE partkey co-partition exchange
    (`_copartition_attach`, unique build keys); revenue cents per row
    use the shared ``floor(p·(1−d)·100 + 0.5)`` contract; the final
    aggregate is block-local partials into a seeded scalar merge (SQL
    NULL semantics on an empty month preserved)."""
    import pyarrow.compute as pc
    import ray.data

    from uckg_ray.stages.dedup import _copartition_attach

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def part_state(b: pa.Table) -> pa.Table:
        promo = pc.equal(b.column("p_type"), promo_type)
        return pa.table({
            "doc_id": b.column("p_partkey").cast(pa.int64()),
            "val": promo.combine_chunks().cast(pa.int64())
            if isinstance(promo, pa.ChunkedArray)
            else promo.cast(pa.int64())})

    def li_prep(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array((d >= lo) & (d < hi)))
        ep = f.column("l_extendedprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dc = f.column("l_discount").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_partkey": f.column("l_partkey").cast(pa.int64()),
            "c": pa.array(cents, pa.int64())})

    j = _copartition_attach(
        lineitem.select_columns(["l_partkey", "l_shipdate",
                                 "l_extendedprice", "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow", batch_size=None),
        part.select_columns(["p_partkey", "p_type"])
        .map_batches(part_state, batch_format="pyarrow",
                     batch_size=None),
        "l_partkey", "promo", pa.int64(),
        pa.schema([("l_partkey", pa.int64()), ("c", pa.int64())]),
        num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "promo" not in b.schema.names:
            return pa.table({"g": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64()),
                             "promo_c100": pa.array([], pa.int64()),
                             "total_c100": pa.array([], pa.int64())})
        c = b.column("c").to_numpy(zero_copy_only=False)
        promo = b.column("promo").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([0], pa.int32()),
            "n": pa.array([len(c)], pa.int64()),
            "promo_c100": pa.array([int(c[promo == 1].sum())],
                                   pa.int64()),
            "total_c100": pa.array([int(c.sum())], pa.int64())})

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.schema.names:
            return pa.table({"promo_c100": pa.array([], pa.int64()),
                             "total_c100": pa.array([], pa.int64()),
                             "promo_ppm": pa.array([], pa.int64())})
        n = b.column("n").to_numpy(zero_copy_only=False)
        pcents = b.column("promo_c100").to_numpy(zero_copy_only=False)
        tcents = b.column("total_c100").to_numpy(zero_copy_only=False)
        # SQL: SUM over zero joined rows is NULL (and so is the ratio)
        if int(n[0]) == 0:
            return pa.table({"promo_c100": pa.nulls(1, pa.int64()),
                             "total_c100": pa.nulls(1, pa.int64()),
                             "promo_ppm": pa.nulls(1, pa.int64())})
        ppm = int(pcents[0]) * 1_000_000 // int(tcents[0]) \
            if int(tcents[0]) else None
        return pa.table({
            "promo_c100": pa.array([int(pcents[0])], pa.int64()),
            "total_c100": pa.array([int(tcents[0])], pa.int64()),
            "promo_ppm": pa.array([ppm], pa.int64())})

    seed = ray.data.from_arrow(pa.table({
        "g": pa.array([0], pa.int32()),
        "n": pa.array([0], pa.int64()),
        "promo_c100": pa.array([0], pa.int64()),
        "total_c100": pa.array([0], pa.int64())}))
    return (j.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
            .union(seed)
            .groupby("g")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("promo_c100", alias_name="promo_c100"),
                       Sum("total_c100", alias_name="total_c100"))
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def q18_large_volume(lineitem: Dataset, orders: Dataset,
                     customer: pa.Table, *, qty_min_c100: int = 30_000,
                     k: int = 100,
                     num_partitions: int | None = None) -> Dataset:
    """TPC-H Q18-shaped large-volume customers: orders whose total
    lineitem quantity exceeds a threshold (HAVING on a distributed
    aggregate), joined back to order and customer attributes, top-k by
    (o_totalprice desc, o_date asc, orderkey). Quantities and prices
    are integer cents.

    Distributed shape: lineitem pre-aggregates per-order quantity
    block-locally into ONE orderkey groupby (the only data-scale
    shuffle); the HAVING filter runs inside the aggregate's output map
    BEFORE any join, so only qualifying orders (a tiny fraction)
    enter the order-attach exchange; customer name attaches to the ≤ k
    survivors of a partial-top-k merge (third, k-bounded exchange)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from uckg_ray.stages.dedup import _copartition_attach

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    def li_prep(b: pa.Table) -> pa.Table:
        qty = _cents(b.column("l_quantity"))
        g = (pd.DataFrame({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64())
            .to_numpy(zero_copy_only=False), "q": qty})
            .groupby("l_orderkey", sort=False)["q"].sum().reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(np.int64),
                                   pa.int64()),
            "q": pa.array(g["q"].to_numpy(np.int64), pa.int64())})

    def having(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "sum_qty_c100": pa.array([], pa.int64())})
        f = b.filter(pc.greater(b.column("q"), qty_min_c100))
        return pa.table({"l_orderkey": f.column("l_orderkey")
                         .cast(pa.int64()),
                         "sum_qty_c100": f.column("q").cast(pa.int64())})

    big = (lineitem.select_columns(["l_orderkey", "l_quantity"])
           .map_batches(li_prep, batch_format="pyarrow", batch_size=None)
           .groupby("l_orderkey").aggregate(Sum("q", alias_name="q"))
           .map_batches(having, batch_format="pyarrow", batch_size=None))

    # attach order attributes: custkey, date, totalprice — packed as a
    # single struct-free int64 triple would lose the string-free date;
    # three int64 fields ride as three attaches would re-shuffle, so
    # pack (custkey, date_us, total_c100) into one state VALUE by
    # shipping the orders rows as the PAIR side instead: orders is the
    # stream, the qualifying-order set is the (tiny) state.
    def big_state(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "l_orderkey" not in b.schema.names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "val": pa.array([], pa.int64())})
        return pa.table({"doc_id": b.column("l_orderkey"),
                         "val": b.column("sum_qty_c100")})

    def orders_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
            "o_custkey": b.column("o_custkey").cast(pa.int64()),
            "o_date_us": b.column("o_orderdate").cast(pa.int64()),
            "total_c100": pa.array(_cents(b.column("o_totalprice")),
                                   pa.int64())})

    j = _copartition_attach(
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate",
                               "o_totalprice"])
        .map_batches(orders_prep, batch_format="pyarrow",
                     batch_size=None),
        big.map_batches(big_state, batch_format="pyarrow",
                        batch_size=None),
        "o_orderkey", "sum_qty_c100", pa.int64(),
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                   ("o_date_us", pa.int64()),
                   ("total_c100", pa.int64())]),
        num_partitions)

    _TOP = pa.schema([("o_orderkey", pa.int64()),
                      ("o_custkey", pa.int64()),
                      ("o_date_us", pa.int64()),
                      ("total_c100", pa.int64()),
                      ("sum_qty_c100", pa.int64())])

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "total_c100" not in b.schema.names:
            return _TOP.empty_table()
        df = b.select(_TOP.names).to_pandas().sort_values(
            ["total_c100", "o_date_us", "o_orderkey"],
            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).cast(_TOP)

    top = (j.map_batches(topk, batch_format="pyarrow", batch_size=None)
           .repartition(1)
           .map_batches(topk, batch_format="pyarrow", batch_size=None))

    # customer name lookup on the ≤ k survivors (dimension attach)
    cust_state = ray.data.from_arrow(pa.table({
        "doc_id": customer.column("c_custkey").cast(pa.int64()),
        "val": customer.column("c_name").cast(pa.string())}))
    return _copartition_attach(top, cust_state, "o_custkey", "c_name",
                               pa.string(), _TOP, num_partitions)


def q10_returned_revenue(lineitem: Dataset, orders: Dataset,
                         customer: pa.Table, *,
                         date_lo: str = "1996-01-01",
                         date_hi: str = "1996-04-01",
                         k: int = 20,
                         num_partitions: int | None = None) -> Dataset:
    """TPC-H Q10-shaped returned-item report: per-customer revenue lost
    to returned lineitems (``l_returnflag = 'R'``) for orders placed in
    one quarter, top-k customers by revenue (ties → min custkey), with
    customer attributes attached. Revenue is integer cents.

    Distributed shape: lineitem is filtered to R-flag rows and reduced
    to (orderkey, cents) BEFORE any exchange; the quarter's orders ship
    (custkey) as the unique-key state side of ONE orderkey co-partition
    attach (out-of-window orders drop in the attach, implementing the
    date filter as semi-join); per-custkey cents use a block-local
    pandas partial before the custkey groupby; the customer dimension
    attaches only to the ≤ k survivors of a partial-top-k merge, packed
    as one string value (name\\x1fnationkey\\x1facctbal_c100) so the
    lookup is a single exchange instead of three."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from uckg_ray.stages.dedup import _copartition_attach

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def li_prep(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        ep = f.column("l_extendedprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        dc = f.column("l_discount").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": f.column("l_orderkey").cast(pa.int64()),
            "c": pa.array(cents, pa.int64())})

    def orders_state(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array((d >= lo) & (d < hi)))
        return pa.table({
            "doc_id": f.column("o_orderkey").cast(pa.int64()),
            "val": f.column("o_custkey").cast(pa.int64())})

    j = _copartition_attach(
        lineitem.select_columns(["l_orderkey", "l_returnflag",
                                 "l_extendedprice", "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow", batch_size=None),
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(orders_state, batch_format="pyarrow",
                     batch_size=None),
        "l_orderkey", "c_custkey", pa.int64(),
        pa.schema([("l_orderkey", pa.int64()), ("c", pa.int64())]),
        num_partitions)

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "c_custkey" not in b.schema.names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        g = (pd.DataFrame({
            "c_custkey": b.column("c_custkey")
            .to_numpy(zero_copy_only=False),
            "c": b.column("c").to_numpy(zero_copy_only=False)})
            .groupby("c_custkey", sort=False)["c"].sum().reset_index())
        return pa.table({
            "c_custkey": pa.array(g["c_custkey"].to_numpy(np.int64),
                                  pa.int64()),
            "c": pa.array(g["c"].to_numpy(np.int64), pa.int64())})

    per_cust = (j.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
                .groupby("c_custkey")
                .aggregate(Sum("c", alias_name="revenue_c100")))

    _TOP = pa.schema([("c_custkey", pa.int64()),
                      ("revenue_c100", pa.int64())])

    def topk(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "revenue_c100" not in b.schema.names:
            return _TOP.empty_table()
        df = b.select(_TOP.names).to_pandas().sort_values(
            ["revenue_c100", "c_custkey"],
            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False).cast(_TOP)

    top = (per_cust.map_batches(topk, batch_format="pyarrow",
                                batch_size=None)
           .repartition(1)
           .map_batches(topk, batch_format="pyarrow", batch_size=None))

    acct = _cents(customer.column("c_acctbal"))
    packed = [f"{n}\x1f{k_}\x1f{a}" for n, k_, a in zip(
        customer.column("c_name").to_pylist(),
        customer.column("c_nationkey").to_pylist(), acct)]
    cust_state = ray.data.from_arrow(pa.table({
        "doc_id": customer.column("c_custkey").cast(pa.int64()),
        "val": pa.array(packed, pa.string())}))
    withc = _copartition_attach(top, cust_state, "c_custkey", "_packed",
                                pa.string(), _TOP, num_partitions)

    def unpack(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "_packed" not in b.schema.names:
            return pa.schema(
                [("c_custkey", pa.int64()), ("revenue_c100", pa.int64()),
                 ("c_name", pa.string()), ("c_nationkey", pa.int64()),
                 ("acctbal_c100", pa.int64())]).empty_table()
        parts = [s.split("\x1f") for s in
                 b.column("_packed").to_pylist()]
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "revenue_c100": b.column("revenue_c100"),
            "c_name": pa.array([x[0] for x in parts], pa.string()),
            "c_nationkey": pa.array([int(x[1]) for x in parts],
                                    pa.int64()),
            "acctbal_c100": pa.array([int(x[2]) for x in parts],
                                     pa.int64())})

    return withc.map_batches(unpack, batch_format="pyarrow",
                             batch_size=None)


def q4_order_priority(lineitem: Dataset, orders: Dataset, *,
                      date_lo: str = "1996-01-01",
                      date_hi: str = "1996-04-01",
                      num_partitions: int | None = None) -> Dataset:
    """TPC-H Q4-shaped order-priority check: for one quarter's orders,
    how many (per priority) had at least one lineitem shipped after the
    order date — an EXISTS semi-join realized distributively. (The
    fixture has no commit/receipt dates, so 'late' = shipdate strictly
    after orderdate; the oracle applies the identical predicate.)

    Distributed shape: the quarter's orders ship (date_us\\x1fpriority)
    packed as one string state value through ONE orderkey co-partition
    attach onto the column-pruned lineitem stream (non-window orders
    drop in the attach); the late-predicate filter runs in-block; the
    EXISTS collapse is a block-local distinct-(orderkey, priority)
    partial into a single orderkey groupby (priority is functionally
    dependent on orderkey, so Max reconstructs it), then a ≤ 5-row
    priority count."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Max

    from uckg_ray.stages.dedup import _copartition_attach

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def orders_state(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array((d >= lo) & (d < hi)))
        du = f.column("o_orderdate").cast(pa.int64()).to_pylist()
        pr = f.column("o_orderpriority").to_pylist()
        return pa.table({
            "doc_id": f.column("o_orderkey").cast(pa.int64()),
            "val": pa.array([f"{d_}\x1f{p_}" for d_, p_ in zip(du, pr)],
                            pa.string())})

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey").cast(pa.int64()),
            "ship_us": b.column("l_shipdate").cast(pa.int64())})

    j = _copartition_attach(
        lineitem.select_columns(["l_orderkey", "l_shipdate"])
        .map_batches(li_prep, batch_format="pyarrow", batch_size=None),
        orders.select_columns(["o_orderkey", "o_orderdate",
                               "o_orderpriority"])
        .map_batches(orders_state, batch_format="pyarrow",
                     batch_size=None),
        "l_orderkey", "_ord", pa.string(),
        pa.schema([("l_orderkey", pa.int64()), ("ship_us", pa.int64())]),
        num_partitions)

    def late_distinct(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "_ord" not in b.schema.names:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderpriority": pa.array([], pa.string())})
        packed = b.column("_ord").to_pylist()
        ship = b.column("ship_us").to_numpy(zero_copy_only=False)
        okey = b.column("l_orderkey").to_numpy(zero_copy_only=False)
        dates = np.fromiter((int(s.split("\x1f", 1)[0]) for s in packed),
                            np.int64, len(packed))
        keep = ship > dates
        kk = okey[keep]
        pr = [packed[i].split("\x1f", 1)[1]
              for i in np.flatnonzero(keep)]
        u, idx = np.unique(kk, return_index=True)
        return pa.table({
            "o_orderkey": pa.array(u, pa.int64()),
            "o_orderpriority": pa.array([pr[i] for i in idx],
                                        pa.string())})

    return (j.map_batches(late_distinct, batch_format="pyarrow",
                          batch_size=None)
            .groupby("o_orderkey")
            .aggregate(Max("o_orderpriority",
                           alias_name="o_orderpriority"))
            .groupby("o_orderpriority")
            .aggregate(Count(alias_name="order_count")))


_PROFILE_SCHEMA = pa.schema([
    ("col_name", pa.string()), ("n_rows", pa.int64()),
    ("n_null", pa.int64()), ("n_distinct", pa.int64()),
    ("min_v", pa.int64()), ("max_v", pa.int64())])


def profile_columns(events: Dataset,
                    num_partitions: int | None = None) -> Dataset:
    """Ingest-time data-profiling audit over the event log: one row per
    column with (n_rows, n_null, n_distinct, min, max). Numeric views
    are exact integers (value → cents, ts → epoch-µs); the string
    column (event_type) profiles null/distinct with NULL min/max.

    Distributed shape: n_rows/n_null/min/max fold block-locally into
    one ≤ 5-row-per-block partial (no data moves); exact n_distinct is
    the only exchange — block-local distinct (column, value-ordinal)
    rows into one packed-key groupby, then a ≤ 5-row count per column.
    The two tiny result tables merge in a single final task."""
    import polars as pl

    from ray.data.aggregate import Count, Max, Min, Sum

    COLS = ["event_id", "ts_us", "user_id", "value_c100", "event_type"]

    def ordinals(b: pa.Table) -> dict[str, np.ndarray]:
        return {
            "event_id": b.column("event_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "ts_us": b.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False),
            "user_id": b.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "value_c100": _cents(b.column("value"))}

    def stats_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema(
                [("col_name", pa.string()), ("n_rows", pa.int64()),
                 ("n_null", pa.int64()), ("min_v", pa.int64()),
                 ("max_v", pa.int64())]).empty_table()
        n = b.num_rows
        rows = []
        o = ordinals(b)
        null_counts = {
            "event_id": b.column("event_id").null_count,
            "ts_us": b.column("ts").null_count,
            "user_id": b.column("user_id").null_count,
            "value_c100": b.column("value").null_count,
            "event_type": b.column("event_type").null_count}
        for c in COLS:
            if c == "event_type":
                rows.append((c, n, null_counts[c], None, None))
            else:
                v = o[c]
                rows.append((c, n, null_counts[c],
                             int(v.min()), int(v.max())))
        return pa.table({
            "col_name": pa.array([r[0] for r in rows], pa.string()),
            "n_rows": pa.array([r[1] for r in rows], pa.int64()),
            "n_null": pa.array([r[2] for r in rows], pa.int64()),
            "min_v": pa.array([r[3] for r in rows], pa.int64()),
            "max_v": pa.array([r[4] for r in rows], pa.int64())})

    def distinct_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"k": pa.array([], pa.string())})
        o = ordinals(b)
        ks = []
        for c in COLS:
            if c == "event_type":
                vals = set(b.column("event_type").to_pylist()) - {None}
                ks.extend(f"{c}\x1f{v}" for v in vals)
            else:
                ks.extend(f"{c}\x1f{v}" for v in np.unique(o[c]))
        return pa.table({"k": pa.array(ks, pa.string())})

    stats = (events.map_batches(stats_partial, batch_format="pyarrow",
                                batch_size=None)
             .groupby("col_name")
             .aggregate(Sum("n_rows", alias_name="n_rows"),
                        Sum("n_null", alias_name="n_null"),
                        Min("min_v", alias_name="min_v"),
                        Max("max_v", alias_name="max_v")))

    def split_col(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "k" not in b.schema.names:
            return pa.table({"col_name": pa.array([], pa.string()),
                             "n_distinct": pa.array([], pa.int64())})
        col = [s.split("\x1f", 1)[0] for s in b.column("k").to_pylist()]
        return pa.table({"col_name": pa.array(col, pa.string()),
                         "n_distinct": pa.array(
                             np.ones(b.num_rows, np.int64), pa.int64())})

    distinct = (events.map_batches(distinct_partial,
                                   batch_format="pyarrow",
                                   batch_size=None)
                .groupby("k").aggregate(Count(alias_name="_n"))
                .map_batches(split_col, batch_format="pyarrow",
                             batch_size=None)
                .groupby("col_name")
                .aggregate(Sum("n_distinct", alias_name="n_distinct")))

    def merge(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _PROFILE_SCHEMA.empty_table()
        df = pl.from_arrow(b)
        st = df.filter(pl.col("n_rows").is_not_null())
        di = df.filter(pl.col("n_rows").is_null()).select(
            ["col_name", "n_distinct"])
        out = (st.drop("n_distinct").join(di, on="col_name", how="left")
               .sort("col_name"))
        return out.select(["col_name", "n_rows", "n_null", "n_distinct",
                           "min_v", "max_v"]).to_arrow() \
            .cast(_PROFILE_SCHEMA)

    pad_stats = stats.map_batches(
        lambda b: b.append_column(
            "n_distinct", pa.nulls(b.num_rows, pa.int64())),
        batch_format="pyarrow", batch_size=None)
    pad_distinct = distinct.map_batches(
        lambda b: pa.table({
            "col_name": b.column("col_name"),
            "n_rows": pa.nulls(b.num_rows, pa.int64()),
            "n_null": pa.nulls(b.num_rows, pa.int64()),
            "min_v": pa.nulls(b.num_rows, pa.int64()),
            "max_v": pa.nulls(b.num_rows, pa.int64()),
            "n_distinct": b.column("n_distinct")}),
        batch_format="pyarrow", batch_size=None)
    return (pad_stats.union(pad_distinct).repartition(1)
            .map_batches(merge, batch_format="pyarrow",
                         batch_size=None))
