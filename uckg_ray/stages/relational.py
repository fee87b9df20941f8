"""Relational building blocks over the TPC-H-ish tables — demonstrates
the engine's aggregate/join surface (the reference's count-audit ops A1/J7
generalized). Money sums are integer cents so oracles match exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum


def _cents(col) -> np.ndarray:
    vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(vals * 100 + 0.5).astype(np.int64)


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
