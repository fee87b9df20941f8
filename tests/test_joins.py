"""as-of join, shuffle hash join, per-group top-k, deterministic split."""

import numpy as np
import pandas as pd
import pytest


def _events_ds(ray):
    import ray.data
    ts = pd.to_datetime([
        "2024-01-01 00:00", "2024-01-01 00:05",   # views u1
        "2024-01-01 00:07", "2024-01-01 00:02",   # clicks u1
        "2024-01-01 00:01",                        # click u2 (no prior view)
    ])
    return ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1, 1, 1, 1, 2],
        "event_type": ["view", "view", "click", "click", "click"],
        "ts": ts, "value": [0.0, 0.0, 1.0, 2.0, 3.0]}))


def test_asof_join(ray_session):
    from uckg_ray.stages.joins import asof_join_events
    rows = asof_join_events(_events_ds(ray_session), left_type="click",
                            right_type="view").take_all()
    got = {r["left_id"]: r["right_id"] for r in rows}
    assert got[3] == 2      # click 00:07 → view 00:05
    assert got[4] == 1      # click 00:02 → view 00:00
    assert got[5] is None   # u2 has no prior view


def test_topk_per_group(ray_session):
    import ray.data
    from uckg_ray.stages.joins import topk_per_group
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 4, 200),
        "event_id": np.arange(200),
        "value": rng.random(200).round(3)})
    ds = ray.data.from_pandas(df)
    rows = topk_per_group(ds, group_col="user_id", value_col="value",
                          id_col="event_id", k=3).take_all()
    got = {(r["user_id"], r["rank"]): r["event_id"] for r in rows}
    for u in range(4):
        sub = df[df.user_id == u].sort_values(["value", "event_id"],
                                              ascending=[False, True]).head(3)
        for rk, eid in enumerate(sub.event_id, 1):
            assert got[(u, rk)] == eid


def test_train_test_split_deterministic(ray_session):
    import ray.data
    from uckg_ray.stages.joins import train_test_split
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": range(1000)}))
    rows = train_test_split(ds, id_col="doc_id", train_pct=80).take_all()
    frac = sum(1 for r in rows if r["split"] == "train") / len(rows)
    assert 0.75 < frac < 0.85
    again = {r["doc_id"]: r["split"]
             for r in train_test_split(ds, id_col="doc_id").take_all()}
    assert all(again[r["doc_id"]] == r["split"] for r in rows)


def test_hash_join_sum(ray_session):
    from uckg_ray.stages.joins import hash_join_sum
    import ray.data
    sf = "/root/testdata/sf0.001"
    rows = hash_join_sum(
        ray.data.read_parquet(f"{sf}/orders.parquet"),
        ray.data.read_parquet(f"{sf}/lineitem.parquet"),
        num_partitions=8).take_all()
    import duckdb
    want = duckdb.connect().execute(f"""
        SELECT o.o_orderstatus, count(*) AS n,
               sum(CAST(floor(l.l_extendedprice*100+0.5) AS BIGINT)) AS s
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/orders.parquet') o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1""").fetchall()
    wmap = {r[0]: (r[1], r[2]) for r in want}
    assert {r["o_orderstatus"]: (r["n_items"], r["sum_price_c100"])
            for r in rows} == wmap


def test_q5_local_supplier_volume(ray_session):
    """Q5 multi-join vs DuckDB on a small synthetic star: only
    same-nation (customer, supplier) lineitems in the region count."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.relational import q5_local_supplier_volume

    rng = np.random.default_rng(5)
    region = pa.table({"r_regionkey": [0, 1], "r_name": ["ASIA", "EUROPE"]})
    nation = pa.table({"n_nationkey": [0, 1, 2],
                       "n_name": ["JAPAN", "INDIA", "FRANCE"],
                       "n_regionkey": [0, 0, 1]})
    supplier = pa.table({"s_suppkey": list(range(6)),
                         "s_nationkey": [0, 1, 2, 0, 1, 2]})
    customer = pa.table({"c_custkey": list(range(20)),
                         "c_nationkey": rng.integers(0, 3, 20).tolist()})
    n_orders = 60
    orders = pd.DataFrame({
        "o_orderkey": range(n_orders),
        "o_custkey": rng.integers(0, 20, n_orders),
        "o_orderdate": pd.to_datetime(
            rng.integers(0, 700, n_orders), unit="D",
            origin="1995-06-01")})
    n_li = 300
    lineitem = pd.DataFrame({
        "l_orderkey": rng.integers(0, n_orders, n_li),
        "l_suppkey": rng.integers(0, 6, n_li),
        "l_extendedprice": np.round(rng.uniform(10, 5000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2)})

    got = {r["n_name"]: r["revenue_c100"]
           for r in q5_local_supplier_volume(
               ray.data.from_pandas(lineitem), ray.data.from_pandas(orders),
               customer, supplier, nation, region,
               region_name="ASIA").take_all()}

    con = duckdb.connect()
    for name, t in (("region", region), ("nation", nation),
                    ("supplier", supplier), ("customer", customer)):
        con.register(name, t)
    con.register("orders", orders)
    con.register("lineitem", lineitem)
    want = dict(con.execute("""
        SELECT n_name, CAST(sum(CAST(floor(
                 l_extendedprice * (1 - l_discount) * 100 + 0.5)
               AS BIGINT)) AS BIGINT)
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name""").fetchall())
    assert want and got == want


def test_q5_narrow_window_empty_result(ray_session):
    """A date window that leaves fewer surviving orders than the join
    partition count must return a (possibly empty) result, not raise
    ArrowInvalid from an empty schema-less join partition."""
    import pyarrow.parquet as pq
    import ray.data

    from uckg_ray.stages.relational import q5_local_supplier_volume

    sf = "/root/testdata/sf0.001"
    rows = q5_local_supplier_volume(
        ray.data.read_parquet(f"{sf}/lineitem.parquet"),
        ray.data.read_parquet(f"{sf}/orders.parquet"),
        pq.read_table(f"{sf}/customer.parquet"),
        pq.read_table(f"{sf}/supplier.parquet"),
        pq.read_table(f"{sf}/nation.parquet"),
        pq.read_table(f"{sf}/region.parquet"),
        region_name="ASIA", date_lo="1996-01-01",
        date_hi="1996-01-06").take_all()
    assert isinstance(rows, list)   # tiny or empty — just must not raise


def test_source_mixture(ray_session):
    import math

    import ray.data

    from uckg_ray.stages.joins import source_mixture
    # 3 sources with counts 100, 9, 2 → isqrt 10, 3, 1 (tot 14)
    src = ["web"] * 100 + ["books"] * 9 + ["code"] * 2
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(src)), "source": src}))
    rows = source_mixture(ds, budget=100).take_all()
    by = {r["source"]: r for r in rows}
    assert set(by) == {"web", "books", "code"}
    assert by["web"]["n_docs"] == 100
    # exact integer weights: s * 1e6 // 14
    for name, s in [("web", 10), ("books", 3), ("code", 1)]:
        assert by[name]["weight_ppm"] == s * 1_000_000 // 14
        assert math.isqrt(by[name]["n_docs"]) == s
    # largest-remainder: base 71/21/7 (sum 99), remainders 6/6/2 →
    # leftover 1 goes to the name-first tie among remainder-6 ("books")
    assert (by["web"]["quota"], by["books"]["quota"],
            by["code"]["quota"]) == (71, 22, 7)
    assert sum(r["quota"] for r in rows) == 100


def test_source_mixture_empty(ray_session):
    import ray.data

    from uckg_ray.stages.joins import source_mixture
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"),
         "source": pd.Series([], dtype="object")}))
    out = source_mixture(ds, budget=10)
    assert out.count() == 0
    assert set(out.schema().names) == {"source", "n_docs", "weight_ppm",
                                       "quota"}


def test_mixture_sample(ray_session):
    import ray.data

    from uckg_ray.stages.joins import mixture_sample, source_mixture
    src = ["web"] * 100 + ["books"] * 9 + ["code"] * 2
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(src)), "source": src}))
    rows = mixture_sample(ds, budget=50).take_all()
    mix = source_mixture(ds, budget=50).take_all()
    # without-replacement sample caps an up-weighted source at its size
    want = {r["source"]: min(r["quota"], r["n_docs"]) for r in mix}
    got = {}
    for r in rows:
        got[r["source"]] = got.get(r["source"], 0) + 1
    assert got == {s: q for s, q in want.items() if q}
    assert len(rows) == sum(want.values())
    # deterministic: same call again yields the identical id set
    again = {(r["source"], r["doc_id"])
             for r in mixture_sample(ds, budget=50).take_all()}
    assert again == {(r["source"], r["doc_id"]) for r in rows}


def test_q3_shipping_priority(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.relational import q3_shipping_priority

    cust = pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                     "c_mktsegment": ["BUILDING", "AUTOMOBILE"]})
    dt = pd.Timestamp("1996-01-01").to_datetime64()
    late = pd.Timestamp("1999-01-01").to_datetime64()
    orders = ray.data.from_pandas(pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 2, 1],           # 11: wrong segment
        "o_orderdate": pd.Series([dt, dt, late]).astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "3-MEDIUM"]}))
    li = ray.data.from_pandas(pd.DataFrame({
        "l_orderkey": [10, 10, 11, 12],
        "l_shipdate": pd.Series([late, late, late, late])
        .astype("datetime64[us]"),
        "l_extendedprice": [100.0, 50.0, 70.0, 80.0],
        "l_discount": [0.1, 0.0, 0.0, 0.0]}))
    rows = q3_shipping_priority(li, orders, cust).take_all()
    # order 12 fails the date cut, 11 the segment; 10 revenue =
    # floor(100*0.9*100+0.5) + floor(50*100+0.5) = 9000 + 5000
    assert len(rows) == 1
    r = rows[0]
    assert (r["l_orderkey"], r["revenue_c100"],
            r["o_orderpriority"]) == (10, 14000, "1-URGENT")
    assert r["o_date_us"] == int(pd.Timestamp("1996-01-01").value // 1000)


def test_q14_promo_share(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.relational import q14_promo_share

    ship = pd.Timestamp("1996-01-15").to_datetime64()
    out = pd.Timestamp("1997-01-15").to_datetime64()
    li = ray.data.from_pandas(pd.DataFrame({
        "l_partkey": [1, 2, 1],
        "l_shipdate": pd.Series([ship, ship, out])
        .astype("datetime64[us]"),
        "l_extendedprice": [100.0, 200.0, 400.0],
        "l_discount": [0.0, 0.5, 0.0]}))
    part = ray.data.from_arrow(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": ["PROMO", "STANDARD"]}))
    rows = q14_promo_share(li, part).take_all()
    # in-window: part 1 (promo) 10000c, part 2 floor(200*0.5*100+.5)=10000c
    assert rows == [{"promo_c100": 10000, "total_c100": 20000,
                     "promo_ppm": 500000}]
    # empty month → SQL NULL semantics
    empty = q14_promo_share(li, part, date_lo="1999-01-01",
                            date_hi="1999-02-01").take_all()
    assert empty == [{"promo_c100": None, "total_c100": None,
                      "promo_ppm": None}]


def test_q18_large_volume(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.relational import q18_large_volume

    dt = pd.Timestamp("1996-01-01").to_datetime64()
    li = ray.data.from_pandas(pd.DataFrame({
        "l_orderkey": [10, 10, 11],
        "l_quantity": [200.0, 150.0, 100.0]}))  # order 10: 35000c > cap
    orders = ray.data.from_pandas(pd.DataFrame({
        "o_orderkey": [10, 11],
        "o_custkey": [1, 2],
        "o_orderdate": pd.Series([dt, dt]).astype("datetime64[us]"),
        "o_totalprice": [999.99, 5.0]}))
    cust = pa.table({"c_custkey": pa.array([1, 2], pa.int64()),
                     "c_name": ["Customer#1", "Customer#2"]})
    rows = q18_large_volume(li, orders, cust,
                            qty_min_c100=30_000).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert (r["o_orderkey"], r["o_custkey"], r["total_c100"],
            r["sum_qty_c100"], r["c_name"]) == (
        10, 1, 99999, 35000, "Customer#1")


def test_mixture_sample_block_invariance(ray_session):
    import ray.data

    from uckg_ray.stages.joins import mixture_sample

    src = (["web"] * 60 + ["books"] * 25 + ["code"] * 15)
    df = pd.DataFrame({"doc_id": range(len(src)), "source": src})
    one = ray.data.from_pandas(df)
    many = ray.data.from_pandas(df).repartition(7)
    s1 = {(r["source"], r["doc_id"])
          for r in mixture_sample(one, budget=30).take_all()}
    s7 = {(r["source"], r["doc_id"])
          for r in mixture_sample(many, budget=30).take_all()}
    assert s1 == s7 and len(s1) == 30


def test_q10_returned_revenue(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.relational import q10_returned_revenue

    dt = pd.Timestamp("1996-02-01").to_datetime64()
    out = pd.Timestamp("1997-02-01").to_datetime64()
    orders = ray.data.from_pandas(pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [1, 2, 1],
        # order 12 is outside the quarter → its R lines don't count
        "o_orderdate": pd.Series([dt, dt, out]).astype("datetime64[us]")}))
    li = ray.data.from_pandas(pd.DataFrame({
        "l_orderkey": [10, 10, 11, 12],
        "l_returnflag": ["R", "N", "R", "R"],
        "l_extendedprice": [100.0, 999.0, 50.0, 77.0],
        "l_discount": [0.1, 0.0, 0.0, 0.0]}))
    cust = pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": ["Customer#1", "Customer#2"],
        "c_nationkey": pa.array([7, 8], pa.int32()),
        "c_acctbal": [12.345, -3.005]})
    rows = q10_returned_revenue(li, orders, cust).take_all()
    got = {r["c_custkey"]: r for r in rows}
    # cust 1: only order 10's R line: floor(100*0.9*100+0.5) = 9000
    assert got[1]["revenue_c100"] == 9000
    assert got[1]["c_name"] == "Customer#1"
    assert got[1]["c_nationkey"] == 7
    assert got[1]["acctbal_c100"] == 1235   # floor(12.345*100+0.5)
    assert got[2]["revenue_c100"] == 5000
    # top-k cut honored
    only_top = q10_returned_revenue(li, orders, cust, k=1).take_all()
    assert [r["c_custkey"] for r in only_top] == [1]


def test_q4_order_priority(ray_session):
    import ray.data

    from uckg_ray.stages.relational import q4_order_priority

    d1 = pd.Timestamp("1996-01-10").to_datetime64()
    out = pd.Timestamp("1995-01-10").to_datetime64()
    orders = ray.data.from_pandas(pd.DataFrame({
        "o_orderkey": [10, 11, 12, 13],
        "o_orderdate": pd.Series([d1, d1, d1, out])
        .astype("datetime64[us]"),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH",
                            "1-URGENT"]}))
    late = pd.Timestamp("1996-03-01").to_datetime64()
    same = pd.Timestamp("1996-01-10").to_datetime64()
    li = ray.data.from_pandas(pd.DataFrame({
        # order 10: two late lines (counted once); 11: on-time only;
        # 12: one late; 13: late but outside the order-date window
        "l_orderkey": [10, 10, 11, 12, 13],
        "l_shipdate": pd.Series([late, late, same, late, late])
        .astype("datetime64[us]")}))
    rows = q4_order_priority(li, orders).take_all()
    got = {r["o_orderpriority"]: r["order_count"] for r in rows}
    assert got == {"1-URGENT": 1, "2-HIGH": 1}


def test_cap_per_group_deterministic(ray_session):
    import ray.data

    from uckg_ray.partitioning import knuth32
    from uckg_ray.stages.joins import cap_per_group

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "source": [f"src{i % 3}" for i in range(300)],
        "doc_id": np.arange(300, dtype=np.int64)})
    # many small blocks: the block-local partial must still yield the
    # global per-group k-smallest
    ds = ray.data.from_pandas(df).repartition(13)
    rows = cap_per_group(ds, group_col="source", id_col="doc_id",
                         cap=7).take_all()
    exp = df.assign(h=knuth32(df.doc_id.to_numpy()).astype(np.int64))
    exp = (exp.sort_values(["h", "doc_id"]).groupby("source").head(7))
    assert {(r["source"], r["doc_id"]) for r in rows} == \
        set(zip(exp["source"], exp["doc_id"]))
    assert all(sum(1 for r in rows if r["source"] == s) == 7
               for s in ("src0", "src1", "src2"))
