"""Range join, distributed prefix scan (running aggregates), exact
grouped quantiles, two-phase distinct counts, pivot — each checked
against an independent pandas reference on randomized logs, including a
hot-key distribution and a tiny bucket width so cross-bucket carries are
exercised."""

import math

import numpy as np
import pandas as pd


def _random_events(n=4000, users=12, seed=7, hot=False):
    rng = np.random.default_rng(seed)
    if hot:
        # one user owns half the log
        uid = np.where(rng.random(n) < 0.5, 0, rng.integers(1, users, n))
    else:
        uid = rng.integers(0, users, n)
    ts = (np.datetime64("2024-01-01", "us")
          + np.cumsum(rng.integers(1, 5_000_000, n)).astype("timedelta64[us]"))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": uid.astype(np.int64),
        "event_type": rng.choice(["view", "purchase", "click"], n),
        "ts": ts,
        "value": rng.random(n).round(4) * 50})


def _ref_range_join(df, left_type, right_type, window_us):
    l = df[df.event_type == left_type]
    r = df[df.event_type == right_type]
    m = l.merge(r, on="user_id", suffixes=("_l", "_r"))
    dt = (m["ts_r"] - m["ts_l"]).dt.total_seconds() * 1e6
    m = m[(dt > 0) & (dt <= window_us)]
    return set(zip(m["event_id_l"], m["event_id_r"]))


def test_range_join_matches_pandas(ray_session):
    import ray.data
    from uckg_ray.stages.joins import range_join_events
    df = _random_events()
    out = range_join_events(ray.data.from_pandas(df), left_type="view",
                            right_type="purchase",
                            window_minutes=30).take_all()
    got = {(r["left_id"], r["right_id"]) for r in out}
    assert got == _ref_range_join(df, "view", "purchase", 30 * 60 * 1_000_000)
    assert len(got) == len(out)  # no duplicate pairs from replication


def test_range_join_hot_key(ray_session):
    import ray.data
    from uckg_ray.stages.joins import range_join_events
    df = _random_events(hot=True, seed=11)
    out = range_join_events(ray.data.from_pandas(df), left_type="view",
                            right_type="purchase",
                            window_minutes=45).take_all()
    got = {(r["left_id"], r["right_id"]) for r in out}
    assert got == _ref_range_join(df, "view", "purchase", 45 * 60 * 1_000_000)


def _ref_running(df):
    e = df.sort_values(["user_id", "ts", "event_id"]).copy()
    e["c"] = np.floor(e["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    g = e.groupby("user_id", sort=False)
    e["rn"] = g.cumcount() + 1
    e["run_sum_c100"] = g["c"].cumsum()
    e["prev_event_id"] = g["event_id"].shift(1)
    return e


def test_running_aggregates_cross_bucket(ray_session):
    """1-hour buckets over multi-day data: nearly every event needs the
    cross-bucket offset and carry-in lag."""
    import ray.data
    from uckg_ray.stages.windows import running_aggregates
    df = _random_events(n=3000, users=8, seed=3)
    out = running_aggregates(ray.data.from_pandas(df),
                             bucket_hours=1).take_all()
    ref = _ref_running(df).set_index("event_id")
    assert len(out) == len(df)
    for r in out:
        want = ref.loc[r["event_id"]]
        assert r["rn"] == want["rn"]
        assert r["run_sum_c100"] == want["run_sum_c100"]
        prev = want["prev_event_id"]
        assert r["prev_event_id"] == (None if pd.isna(prev) else int(prev))


def test_running_aggregates_hot_key(ray_session):
    import ray.data
    from uckg_ray.stages.windows import running_aggregates
    df = _random_events(n=3000, seed=19, hot=True)
    out = running_aggregates(ray.data.from_pandas(df),
                             bucket_hours=2).take_all()
    ref = _ref_running(df)
    got_last = {}
    for r in out:
        got_last[(r["user_id"], r["rn"])] = r["run_sum_c100"]
    tail = ref.groupby("user_id").tail(1)
    for _, w in tail.iterrows():
        assert got_last[(w["user_id"], w["rn"])] == w["run_sum_c100"]
    assert len(out) == len(df)


def test_grouped_quantiles_duckdb_parity(ray_session):
    """Histogram selection == DuckDB quantile_disc on data with heavy
    ties (integer cents from a narrow range)."""
    import duckdb
    import ray.data
    from uckg_ray.stages.relational import grouped_quantiles
    df = _random_events(n=5000, seed=23)
    df["value"] = (df["value"] % 3).round(2)  # few distinct cents → ties
    out = grouped_quantiles(ray.data.from_pandas(df)).take_all()
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute("""
        WITH e AS (SELECT event_type,
                   CAST(floor(value*100+0.5) AS BIGINT) AS c FROM events)
        SELECT event_type, count(*) AS n,
               quantile_disc(c, 0.5) AS p50, quantile_disc(c, 0.9) AS p90,
               quantile_disc(c, 0.99) AS p99
        FROM e GROUP BY event_type""").fetchall()
    want = {r[0]: r[1:] for r in ref}
    assert len(out) == len(want)
    for r in out:
        n, p50, p90, p99 = want[r["event_type"]]
        assert (r["n"], r["p50_c100"], r["p90_c100"], r["p99_c100"]) == \
            (n, p50, p90, p99)


def test_quantile_index_rule():
    """The engine's selection index mirrors quantile_disc exactly:
    max(0, ceil(q*n) - 1)."""
    import duckdb
    con = duckdb.connect()
    for n in (1, 2, 3, 7, 13, 15, 101, 150):
        vals = list(range(1, n + 1))
        for q in (0.0, 0.5, 0.9, 0.99, 1.0):
            duck = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM "
                f"(SELECT unnest({vals}) AS x)").fetchone()[0]
            assert duck == vals[max(0, math.ceil(q * n) - 1)]


def test_distinct_count_and_pivot(ray_session):
    import ray.data
    from uckg_ray.stages.relational import distinct_count_per_key, pivot_counts
    df = _random_events(n=2500, seed=31)
    ds = ray.data.from_pandas(df)
    stats = {r["user_id"]: (r["n_events"], r["n_types"])
             for r in distinct_count_per_key(ds).take_all()}
    ref = df.groupby("user_id")["event_type"].agg(["size", "nunique"])
    assert len(stats) == len(ref)
    for u, w in ref.iterrows():
        assert stats[u] == (w["size"], w["nunique"])

    piv = {r["user_id"]: r
           for r in pivot_counts(ds, categories=("view", "purchase"))
           .take_all()}
    ct = df.pivot_table(index="user_id", columns="event_type",
                        values="event_id", aggfunc="count", fill_value=0)
    for u, w in ct.iterrows():
        assert piv[u]["n_view"] == w.get("view", 0)
        assert piv[u]["n_purchase"] == w.get("purchase", 0)
        assert piv[u]["n_other"] == w.get("click", 0)


def test_anti_join_keys(ray_session):
    import ray.data
    from uckg_ray.stages.joins import anti_join_keys
    rng = np.random.default_rng(41)
    left = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                         "val": rng.random(200).round(2) * 100})
    right = pd.DataFrame({"rk": rng.choice(200, 120, replace=False)
                          .astype(np.int64)})
    out = anti_join_keys(ray.data.from_pandas(left),
                         ray.data.from_pandas(right),
                         left_key="k", right_key="rk", value_col="val",
                         out_key="k", out_value="v_c100").take_all()
    want = set(left["k"]) - set(right["rk"])
    assert {r["k"] for r in out} == want
    cents = dict(zip(left["k"], np.floor(left["val"].to_numpy() * 100 + 0.5)
                     .astype(np.int64)))
    assert all(r["v_c100"] == cents[r["k"]] for r in out)


def test_priority_sample_deterministic(ray_session):
    import hashlib

    import ray.data
    from uckg_ray.stages.joins import priority_sample
    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                       "source": [f"s{i % 3}" for i in range(500)]})
    out = priority_sample(ray.data.from_pandas(df), group_col="source",
                          id_col="doc_id", k=5).take_all()
    pri = {i: int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                             "little") for i in df["doc_id"]}
    for g in ("s0", "s1", "s2"):
        got = sorted(r["doc_id"] for r in out if r["source"] == g)
        want = sorted(sorted((i for i in df[df.source == g]["doc_id"]),
                             key=lambda i: (pri[i], i))[:5])
        assert got == want
    # reproducible
    again = priority_sample(ray.data.from_pandas(df), group_col="source",
                            id_col="doc_id", k=5).take_all()
    assert {(r["doc_id"], r["source"]) for r in again} == \
        {(r["doc_id"], r["source"]) for r in out}


def test_kmv_distinct_estimate(ray_session):
    """Sketch vs truth on a corpus with heavy duplication — and the
    below-k exact path."""
    import ray.data
    from uckg_ray.stages.dedup import kmv_distinct_estimate
    rng = np.random.default_rng(13)
    # group A: 400 distinct texts replicated 5x; group B: 10 distinct
    texts_a = [f"doc text number {i} {'x' * int(rng.integers(1, 9))}"
               for i in range(400)] * 5
    texts_b = [f"small {i % 10}" for i in range(100)]
    df = pd.DataFrame({
        "source": ["A"] * len(texts_a) + ["B"] * len(texts_b),
        "text": texts_a + texts_b})
    out = {r["source"]: r["est_distinct"]
           for r in kmv_distinct_estimate(
               ray.data.from_pandas(df), k=32).take_all()}
    assert out["B"] == 10                     # < k → exact
    assert 200 <= out["A"] <= 800             # KMV ±relative error at k=32


def test_semi_join_complements_anti(ray_session):
    import ray.data
    from uckg_ray.stages.joins import anti_join_keys
    rng = np.random.default_rng(47)
    left = pd.DataFrame({"k": np.arange(150, dtype=np.int64),
                         "val": np.ones(150)})
    right = pd.DataFrame({"rk": rng.choice(150, 60, replace=False)
                          .astype(np.int64)})
    lds, rds = ray.data.from_pandas(left), ray.data.from_pandas(right)
    anti = {r["k"] for r in anti_join_keys(
        lds, rds, left_key="k", right_key="rk").take_all()}
    semi = {r["k"] for r in anti_join_keys(
        lds, rds, left_key="k", right_key="rk", semi=True).take_all()}
    assert semi == set(right["rk"])
    assert anti | semi == set(left["k"]) and not (anti & semi)


def test_rollup_counts(ray_session):
    import ray.data
    from uckg_ray.stages.relational import rollup_counts
    df = _random_events(n=2000, users=6, seed=53)
    out = rollup_counts(ray.data.from_pandas(df)).take_all()
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.assign(c=cents)
    fine = df.groupby(["event_type", "user_id"])["c"].agg(["size", "sum"])
    lvl1 = df.groupby("event_type")["c"].agg(["size", "sum"])
    got_fine = {(r["event_type"], r["user_id"]): (r["n"], r["sum_c100"])
                for r in out if r["event_type"] is not None
                and r["user_id"] is not None}
    got_lvl1 = {r["event_type"]: (r["n"], r["sum_c100"])
                for r in out if r["event_type"] is not None
                and r["user_id"] is None}
    got_grand = [(r["n"], r["sum_c100"]) for r in out
                 if r["event_type"] is None and r["user_id"] is None]
    assert got_fine == {k: (v["size"], v["sum"]) for k, v in fine.iterrows()}
    assert got_lvl1 == {k: (v["size"], v["sum"]) for k, v in lvl1.iterrows()}
    assert got_grand == [(len(df), int(cents.sum()))]
    assert len(out) == len(fine) + len(lvl1) + 1


def test_cube_counts(ray_session):
    """CUBE = ROLLUP rows + the (NULL, l2) grouping set."""
    import ray.data
    from uckg_ray.stages.relational import cube_counts
    df = _random_events(n=2000, users=6, seed=54)
    out = cube_counts(ray.data.from_pandas(df)).take_all()
    cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    df = df.assign(c=cents)
    fine = df.groupby(["event_type", "user_id"])["c"].agg(["size", "sum"])
    lvl1 = df.groupby("event_type")["c"].agg(["size", "sum"])
    lvl2 = df.groupby("user_id")["c"].agg(["size", "sum"])
    got_lvl2 = {r["user_id"]: (r["n"], r["sum_c100"])
                for r in out if r["event_type"] is None
                and r["user_id"] is not None}
    got_grand = [(r["n"], r["sum_c100"]) for r in out
                 if r["event_type"] is None and r["user_id"] is None]
    assert got_lvl2 == {k: (v["size"], v["sum"]) for k, v in lvl2.iterrows()}
    assert got_grand == [(len(df), int(cents.sum()))]
    assert len(out) == len(fine) + len(lvl1) + len(lvl2) + 1


def test_json_field_agg(ray_session):
    import ray.data
    from uckg_ray.stages.relational import json_field_agg
    df = pd.DataFrame({
        "event_type": ["a", "a", "b", "b", "b"],
        "props": ['{"k": 5}', '{"k": 7}', '{"k": 1}', '{"x": 9}', '{"k": 2}']})
    out = {r["event_type"]: (r["n"], r["sum_field"])
           for r in json_field_agg(ray.data.from_pandas(df)).take_all()}
    # rows without $.k drop (json_extract null semantics)
    assert out == {"a": (2, 12), "b": (2, 3)}


def test_snapshot_diff(ray_session):
    import ray.data
    from uckg_ray.stages.joins import snapshot_diff
    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["one", "two", "three", "four"]})
    new = pd.DataFrame({"doc_id": [2, 3, 4, 5],
                        "text": ["two", "THREE", "four", "five"]})
    out = {r["doc_id"]: r["op"]
           for r in snapshot_diff(ray.data.from_pandas(old),
                                  ray.data.from_pandas(new)).take_all()}
    assert out == {1: "del", 3: "chg", 5: "add"}   # 2 and 4 unchanged


def test_json_field_agg_non_integer_values(ray_session):
    """Non-integer $.k values drop on BOTH sides (the integer-literal
    gate): engine == the oracle SQL shape, verified via DuckDB."""
    import duckdb
    import ray.data
    from uckg_ray.stages.relational import json_field_agg
    df = pd.DataFrame({
        "event_type": ["a"] * 5,
        "props": ['{"k": 5}', '{"k": 2.5}', '{"k": true}', '{"k": "s"}',
                  '{"k": -3}']})
    out = json_field_agg(ray.data.from_pandas(df)).take_all()
    assert out == [{"event_type": "a", "n": 2, "sum_field": 2}]
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute(r"""
        WITH x AS (SELECT event_type,
                   json_extract_string(props, '$.k') AS ks FROM events)
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(ks AS BIGINT)) AS BIGINT) AS sum_field
        FROM x WHERE ks IS NOT NULL AND regexp_matches(ks, '^-?\d+$')
        GROUP BY event_type""").fetchall()
    assert ref == [("a", 2, 2)]


def test_rollup_empty_input_grand_total(ray_session):
    """SQL GROUP BY ROLLUP emits one (NULL, NULL, 0, NULL) row on an
    empty table — so does the engine."""
    import ray.data
    from uckg_ray.stages.relational import rollup_counts
    df = _random_events(n=5).iloc[0:0]
    out = rollup_counts(ray.data.from_pandas(df)).take_all()
    assert out == [{"event_type": None, "user_id": None, "n": 0,
                    "sum_c100": None}]


def test_pivot_null_category_counts_nowhere(ray_session):
    import ray.data
    from uckg_ray.stages.relational import pivot_counts
    df = pd.DataFrame({"user_id": np.array([1, 1, 2], dtype=np.int64),
                       "event_type": ["view", None, None]})
    out = {r["user_id"]: r for r in pivot_counts(
        ray.data.from_pandas(df), categories=("view",)).take_all()}
    assert out[1]["n_view"] == 1 and out[1]["n_other"] == 0
    assert out[2]["n_view"] == 0 and out[2]["n_other"] == 0  # key kept


def test_quantile_names_round_not_truncate():
    import pytest
    from uckg_ray.stages.relational import grouped_quantiles
    assert [f"p{round(q * 100)}_c100" for q in (0.29,)] == ["p29_c100"]
    with pytest.raises(ValueError):
        grouped_quantiles(None, qs=(0.99, 0.994))


def test_running_aggregates_duplicate_timestamps(ray_session):
    """Ties on ts within a user break by event_id — same rule as the
    SQL window ORDER BY ts, event_id."""
    import ray.data
    from uckg_ray.stages.windows import running_aggregates
    ts = pd.to_datetime(["2024-01-01 00:00"] * 3 + ["2024-01-01 09:00"] * 2)
    df = pd.DataFrame({"event_id": np.array([7, 3, 5, 2, 9], np.int64),
                       "user_id": np.ones(5, dtype=np.int64),
                       "ts": ts, "value": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = {r["event_id"]: r for r in running_aggregates(
        ray.data.from_pandas(df), bucket_hours=6).take_all()}
    # order: (00:00, 3), (00:00, 5), (00:00, 7), (09:00, 2), (09:00, 9)
    assert [out[i]["rn"] for i in (3, 5, 7, 2, 9)] == [1, 2, 3, 4, 5]
    assert out[3]["prev_event_id"] is None
    assert out[5]["prev_event_id"] == 3
    assert out[7]["prev_event_id"] == 5
    assert out[2]["prev_event_id"] == 7   # carry across the bucket gap
    assert out[9]["prev_event_id"] == 2
    assert out[9]["run_sum_c100"] == 1500


def test_fuzzy_pairs_vs_duckdb(ray_session):
    """Deletion-neighborhood blocking + two-pointer verify == DuckDB
    levenshtein <= 1 on a vocabulary with substitutions, indels and
    far-apart strings."""
    import duckdb
    import ray.data
    from uckg_ray.stages.dedup import _lev_le1, fuzzy_pairs
    vocab = ["scan", "scat", "scant", "can", "sort", "sorta", "merge",
             "marge", "mergee", "hash", "dash", "cash", "table", "cable",
             "xyzzy", "scan"]
    df = pd.DataFrame({"w": vocab})
    got = {(r["left_val"], r["right_val"])
           for r in fuzzy_pairs(ray.data.from_pandas(df), col="w")
           .take_all()}
    con = duckdb.connect()
    con.register("t", df)
    want = set(con.execute("""
        WITH b AS (SELECT DISTINCT w AS v FROM t)
        SELECT a.v, b2.v FROM b a, b b2
        WHERE a.v < b2.v AND levenshtein(a.v, b2.v) <= 1""").fetchall())
    assert got == want and len(got) >= 8
    # the scalar check agrees with DuckDB on tricky shapes
    for a, b in [("ab", "ba"), ("abc", "abcd"), ("", "x"), ("x", "x"),
                 ("ab", "cd"), ("abcd", "abdc")]:
        duck = con.execute(
            f"SELECT levenshtein('{a}', '{b}') <= 1").fetchone()[0]
        assert _lev_le1(a, b) == duck, (a, b)


def test_moment_aggregates(ray_session):
    import ray.data
    from uckg_ray.stages.relational import moment_aggregates
    df = _random_events(n=2000, seed=61)
    out = {r["event_type"]: (r["n"], r["sum_c100"], r["sumsq_c100"])
           for r in moment_aggregates(ray.data.from_pandas(df)).take_all()}
    c = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref = df.assign(c=c, c2=c * c).groupby("event_type")[["c", "c2"]] \
        .agg(["count", "sum"])
    for t, w in ref.iterrows():
        assert out[t] == (w[("c", "count")], w[("c", "sum")],
                          w[("c2", "sum")])


def test_grouped_mode_tie_rule(ray_session):
    """Ties go to the smallest value — deterministic, unlike native
    mode()."""
    import ray.data
    from uckg_ray.stages.relational import grouped_mode
    df = pd.DataFrame({"event_type": ["a"] * 4 + ["b"] * 3,
                       "value": [0.02, 0.02, 0.01, 0.01, 0.05, 0.05, 0.03]})
    out = {r["event_type"]: (r["mode_c100"], r["mode_n"])
           for r in grouped_mode(ray.data.from_pandas(df)).take_all()}
    assert out == {"a": (1, 2), "b": (5, 2)}   # a ties 1 vs 2 -> 1 wins


def test_fuzzy_pairs_non_ascii_and_nulls(ray_session):
    """Byte-based distance (DuckDB semantics: 'é' vs 'a' is 2) and
    graceful null drop."""
    import duckdb
    import ray.data
    from uckg_ray.stages.dedup import _lev_le1, fuzzy_pairs
    assert _lev_le1("é", "a") is False       # 2 bytes vs 1, dist 2
    assert _lev_le1("café", "cafe") is False  # sub 2 bytes
    assert _lev_le1("café", "caf") is False   # é = 2-byte indel
    con = duckdb.connect()
    for a, b in [("é", "a"), ("café", "cafe"),
                 ("café", "caf"), ("café", "cafè")]:
        duck = con.execute("SELECT levenshtein(?, ?) <= 1",
                           [a, b]).fetchone()[0]
        assert _lev_le1(a, b) == duck, (a, b)
    df = pd.DataFrame({"w": ["café", "cafè", None, "zzz"]})
    got = {(r["left_val"], r["right_val"])
           for r in fuzzy_pairs(ray.data.from_pandas(df), col="w")
           .take_all()}
    assert got == {("cafè", "café")}   # last-byte substitution


def test_histogram_ops_raise_on_null_group(ray_session):
    import pytest
    import ray.data
    from uckg_ray.stages.relational import grouped_mode, moment_aggregates
    df = pd.DataFrame({"event_type": ["a", None], "value": [1.0, 2.0]})
    with pytest.raises(Exception):
        grouped_mode(ray.data.from_pandas(df)).take_all()
    with pytest.raises(Exception):
        moment_aggregates(ray.data.from_pandas(df)).take_all()


def test_curation_pipeline_composition(ray_session):
    """Dedup keeps the min doc_id per normalized fingerprint, the gate
    drops short docs, the split is the deterministic hash."""
    import ray.data
    from uckg_ray.pipelines.curate import curate_documents
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": ["the quick brown fox jumps",   # 5 tokens, kept
                 "The  quick   brown fox JUMPS",  # dup of 0 normalized
                 "short doc",                     # gated out (2 tokens)
                 "another unique document here ok",
                 "another unique document here ok",  # exact dup of 3
                 "one two three four five six"]})
    out = {r["doc_id"]: (r["n_tokens"], r["split"]) for r in
           curate_documents(ray.data.from_pandas(df), min_tokens=5)
           .take_all()}
    assert set(out) == {0, 3, 5}          # 1, 4 deduped; 2 gated
    assert out[0][0] == 5
    for i in set(out):
        want = "train" if (i * 2654435761) % (1 << 32) % 100 < 80 \
            else "test"
        assert out[i][1] == want


def test_source_formats_identical(ray_session, tmp_path):
    """JSONL and CSV transcript sources normalize to the byte-identical
    canonical schema the Parquet path produces."""
    import glob
    import os

    import pyarrow.parquet as pq
    from uckg_ray.sources import fixtures as fx
    from uckg_ray.sources.formats import read_transcripts

    import pyarrow as pa
    fdir = fx.fixture_dir("/root/testdata/sf0.001")
    src = sorted(glob.glob(os.path.join(fdir, "transcripts",
                                        "*.parquet")))[0]
    ref = pq.read_table(src).to_pandas().head(2000)
    ref["tool"] = ref["tool"].fillna("")
    out = ref.copy()
    out["ts"] = out["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    f = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(ref, preserve_index=False), f)
    out.to_json(str(tmp_path / "t.jsonl"), orient="records", lines=True)
    out.to_csv(str(tmp_path / "t.csv"), index=False)

    def canon(ds):
        df = ds.to_pandas().sort_values(["conv_id", "turn_idx"],
                                        ignore_index=True)
        df["tool"] = df["tool"].fillna("")
        return df

    want = canon(read_transcripts(f))
    assert want["ts"].equals(ref.sort_values(["conv_id", "turn_idx"],
                                             ignore_index=True)["ts"])
    for path in (str(tmp_path / "t.jsonl"), str(tmp_path / "t.csv")):
        got = canon(read_transcripts(path))
        assert got.equals(want), path


def test_kg_extraction_from_jsonl_source(ray_session, tmp_path):
    """End-to-end format independence: the KG extraction over a JSONL
    transcript source emits the exact edge set the Parquet path does —
    a reference user can feed the pipeline from JSONL unchanged."""
    import glob
    import os

    import pyarrow.parquet as pq
    from uckg_ray.pipelines.kg import extract_edges
    from uckg_ray.sources import fixtures as fx
    from uckg_ray.sources.formats import read_transcripts

    fdir = fx.fixture_dir("/root/testdata/sf0.001")
    src = sorted(glob.glob(os.path.join(fdir, "transcripts",
                                        "*.parquet")))[:2]

    jl_paths = []
    for i, f in enumerate(src):
        df = pq.read_table(f).to_pandas()
        df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        p = str(tmp_path / f"t{i}.jsonl")
        df.to_json(p, orient="records", lines=True)
        jl_paths.append(p)

    def edge_set(turns):
        rows = extract_edges(turns, fdir).take_all()
        return {(r["subj"], r["pred"], r["obj"], r["obj_is_literal"],
                 r["obj_datatype"]) for r in rows}

    import ray.data
    want = edge_set(ray.data.read_parquet(src))
    got = edge_set(read_transcripts(jl_paths))
    assert got == want and len(want) > 100


def test_grouped_trimmed_sum_duckdb_parity(ray_session):
    """Trimmed-window aggregate == the two-pass quantile_disc-bounded
    SQL on tie-heavy data; single-value groups keep everything."""
    import duckdb
    import pandas as pd
    import ray.data
    from uckg_ray.stages.relational import grouped_trimmed_sum
    df = _random_events(n=4000, seed=31)
    df["value"] = (df["value"] % 5).round(2)
    df = pd.concat([df, pd.DataFrame(
        {"event_type": ["solo"], "user_id": [1], "value": [7.25],
         "ts": [df["ts"].iloc[0]]})], ignore_index=True)
    out = {r["event_type"]: r for r in grouped_trimmed_sum(
        ray.data.from_pandas(df)).take_all()}
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute("""
        WITH e AS (SELECT event_type,
                   CAST(floor(value*100+0.5) AS BIGINT) AS c FROM events),
        b AS (SELECT event_type, count(*) AS n_total,
                quantile_disc(c, 0.1) AS lo, quantile_disc(c, 0.9) AS hi
              FROM e GROUP BY event_type)
        SELECT b.event_type, b.n_total, b.lo, b.hi,
               count(*), CAST(sum(e.c) AS BIGINT)
        FROM b JOIN e ON e.event_type = b.event_type
                     AND e.c BETWEEN b.lo AND b.hi
        GROUP BY 1, 2, 3, 4""").fetchall()
    assert len(out) == len(ref)
    for et, n_total, lo, hi, n_kept, s in ref:
        r = out[et]
        assert (r["n_total"], r["lo_c100"], r["hi_c100"],
                r["n_kept"], r["sum_kept_c100"]) == (n_total, lo, hi,
                                                     n_kept, s)
    assert out["solo"]["n_kept"] == 1 and \
        out["solo"]["sum_kept_c100"] == 725


def test_grouped_percentile_rank_matches_window(ray_session):
    """n_lt == rank()-1 (ties share the strictly-smaller count) and
    n_group == the partition size, checked against DuckDB windows on
    tie-heavy data."""
    import duckdb
    import ray.data
    from uckg_ray.stages.relational import grouped_percentile_rank
    df = _random_events(n=3000, seed=41)
    df["value"] = (df["value"] % 2).round(1)   # heavy ties
    out = {r["event_id"]: (r["event_type"], r["c100"], r["n_lt"],
                           r["n_group"])
           for r in grouped_percentile_rank(
               ray.data.from_pandas(df)).take_all()}
    con = duckdb.connect()
    con.register("events", df)
    ref = con.execute("""
        WITH e AS (SELECT event_id, event_type,
                   CAST(floor(value*100+0.5) AS BIGINT) AS c FROM events)
        SELECT event_id, event_type, c,
               rank() OVER (PARTITION BY event_type ORDER BY c) - 1,
               count(*) OVER (PARTITION BY event_type) FROM e""").fetchall()
    assert len(out) == len(ref)
    for eid, et, c, n_lt, n_group in ref:
        assert out[eid] == (et, c, n_lt, n_group)


def test_retention_cohorts_duckdb_parity(ray_session):
    """Cohort = first-event epoch day; each (cohort, offset) counts
    DISTINCT active users; multiple events on one day collapse; matches
    the oracle's datediff arithmetic exactly."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.windows import retention_cohorts

    D = 86_400_000_000  # us per day
    rows = [  # (user, day, n events that day)
        (1, 100, 3), (1, 101, 1), (1, 103, 2),
        (2, 100, 1), (2, 102, 1),
        (3, 101, 1),
    ]
    ts, users = [], []
    for u, d, n in rows:
        for i in range(n):
            users.append(u)
            ts.append(d * D + i * 1000)
    t = pa.table({"user_id": pa.array(users, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "event_type": ["view"] * len(users)})
    got = sorted((r["cohort_day"], r["day_offset"], r["n_users"])
                 for r in retention_cohorts(
                     ray.data.from_arrow(t), num_partitions=3).take_all())
    assert got == [(100, 0, 2), (100, 1, 1), (100, 2, 1), (100, 3, 1),
                   (101, 0, 1)]
    con = duckdb.connect()
    con.register("events", t)
    want = sorted(map(tuple, con.execute("""
WITH a AS (SELECT DISTINCT user_id,
        datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
     FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
SELECT f.cohort_day, a.day - f.cohort_day, CAST(count(*) AS BIGINT)
FROM a JOIN f USING (user_id) GROUP BY 1, 2""").fetchall()))
    assert got == want


def test_grouped_mad_duckdb_parity(ray_session):
    """grouped_mad's histogram fold == DuckDB's two-pass
    quantile_disc(abs(c - m), 0.5), including even-count groups and
    deviation-count collisions (values symmetric around the median)."""
    import duckdb
    import ray.data

    from uckg_ray.stages.relational import grouped_mad

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "event_type": rng.choice(["a", "b", "c"], size=400),
        "value": np.round(rng.normal(10, 3, size=400), 2)})
    # symmetric collision group: devs {0,1,1,2,2} fold to shared keys
    df = pd.concat([df, pd.DataFrame({
        "event_type": ["s"] * 5,
        "value": [1.00, 2.00, 3.00, 4.00, 5.00]})], ignore_index=True)
    got = {r["event_type"]: (r["n"], r["median_c100"], r["mad_c100"])
           for r in grouped_mad(
               ray.data.from_pandas(df).repartition(6)).take_all()}
    con = duckdb.connect()
    con.register("events", df)
    want = {t: (n, m, d) for t, n, m, d in con.execute("""
        WITH e AS (SELECT event_type,
                   CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events),
        med AS (SELECT event_type, quantile_disc(c, 0.5) AS m
                FROM e GROUP BY event_type)
        SELECT e.event_type, count(*), min(m),
               quantile_disc(abs(c - m), 0.5)
        FROM e JOIN med USING (event_type) GROUP BY e.event_type
        """).fetchall()}
    assert got == want
    assert got["s"] == (5, 300, 100)


def test_robust_outliers(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.relational import robust_outliers

    # type a: values 1..5 (c100 100..500) → median 300, MAD 100;
    # 3*MAD band is [0, 600] inclusive-exclusive → 9.99 flags
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 9.99]
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": range(6), "event_type": ["a"] * 6,
        "value": vals}))
    got = [(r["event_id"], r["value_c100"], r["dev_c100"])
           for r in robust_outliers(ds, k_mad=3).take_all()]
    assert got == [(5, 999, 699)]


def test_q6_forecast_revenue(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.relational import q6_forecast_revenue

    li = pd.DataFrame({
        "l_shipdate": pd.to_datetime(
            ["1994-06-01", "1994-06-01", "1994-06-01", "1995-06-01"]
        ).astype("datetime64[us]"),
        "l_discount": [0.06, 0.06, 0.01, 0.06],  # row 3: band miss
        "l_extendedprice": [100.0, 200.0, 300.0, 400.0],
        "l_quantity": [10.0, 30.0, 10.0, 10.0],  # row 2: qty cap miss
    })
    rows = q6_forecast_revenue(ray.data.from_pandas(li)).take_all()
    # only row 0 qualifies: floor(100*0.06*100+0.5) = 600
    assert rows == [{"revenue_c100": 600, "n_items": 1}]
    # zero-qualifying input: SUM → NULL, COUNT → 0 (SQL semantics)
    empty = q6_forecast_revenue(
        ray.data.from_pandas(li), date_lo="1999-01-01",
        date_hi="1999-02-01").take_all()
    assert empty == [{"revenue_c100": None, "n_items": 0}]


def test_profile_columns(ray_session):
    import pandas as pd
    import ray.data

    from uckg_ray.stages.relational import profile_columns

    ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-02"])
    ds = ray.data.from_pandas(pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": ts.astype("datetime64[us]"),
        "user_id": [5, 5, 6],
        "event_type": ["a", "b", "b"],
        "value": [1.004, 1.004, -2.0]})).repartition(3)
    rows = {r["col_name"]: r for r in profile_columns(ds).take_all()}
    assert rows["event_id"]["n_rows"] == 3
    assert rows["event_id"]["n_distinct"] == 3
    assert rows["event_id"]["min_v"] == 1
    assert rows["event_id"]["max_v"] == 3
    assert rows["user_id"]["n_distinct"] == 2
    assert rows["value_c100"]["n_distinct"] == 2      # 100, 100, -200
    assert rows["value_c100"]["min_v"] == -200
    assert rows["event_type"]["n_distinct"] == 2
    assert rows["event_type"]["min_v"] is None
    assert rows["ts_us"]["n_distinct"] == 2
    assert all(r["n_null"] == 0 for r in rows.values())
