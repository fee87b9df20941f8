"""Local replica of the driver's correctness gate: run every queries()
entry against its oracle_sql() via DuckDB on the same parquet tables and
compare row count, schema (column names) and values (sorted columns,
sorted rows, exact cell equality — stricter than a value hash).

Usage:
    python tools/check_oracle.py                 # sf0.01, all queries
    python tools/check_oracle.py --sf sf0.001    # faster
    python tools/check_oracle.py --only kg_edges dedup_exact
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    try:
        from ray.data import Dataset
        if isinstance(res, Dataset):
            df = res.to_pandas()
            if not len(df.columns):
                # Ray quirk: to_pandas() on an EMPTY dataset loses the
                # schema; rebuild the typed empty frame so a 0-row
                # query still schema-compares against its oracle
                s = res.schema()
                df = pa.schema(list(zip(s.names, s.types))) \
                    .empty_table().to_pandas()
            return df
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df):
    import pandas as pd
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def compare(name, ray_df, sql_df) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} "
                        f"sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype) != str(bv.dtype):
                # No coercion: the driver hashes raw values, so an int64-vs-
                # HUGEINT(object) mismatch must be flagged, not papered over.
                problems.append(f"column {c!r} dtype differs: ray={av.dtype} "
                                f"sql={bv.dtype}")
                continue
            try:
                import pandas.testing as pdt
                pdt.assert_series_equal(av, bv, check_names=False)
            except Exception as e:
                problems.append(f"column {c!r} values differ: {str(e).splitlines()[0]}")
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--quick", action="store_true",
                    help="skip the slowest queries")
    args = ap.parse_args()
    sf_dir = f"/root/testdata/{args.sf}"

    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    # oracle SQL is pinned to sf0.01 fixture paths; retarget for other sfs
    sqls = entrymod.oracle_sql()
    if args.sf != "sf0.01":
        from uckg_ray.sources import fixtures as fx
        fx.ensure_fixtures(sf_dir)
        p_old = entrymod._sql_paths("/root/testdata/sf0.01")
        p_new = entrymod._sql_paths(sf_dir)
        sqls = {k: _retarget(v, p_old, p_new) for k, v in sqls.items()}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    names = args.only or list(qs)
    slow = {"kg_edges_canonical", "dedup_minhash", "dedup_simhash"}
    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        if args.quick and name in slow:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(qs[name](sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: ray side raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in sqls:
            print(f"rows-only  {name}: {len(ray_df)} rows "
                  f"({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            sql_df = con.execute(sqls[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"MISMATCH  {name} ({time.time()-t0:.1f}s)")
            for p_ in problems:
                print(f"    {p_}")
            n_bad += 1
        else:
            print(f"MATCH  {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            n_ok += 1
    print(f"\n{n_ok} match, {n_rowsonly} rows-only, {n_bad} failing")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


def _retarget(sql: str, p_old: dict, p_new: dict) -> str:
    for k in p_old:
        sql = sql.replace(p_old[k], p_new[k])
    return sql


if __name__ == "__main__":
    main()
