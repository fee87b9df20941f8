"""Benchmark harness.

    python bench.py               # headline + per-query timings, ONE JSON line
    python bench.py --scaling     # same job at 8 and 32 CPUs in fresh
                                  # processes → throughputs + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

Headline = full KG build (extract → link → canonicalize → dedup → sort →
write edges+nodes) over the transcript fixture for the sf dir; the
metric of record is triples/sec (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from uckg_ray.sources import fixtures as fx
    from uckg_ray.pipelines.kg import build_kg
    import __ray_entry__ as entrymod

    fdir = fx.ensure_fixtures(sf_dir)          # untimed (cached after 1st run)
    tdir = os.path.join(fdir, "transcripts")

    # warm the page cache so we measure compute+shuffle, not first disk
    # read (count() alone would take the parquet-metadata fast path and
    # read nothing — force full block reads)
    import pyarrow as pa
    import ray.data
    ray.data.read_parquet(tdir).map_batches(
        lambda b: pa.table({"n": [b.num_rows]}), batch_format="pyarrow",
        batch_size=None).count()

    # per-process out dir: concurrent bench runs (e.g. a driver run
    # overlapping a manual one) must never clobber each other's output
    out_dir = f"/tmp/uckg_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = build_kg(tdir, fdir, out_dir, resume=False)
    headline = time.perf_counter() - t0

    queries = {"kg_build": round(headline, 3)}

    def timed(name, fn):
        t = time.perf_counter()
        try:
            res = fn(sf_dir)
            from ray.data import Dataset
            if isinstance(res, Dataset):
                res.count()   # consume to completion
            else:
                len(res)
            queries[name] = round(time.perf_counter() - t, 3)
        except Exception as e:               # keep the bench line emittable
            queries[name] = f"error:{type(e).__name__}"

    q = entrymod.queries()
    for name in ("kg_edges", "kg_mentions", "dedup_minhash", "dedup_simhash",
                 "dedup_token_jaccard", "ann_cosine_topk", "events_window",
                 "events_asof", "order_join", "q1_pricing", "text_quality",
                 "token_count", "kg_custom_spec", "doc_winnow",
                 "embed_neardup_lsh"):
        timed(name, q[name])

    result = {
        "metric": "kg_build_e2e_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus,
        "n_turns": manifest["n_turns"],
        "n_distinct_edges": manifest["n_distinct_edges"],
        "triples_per_sec": round(manifest["n_distinct_edges"] / headline, 1),
        "turns_per_sec": round(manifest["n_turns"] / headline, 1),
        "phase_sec": manifest["phase_sec"],
    }
    ray.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = one(lo), one(hi)
    tput_lo = r_lo["turns_per_sec"]
    tput_hi = r_hi["turns_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    # per-phase efficiency separates map scaling from the single-box
    # exchange artifact (all "nodes" share one memory bus here; on a
    # real cluster the exchange bandwidth scales with node count)
    phase_eff = {}
    for k in r_lo.get("phase_sec", {}):
        a, b = r_lo["phase_sec"].get(k), r_hi["phase_sec"].get(k)
        if a and b:
            phase_eff[k] = round((a / b) / (hi / lo), 3)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "turns_per_sec_lo": tput_lo, "turns_per_sec_hi": tput_hi,
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "phase_efficiency": phase_eff,
        "phase_sec_lo": r_lo.get("phase_sec"),
        "phase_sec_hi": r_hi.get("phase_sec"),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
