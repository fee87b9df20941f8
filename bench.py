"""Benchmark harness.

    python bench.py               # MEDIAN-of-3 fresh-process builds +
                                  # per-query timings, ONE JSON line
    python bench.py --once        # single in-process run (legacy shape)
    python bench.py --build-once  # one build only (subprocess worker)
    python bench.py --scaling     # median-of-3 builds at 8 and 32 CPUs
                                  # → throughputs + efficiency (overall
                                  # and per phase)
    python bench.py --scaling-pair LO HI
                                  # one N→4N pair at arbitrary CPU
                                  # counts (e.g. 2 8: the uncontended
                                  # pair below DRAM saturation)

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

Headline = full KG build (extract → link → canonicalize → dedup → sort →
write edges+nodes+props) over the transcript fixture for the sf dir; the
metric of record is triples/sec (BASELINE.md). Each build runs in a
FRESH process (own Ray session): repeated builds inside one session
measured up to 1.7× slower from object-store pressure, and this box
sees bursty host CPU steal — the median of three fresh runs plus the
recorded steal delta make the artifact reflect the engine, not the
neighbor's workload.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time


def _steal_ticks() -> int:
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return 0


def _init_ray(num_cpus: int):
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def _warm_cache(tdir: str):
    # warm the page cache so we measure compute+shuffle, not first disk
    # read (count() alone would take the parquet-metadata fast path and
    # read nothing — force full block reads)
    import pyarrow as pa
    import ray.data
    ray.data.read_parquet(tdir).map_batches(
        lambda b: pa.table({"n": [b.num_rows]}), batch_format="pyarrow",
        batch_size=None).count()


def run_build_once() -> dict:
    """One fresh-session KG build; prints/returns the build metrics."""
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    _init_ray(num_cpus)
    from uckg_ray.pipelines.kg import build_kg
    from uckg_ray.sources import fixtures as fx
    fdir = fx.ensure_fixtures(sf_dir)          # untimed (cached after 1st run)
    tdir = os.path.join(fdir, "transcripts")
    _warm_cache(tdir)
    # per-process out dir: concurrent bench runs (e.g. a driver run
    # overlapping a manual one) must never clobber each other's output
    out_dir = f"/tmp/uckg_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    s0 = _steal_ticks()
    t0 = time.perf_counter()
    manifest = build_kg(tdir, fdir, out_dir, resume=False)
    headline = time.perf_counter() - t0
    steal = _steal_ticks() - s0
    ray.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "value": round(headline, 3),
        "num_cpus": num_cpus,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "n_turns": manifest["n_turns"],
        "n_distinct_edges": manifest["n_distinct_edges"],
        "triples_per_sec": round(manifest["n_distinct_edges"] / headline, 1),
        "turns_per_sec": round(manifest["n_turns"] / headline, 1),
        "phase_sec": manifest["phase_sec"],
        "steal_ticks": steal,
    }


def _build_median(num_cpus: int, repeats: int = 3) -> dict:
    """Median-of-N builds, each in a FRESH subprocess (own Ray session,
    own object store). Median chosen by wall time; all samples recorded."""
    runs = []
    for _ in range(repeats):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--build-once"],
            env=env, capture_output=True, text=True, check=True)
        runs.append(json.loads(out.stdout.strip().splitlines()[-1]))
    runs.sort(key=lambda r: r["value"])
    med = dict(runs[len(runs) // 2])
    med["build_samples_sec"] = [r["value"] for r in runs]
    med["build_samples_steal_ticks"] = [r["steal_ticks"] for r in runs]
    return med


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    med = _build_median(num_cpus)

    # per-query timings: one pass in this process's own session
    import ray
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod
    from uckg_ray.sources import fixtures as fx
    fx.ensure_fixtures(sf_dir)

    queries = {"kg_build": med["value"]}

    def timed(name, fn):
        # per-query timings must stay extraction-honest: the shared
        # KG-extraction cache (one extraction feeding ten KG views) is
        # a correctness-check optimization, not a bench one
        entrymod._distinct_edges_cached.cache_clear()
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
                 "dedup_token_jaccard", "dedup_ngram_jaccard",
                 "ann_cosine_topk", "events_window",
                 "events_asof", "order_join", "q1_pricing", "text_quality",
                 "token_count", "kg_custom_spec", "doc_winnow",
                 "embed_neardup_lsh", "events_range_join", "events_running",
                 "events_quantiles", "events_rollup", "docs_snapshot_diff",
                 "kmv_distinct", "events_json_sum", "kg_subprop_entailed",
                 "events_cube", "scrub_pii", "chunk_documents",
                 "embed_centroids", "q5_region_volume", "top_terms",
                 "kg_owl_entailed", "doc_repetition", "zipf_histogram",
                 "ngram_contamination", "multimodal_decode", "fp_overlap",
                 "events_funnel", "kg_pagerank", "kg_func_violations",
                 "kg_equiv_entailed", "audio_features",
                 "kg_restriction_types", "embed_semdedup",
                 "kg_bfs_levels", "normalize_text", "kg_components",
                 "dedup_delta", "events_trimmed", "sft_pairs", "events_pct_rank",
                 "conv_stats", "bm25_topk", "token_shards",
                 "turn_transitions", "events_mad", "doc_surprisal",
                 "kg_reciprocal", "conv_dedup", "turn_latency",
                 "tool_sequences", "data_mixture", "mixture_sample",
                 "decontaminate", "window_distinct", "kg_degree_hist",
                 "doc_length_quantiles", "colloc_topk", "events_outliers",
                 "embed_quantize", "q6_revenue", "readability",
                 "q3_shipping", "q14_promo", "events_dow_hour",
                 "q18_big_orders", "kg_class_sizes", "events_latest",
                 "kg_untyped", "q10_returns", "q4_priority",
                 "profile_stats", "cap_per_source", "turn_dupes",
                 "kg_char_sets", "kg_dangling", "mention_lift",
                 "kg_entity_support", "kg_star_bgp", "kg_shacl",
                 "events_streaks", "dedup_containment", "sentence_dedup",
                 "semantic_contamination", "events_gaps", "doc_novelty",
                 "kg_gate_dropped", "trending_entities", "kg_negatives",
                 "kg_fill_rates", "events_burst", "kg_pred_cooc",
                 "tool_skipgrams", "kg_growth"):
        # kg_triple_support and kg_version_diff join conv_neardup on the
        # exclusion list: their outputs are inherently turn-scaled
        # (publishedDateTime objects embed per-turn timestamps → ~4M
        # rows, 70-170 s each at sf0.1) and would dominate the sweep;
        # both stay oracle-checked (sf0.001 + sf0.01) and unit-tested.
        # conv_neardup is deliberately NOT in the sweep: a full-corpus
        # conversation-level minhash (~120 s at sf0.1) would dominate
        # the bench wall-time; it stays oracle-checked and unit-tested.
        timed(name, q[name])
    ray.shutdown()

    return {
        "metric": "kg_build_e2e_sec",
        "value": med["value"],
        "unit": "sec",
        "queries": queries,
        "sf": med["sf"],
        "num_cpus": num_cpus,
        "n_turns": med["n_turns"],
        "n_distinct_edges": med["n_distinct_edges"],
        "triples_per_sec": med["triples_per_sec"],
        "turns_per_sec": med["turns_per_sec"],
        "phase_sec": med["phase_sec"],
        "build_samples_sec": med["build_samples_sec"],
        "build_samples_steal_ticks": med["build_samples_steal_ticks"],
    }


def run_once() -> dict:
    """Legacy single-process shape: one build + query timings in one
    session (kept for quick manual runs)."""
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod
    from uckg_ray.pipelines.kg import build_kg
    from uckg_ray.sources import fixtures as fx
    fdir = fx.ensure_fixtures(sf_dir)
    tdir = os.path.join(fdir, "transcripts")
    _warm_cache(tdir)
    out_dir = f"/tmp/uckg_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = build_kg(tdir, fdir, out_dir, resume=False)
    headline = time.perf_counter() - t0
    queries = {"kg_build": round(headline, 3)}
    result = {
        "metric": "kg_build_e2e_sec", "value": round(headline, 3),
        "unit": "sec", "queries": queries,
        "sf": os.path.basename(os.path.normpath(sf_dir)),
        "num_cpus": num_cpus, "n_turns": manifest["n_turns"],
        "n_distinct_edges": manifest["n_distinct_edges"],
        "triples_per_sec": round(manifest["n_distinct_edges"] / headline, 1),
        "turns_per_sec": round(manifest["n_turns"] / headline, 1),
        "phase_sec": manifest["phase_sec"],
    }
    ray.shutdown()
    shutil.rmtree(out_dir, ignore_errors=True)
    return result


def _hw_compute_ceiling(nprocs=(6, 24), n_iters=4) -> dict:
    """Pure-multiprocessing microbench of the extraction kernel — NO Ray,
    no object store, no scheduler: each process loads the dictionaries and
    runs TripleEmitter on the same in-memory Arrow batch in a tight loop.
    Per-process throughput at 6 vs 24 processes measures what this box's
    shared memory bus allows ANY framework to show when scaling a
    compute stage 8→32 CPUs (frequency is pinned at 2100 MHz here, so the
    drop is DRAM/LLC contention). On a real N→4N-node cluster each node
    brings its own memory bus, so per-core throughput stays flat — this
    number is the single-box measurement artifact, quantified."""
    import multiprocessing as mp
    import os as _os

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from uckg_ray.sources import fixtures as fx
    fdir = fx.ensure_fixtures(sf_dir)

    def worker(q):
        import pyarrow.parquet as pq
        from uckg_ray.stages.extract import TripleEmitter
        em = TripleEmitter(_os.path.join(fdir, "cwe_dict.parquet"),
                           _os.path.join(fdir, "cpe_dict.parquet"),
                           _os.path.join(fdir, "alias_dict.parquet"), True)
        files = sorted(glob_mod.glob(_os.path.join(fdir, "transcripts",
                                                   "*.parquet")))
        batch = pq.read_table(files[0]).slice(0, 8192)
        em(batch)  # warm
        t0 = time.perf_counter()
        for _ in range(n_iters):
            em(batch)
        q.put((n_iters * 8192) / (time.perf_counter() - t0))

    import glob as glob_mod
    out = {}
    for n in nprocs:
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        rates = [q.get() for _ in ps]
        [p.join() for p in ps]
        out[f"per_proc_turns_per_sec_{n}procs"] = round(
            sum(rates) / len(rates), 1)
    lo_n, hi_n = nprocs
    out["pure_compute_scaling_eff"] = round(
        (out[f"per_proc_turns_per_sec_{hi_n}procs"] * hi_n)
        / (out[f"per_proc_turns_per_sec_{lo_n}procs"] * lo_n)
        / (hi_n / lo_n), 3)
    return out


def run_scaling(lo: int = 8, hi: int = 32) -> dict:
    r_lo, r_hi = _build_median(lo), _build_median(hi)
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
    res = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "samples_lo": r_lo["build_samples_sec"],
        "samples_hi": r_hi["build_samples_sec"],
        "steal_ticks_lo": r_lo["build_samples_steal_ticks"],
        "steal_ticks_hi": r_hi["build_samples_steal_ticks"],
        "turns_per_sec_lo": tput_lo, "turns_per_sec_hi": tput_hi,
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "phase_efficiency": phase_eff,
        "phase_sec_lo": r_lo.get("phase_sec"),
        "phase_sec_hi": r_hi.get("phase_sec"),
        "sf": r_hi["sf"],
    }
    # second N→4N pair below the shared-bus saturation point (neither
    # leg contends for DRAM bandwidth the way 24+ busy cores do), plus
    # the no-Ray hardware ceiling that bounds the 8→32 pair on this box
    r4, r16 = _build_median(4, repeats=1), _build_median(16, repeats=1)
    res["pair_4_to_16"] = {
        "sec_4": r4["value"], "sec_16": r16["value"],
        "turns_per_sec_4": r4["turns_per_sec"],
        "turns_per_sec_16": r16["turns_per_sec"],
        "efficiency": round(
            (r16["turns_per_sec"] / r4["turns_per_sec"]) / 4, 3),
        "phase_sec_4": r4.get("phase_sec"),
        "phase_sec_16": r16.get("phase_sec"),
    }
    res["hw_compute_ceiling"] = _hw_compute_ceiling(
        nprocs=(max(1, int(lo * 0.75)), max(2, int(hi * 0.75))))
    return res


def run_query_once(name: str) -> dict:
    """One fresh-session timed run of a single registry query (worker
    for --query-scaling)."""
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    import ray
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod
    from uckg_ray.sources import fixtures as fx
    fx.ensure_fixtures(sf_dir)
    fn = entrymod.queries()[name]
    from ray.data import Dataset

    def once():
        entrymod._distinct_edges_cached.cache_clear()
        t0 = time.perf_counter()
        res = fn(sf_dir)
        n = res.count() if isinstance(res, Dataset) else len(res)
        return time.perf_counter() - t0, n

    # scaling measures steady-state throughput: the first execution in a
    # fresh session pays several seconds of one-time worker-process
    # imports + page-cache reads (measured 2-6s, IDENTICAL at 2 and 8
    # CPUs) that a long-running cluster amortizes — warm once untimed,
    # then report the median of three timed runs.
    once()
    s0 = _steal_ticks()
    samples = [once() for _ in range(3)]
    steal = _steal_ticks() - s0
    ray.shutdown()
    walls = sorted(w for w, _ in samples)
    return {"query": name, "sec": round(walls[1], 3),
            "samples_sec": [round(w, 3) for w in walls],
            "rows": samples[0][1],
            "num_cpus": num_cpus, "steal_ticks": steal,
            "sf": os.path.basename(os.path.normpath(sf_dir))}


def run_query_scaling(names: list[str], lo: int, hi: int) -> dict:
    """Per-query N→4N scaling: each leg is a fresh subprocess (own Ray
    session). Efficiency = (sec_lo / sec_hi) / (hi / lo) — same input,
    so time ratio is the throughput ratio."""
    out = {"metric": "query_scaling", "cpus_lo": lo, "cpus_hi": hi,
           "queries": {}}
    for name in names:
        legs = {}
        for cpus in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--query-once", name],
                env=env, capture_output=True, text=True, check=True)
            legs[cpus] = json.loads(r.stdout.strip().splitlines()[-1])
        out["queries"][name] = {
            "sec_lo": legs[lo]["sec"], "sec_hi": legs[hi]["sec"],
            "rows": legs[hi]["rows"],
            "steal_lo": legs[lo]["steal_ticks"],
            "steal_hi": legs[hi]["steal_ticks"],
            "efficiency": round((legs[lo]["sec"] / legs[hi]["sec"])
                                / (hi / lo), 3)}
        out["sf"] = legs[hi]["sf"]
    return out


def run_scaling_pair(lo: int, hi: int) -> dict:
    """One N→4N pair at arbitrary CPU counts (single build per leg) —
    `python bench.py --scaling-pair 2 8` measures the uncontended pair
    where neither leg saturates the box's shared memory bus."""
    r_lo, r_hi = _build_median(lo, repeats=1), _build_median(hi, repeats=1)
    return {
        "metric": "scaling_efficiency",
        "value": round((r_hi["turns_per_sec"] / r_lo["turns_per_sec"])
                       / (hi / lo), 3),
        "unit": "ratio",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "turns_per_sec_lo": r_lo["turns_per_sec"],
        "turns_per_sec_hi": r_hi["turns_per_sec"],
        "triples_per_sec_lo": r_lo["triples_per_sec"],
        "triples_per_sec_hi": r_hi["triples_per_sec"],
        "steal_ticks_lo": r_lo["build_samples_steal_ticks"],
        "steal_ticks_hi": r_hi["build_samples_steal_ticks"],
        "phase_sec_lo": r_lo.get("phase_sec"),
        "phase_sec_hi": r_hi.get("phase_sec"),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--build-once" in sys.argv:
        print(json.dumps(run_build_once()))
    elif "--once" in sys.argv:
        print(json.dumps(run_once()))
    elif "--query-once" in sys.argv:
        i = sys.argv.index("--query-once")
        print(json.dumps(run_query_once(sys.argv[i + 1])))
    elif "--query-scaling" in sys.argv:
        i = sys.argv.index("--query-scaling")
        lo_, hi_ = int(sys.argv[i + 1]), int(sys.argv[i + 2])
        print(json.dumps(run_query_scaling(sys.argv[i + 3:], lo_, hi_)))
    elif "--scaling-pair" in sys.argv:
        i = sys.argv.index("--scaling-pair")
        print(json.dumps(run_scaling_pair(int(sys.argv[i + 1]),
                                          int(sys.argv[i + 2]))))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
