"""End-to-end KG construction pipeline (the reference's entry.py chain
re-expressed Ray-Data-first — SURVEY.md §3.4):

    read_parquet(transcripts)
      → map_batches(TripleEmitter actor pool)          # extract + link
      → ∪ side-table triples (CWE dict, ATT&CK)        # A5 graph union
      → distinct (subj,pred,obj,·,·)                   # A2 exact dedup
      → sort (subj,pred,obj)                           # canonical order
      → write_parquet(edges/)   +  node table → nodes/

Resume: phase A (extraction) checkpoints per shard group with lineage
manifests (state/manifest.py); a rerun skips complete groups. Phase B
(finalize) is recomputed from the shard outputs — it only sees narrow
deduped rows, never the transcript text.

Canonical rewrite: entity IRIs are rewritten through the union-find
canonical map (stages/canonicalize.py) before the final dedup, so two
aliases of one merged entity land on one node — the graft analogue of
the reference's unique-URI upsert.
"""

from __future__ import annotations

import glob
import os
import time

import pyarrow as pa

import ray.data
from ray.data import Dataset

from uckg_ray import namespaces as ns
from uckg_ray.config import PipelineConfig
from uckg_ray.sources import fixtures as fx
from uckg_ray.stages.canonicalize import canonical_map
from uckg_ray.stages.extract import (TripleEmitter, attack_triples,
                                     capec_dict_triples, cve_dict_triples,
                                     cwe_dict_triples, d3fend_dict_triples)
from uckg_ray.stages.link import AliasLinker, load_alias_table
from uckg_ray.stages.materialize import (distinct_edges, node_props, node_table,
                                         union_edge_sources)


def transcript_files(transcripts_dir: str) -> list[str]:
    if os.path.isfile(transcripts_dir):
        return [transcripts_dir]
    return sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))


def read_transcripts(paths: list[str] | str) -> Dataset:
    return ray.data.read_parquet(paths)


def extract_edges(turns: Dataset, fixture_dir: str,
                  cfg: PipelineConfig | None = None, *,
                  mark_aliases: bool = False,
                  keep_witnesses: bool = False) -> Dataset:
    """Transcript turns → edge stream with lineage (one text pass: regex
    mention templates + dictionary gate + CPE lookup join + alias link).
    With ``mark_aliases`` the stream also carries observed-alias marker
    rows so canonicalization needs no second pass over the text. With
    ``keep_witnesses`` every distinct (triple, conv, turn) witness
    survives the block combiner (provenance counting) instead of each
    triple collapsing to its min witness."""
    cfg = cfg or PipelineConfig()
    return turns.map_batches(
        TripleEmitter,
        fn_constructor_args=(
            os.path.join(fixture_dir, "cwe_dict.parquet"),
            os.path.join(fixture_dir, "cpe_dict.parquet"),
            os.path.join(fixture_dir, "alias_dict.parquet"),
            mark_aliases,
            keep_witnesses,
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
        num_cpus=1,
    )


def side_table_edges(fixture_dir: str) -> pa.Table:
    """Dictionary side-table triples (small, driver-built): CWE, CVE,
    CAPEC, D3FEND property maps + ATT&CK nodes/relationships."""
    return pa.concat_tables([
        cwe_dict_triples(os.path.join(fixture_dir, "cwe_dict.parquet")),
        cve_dict_triples(os.path.join(fixture_dir, "cve_dict.parquet")),
        capec_dict_triples(os.path.join(fixture_dir, "capec_dict.parquet")),
        d3fend_dict_triples(os.path.join(fixture_dir, "d3fend_dict.parquet")),
        attack_triples(os.path.join(fixture_dir, "attack_nodes.parquet"),
                       os.path.join(fixture_dir, "attack_relationships.parquet")),
    ])


def _groups(files: list[str], files_per_group: int | None) -> list[list[str]]:
    if not files_per_group:
        return [files]
    return [files[i:i + files_per_group] for i in range(0, len(files), files_per_group)]


def _named_groups(files: list[str], files_per_group: int | None,
                  group_by: str) -> list[tuple[str, list[str]]]:
    """Shard-group naming. ``position`` slices the sorted file list into
    ``group-NNNN`` (max pipelining; a mid-list insert shifts every later
    group). ``file`` keys ONE group per input file by its basename —
    the stable assignment an incremental daily re-sync needs: adding,
    removing or rewriting a shard file affects exactly its own group."""
    if group_by == "file":
        named = [("file-" + os.path.splitext(os.path.basename(f))[0], [f])
                 for f in files]
        if len({n for n, _ in named}) != len(named):
            raise ValueError("duplicate transcript basenames — file-keyed "
                             "incremental grouping needs unique stems")
        return named
    if group_by != "position":
        raise ValueError(f"unknown group_by: {group_by!r}")
    return [(f"group-{gi:04d}", g)
            for gi, g in enumerate(_groups(files, files_per_group))]


def rewriter_from_observed_aliases(observed: set[str], fixture_dir: str,
                                   cfg: PipelineConfig | None = None
                                   ) -> dict[str, str]:
    """IRI → canonical-IRI map for the entities reachable from the
    observed aliases. Union-find runs driver-side when the candidate
    pair set is small (it is bounded by the alias dictionary, the
    pipeline's small side); the distributed label-propagation path
    (stages/canonicalize.connected_components) is used when the
    dictionary outgrows ``cfg.cc_driver_max_pairs`` — same result,
    shuffle-based."""
    import pandas as pd

    cfg = cfg or PipelineConfig()
    alias_df = load_alias_table(os.path.join(fixture_dir, "alias_dict.parquet"))
    cand = alias_df[alias_df["block_key"].isin(observed)]
    pairs = list(dict.fromkeys(zip(cand["block_key"], cand["entity_id"])))
    if not pairs:
        return {}
    if len(pairs) <= cfg.cc_driver_max_pairs and not cfg.force_distributed_cc:
        from uckg_ray.stages.canonicalize import union_find_oracle
        canon = union_find_oracle(pairs)
    else:
        import ray.data
        pairs_ds = ray.data.from_pandas(
            pd.DataFrame(pairs, columns=["alias", "entity_id"]))
        cmap = canonical_map(pairs_ds, max_iters=cfg.cc_max_iters,
                             salt=cfg.cc_salt)
        canon = dict(zip(cmap["entity_id"], cmap["canonical_id"]))
    etype = dict(zip(alias_df["entity_id"], alias_df["entity_type"]))
    rewrite: dict[str, str] = {}
    for eid, c in canon.items():
        if eid != c:
            rewrite[ns.entity_iri(eid, etype[eid])] = ns.entity_iri(c, etype[c])
    return rewrite


def build_canonical_rewriter(turns: Dataset, fixture_dir: str,
                             cfg: PipelineConfig | None = None) -> dict[str, str]:
    """Rewriter via an explicit AliasLinker pass over the turns (used by
    the standalone kg_edges_canonical query; build_kg instead derives the
    observed aliases from marker rows in its single extraction pass)."""
    cfg = cfg or PipelineConfig()
    alias_df = load_alias_table(os.path.join(fixture_dir, "alias_dict.parquet"))
    links = turns.map_batches(
        AliasLinker,
        fn_constructor_args=(os.path.join(fixture_dir, "alias_dict.parquet"),),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
        num_cpus=1,
    )
    observed_ds = links.map_batches(
        lambda b: b.select(["alias"]), batch_format="pyarrow").unique("alias")
    return rewriter_from_observed_aliases(set(observed_ds), fixture_dir, cfg)


@ray.remote(num_cpus=1)
def _block_aliases(b: pa.Table) -> set:
    """Distinct alias-marker subjects of ONE edge block. Submitted as a
    raw task per block ref: a full Ray Data map job here costs ~2 s of
    streaming-executor setup for ~0.1 s of work (measured at sf0.1/32
    CPUs) and a unique() would shuffle. Blocks never move — only tiny
    per-block sets (bounded by the alias dictionary) return."""
    import pyarrow.compute as pc
    from uckg_ray.stages.extract import ALIAS_MARKER_PRED
    # mask on pred, filter ONLY the subj column — a whole-table filter
    # would copy every column for the few marker rows
    mask = pc.equal(b.column("pred"), ALIAS_MARKER_PRED)
    s = pc.filter(b.column("subj"), mask)
    u = pc.unique(s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s)
    return set(u.to_pylist())


def _apply_rewrite(batch: pa.Table, rewrite: dict[str, str]) -> pa.Table:
    """Vectorized IRI rewrite: index_in against the (small) canonical map,
    take + coalesce — no Python row loop."""
    if not rewrite:
        return batch
    import pyarrow.compute as pc
    keys = pa.array(list(rewrite.keys()), pa.string())
    vals = pa.array(list(rewrite.values()), pa.string())

    def sub(col):
        idx = pc.index_in(col, keys)
        return pc.coalesce(pc.take(vals, idx), col.combine_chunks()
                           if isinstance(col, pa.ChunkedArray) else col)

    subj = sub(batch.column("subj"))
    obj_col = batch.column("obj")
    obj_new = sub(obj_col)
    lit = batch.column("obj_is_literal")
    obj = pa.compute.if_else(
        lit, obj_col.combine_chunks() if isinstance(obj_col, pa.ChunkedArray)
        else obj_col, obj_new)
    return batch.set_column(0, "subj", subj).set_column(2, "obj", obj)


def _write_with_import_retry(fn, attempts: int = 4):
    """Run a write job, retrying transient ImportErrors from Ray's lazy
    ``fsspec.implementations.http`` probe: with aiohttp absent that
    import fails (normally caught as ModuleNotFoundError) and is
    re-attempted on every datasink construction — two CONCURRENT
    write_parquet setups can observe each other's partially-initialized
    module and raise ``ImportError: cannot import name ...`` instead.
    The race window is the datasink constructor only; nothing has been
    written when it fires, so a short-backoff retry is safe."""
    for i in range(attempts - 1):
        try:
            return fn()
        except ImportError:
            time.sleep(0.02 * (i + 1))
    return fn()


def build_kg(transcripts_dir: str, fixture_dir: str, out_dir: str,
             cfg: PipelineConfig | None = None, *, resume: bool = True,
             canonicalize: bool = True, group_by: str = "position") -> dict:
    """Full pipeline with per-group checkpointing. Returns the global
    manifest (metrics included). ``group_by="file"`` keys shard groups
    by input basename instead of list position (see ``_named_groups``)
    — the stable grouping ``build_kg_incremental`` builds on."""
    from uckg_ray.state import manifest as mf

    cfg = cfg or PipelineConfig()
    t_start = time.perf_counter()
    files = transcript_files(transcripts_dir)
    named_groups = _named_groups(files, cfg.files_per_group, group_by)
    groups = [g for _, g in named_groups]
    shards_root = os.path.join(out_dir, "shards")
    os.makedirs(shards_root, exist_ok=True)

    flags = f"mark_aliases={canonicalize}"
    # prune shard dirs that don't belong to the current grouping — stale
    # outputs from a prior run with different inputs, files_per_group or
    # naming scheme (and crash-orphaned *.tmp dirs) must never be
    # unioned into the final table
    import shutil as _sh
    expected = {name for name, _ in named_groups}
    for d in glob.glob(os.path.join(shards_root, "*")):
        if os.path.basename(d) not in expected:
            _sh.rmtree(d, ignore_errors=True)

    # Single-group runs (files_per_group=None — the max-pipelining
    # default) keep the extracted edge blocks IN the object store and
    # feed phase B from them directly: the shard parquet is still
    # written (the resume/lineage artifact) but in a background thread
    # overlapped with the finalize compute, so the build never pays a
    # disk round-trip for data it just computed (measured: the phase-B
    # shard re-read was a flat ~4 s at every CPU count). Multi-group
    # checkpointed runs trade that for bounded memory: each group
    # streams through write_parquet and phase B re-reads from disk —
    # at 100-TB scale with many groups that spill-to-parquet shape is
    # the one you want.
    import concurrent.futures as _cf

    group_stats = []
    skipped = 0
    reuse_blocks = len(groups) == 1
    alias_sets: list = []
    mat_groups: list[Dataset] = []
    shard_writes: list[_cf.Future] = []
    write_pool = _cf.ThreadPoolExecutor(max_workers=4)
    for gname, gfiles in named_groups:
        gdir = os.path.join(shards_root, gname)
        if resume and mf.group_is_complete(gdir, gfiles, flags):
            skipped += 1
            continue
        t0 = time.perf_counter()
        turns = read_transcripts(gfiles)
        edges = extract_edges(turns, fixture_dir, cfg,
                              mark_aliases=canonicalize)
        tmp_dir = gdir + ".tmp"
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(gdir, ignore_errors=True)
        rows_in = sum(pa.parquet.read_metadata(f).num_rows for f in gfiles)
        if reuse_blocks:
            edges_mat = edges.materialize()
            mat_groups.append(edges_mat)
            if canonicalize:
                # run the per-block alias scans NOW, before the
                # background shard write floods the cluster with write
                # tasks — ~0.15 s total at sf0.1/32 CPUs, and collecting
                # eagerly here keeps them off the contended window
                # (futures left in flight measured 0.6–2.2 s to drain
                # once the write job starts grabbing slots)
                alias_sets.extend(ray.get(
                    [_block_aliases.remote(ref)
                     for ref in edges_mat.get_internal_block_refs()]))

            def _write_shard(edges_mat=edges_mat, tmp_dir=tmp_dir,
                             gdir=gdir, gfiles=gfiles, t0=t0,
                             rows_in=rows_in):
                _write_with_import_retry(lambda: edges_mat.write_parquet(
                    tmp_dir, min_rows_per_file=100_000))
                os.replace(tmp_dir, gdir)
                # the manifest lands only after the write completes: a
                # crash mid-write leaves no manifest → group rebuilt
                return mf.write_group_manifest(
                    gdir, gfiles, rows_in=rows_in,
                    edges_out=edges_mat.count(),
                    wall_sec=time.perf_counter() - t0, flags=flags)

            shard_writes.append(write_pool.submit(_write_shard))
        else:
            edges.write_parquet(tmp_dir, min_rows_per_file=100_000)
            os.replace(tmp_dir, gdir)
            edges_out = sum(
                pa.parquet.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(gdir, "*.parquet")))
            group_stats.append(mf.write_group_manifest(
                gdir, gfiles, rows_in=rows_in, edges_out=edges_out,
                wall_sec=time.perf_counter() - t0, flags=flags))

    # phase-B resume: when every group was reused AND the side-table
    # dictionaries are unchanged, the prior finalize outputs are valid —
    # a fully-complete rerun is a metadata-only no-op
    dict_files = sorted(glob.glob(os.path.join(fixture_dir, "*.parquet")))
    # group fingerprint = what its manifest stores (write_group_manifest
    # records shard_fingerprint(gfiles); group_is_complete verified the
    # match for skipped groups) — computed directly so the async shard
    # writes need not have landed yet
    group_fps = [mf.shard_fingerprint(gfiles) for gfiles in groups]
    import hashlib as _hashlib
    finalize_fp = _hashlib.sha256(
        ("|".join([flags, mf.shard_fingerprint(dict_files), *group_fps]))
        .encode()).hexdigest()
    if resume and skipped == len(groups):
        prior = mf.build_status(out_dir).get("final")
        if (prior and prior.get("finalize_fp") == finalize_fp
                and all(os.path.isdir(os.path.join(out_dir, d))
                        for d in ("edges", "nodes", "props"))):
            prior = dict(prior)
            prior["groups_skipped_by_resume"] = skipped
            prior["finalize_skipped"] = True
            write_pool.shutdown()
            return prior

    # phase B — finalize from shard outputs (narrow rows only; transcript
    # text is never re-read)
    from uckg_ray.stages.extract import ALIAS_MARKER_PRED

    t_phase_a = time.perf_counter() - t_start
    # shard-edge source for phase B: freshly built groups come straight
    # from their materialized object-store blocks (no disk round-trip);
    # resume-skipped groups are re-read from their shard parquet with
    # block-count control (~1 block per core — fewer, bigger blocks make
    # the combiner collapse more; measured 6× on the dedup+sort phase
    # at sf0.1), materialized ONCE for the alias scan + finalize passes.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    fresh_parts = list(mat_groups)
    if mat_groups:          # single fresh group: everything is in memory
        skipped_files = []
    else:                   # multi-group or resume-skipped: read shards
        skipped_files = sorted(glob.glob(
            os.path.join(shards_root, "*", "*.parquet")))
    if skipped_files:
        skipped_ds = ray.data.read_parquet(
            skipped_files, override_num_blocks=n_cpus).materialize()
        fresh_parts.append(skipped_ds)
        if canonicalize:
            alias_sets.extend(ray.get(
                [_block_aliases.remote(ref)
                 for ref in skipped_ds.get_internal_block_refs()]))
    shard_edges = (fresh_parts[0].union(*fresh_parts[1:])
                   if len(fresh_parts) > 1 else fresh_parts[0])
    t_shard_read = time.perf_counter() - t_start - t_phase_a

    rewrite: dict[str, str] = {}
    if canonicalize:
        # observed aliases from the marker rows — the data-scale step of
        # canonicalization. Every block (freshly materialized in phase A
        # or re-read from shard parquet above) was scanned by a raw
        # _block_aliases task at materialize time; union the tiny
        # per-block sets (bounded by the alias dictionary × blocks).
        observed = set().union(*alias_sets) if alias_sets else set()
        rewrite = rewriter_from_observed_aliases(observed, fixture_dir, cfg)
    t_canon = time.perf_counter() - t_start - t_phase_a - t_shard_read

    from uckg_ray.stages.materialize import _local_dedup

    def finalize_batch(batch: pa.Table) -> pa.Table:
        # fused: drop marker rows, canonical-rewrite, block-local dedup
        keep = pa.compute.not_equal(batch.column("pred"), ALIAS_MARKER_PRED)
        return _local_dedup(_apply_rewrite(batch.filter(keep), rewrite))

    side = side_table_edges(fixture_dir)
    if rewrite:
        side = _apply_rewrite(side, rewrite)
    from uckg_ray.schema import EDGE_KEY_COLS
    all_edges = union_edge_sources(
        shard_edges.map_batches(finalize_batch, batch_format="pyarrow", batch_size=None),
        side.select(EDGE_KEY_COLS))

    # finalize_batch already left each block locally distinct — skip the
    # combiner map pass inside distinct_edges (global distinct is the
    # sort's in-block mask either way)
    final = distinct_edges(all_edges, sort=True, coalesce_blocks=n_cpus,
                           local_combine=False).materialize()
    edges_dir = os.path.join(out_dir, "edges")
    nodes_dir = os.path.join(out_dir, "nodes")
    props_dir = os.path.join(out_dir, "props")
    import shutil
    shutil.rmtree(edges_dir, ignore_errors=True)
    shutil.rmtree(nodes_dir, ignore_errors=True)
    shutil.rmtree(props_dir, ignore_errors=True)
    t_edges = (time.perf_counter() - t_start - t_phase_a - t_shard_read
               - t_canon)

    # one materialized edge set feeds the write AND both aggregations —
    # no parquet re-reads, no repeated pipeline execution. The three
    # output jobs are independent consumers of the same in-memory
    # blocks, so they run CONCURRENTLY (each driver thread gets its own
    # streaming executor; the cluster schedules all three): the sorted
    # edge write is I/O-heavy while nodes/props are shuffle-heavy, so
    # overlapping them fills both (A4 props = the reference's n10s
    # ARRAY-property load; nodes = unique-URI table).
    out_jobs = [
        write_pool.submit(_write_with_import_retry,
                          lambda: final.write_parquet(edges_dir)),
        write_pool.submit(_write_with_import_retry,
                          lambda: node_table(final).write_parquet(nodes_dir)),
        write_pool.submit(_write_with_import_retry,
                          lambda: node_props(final).write_parquet(props_dir)),
    ]
    for f in out_jobs:
        f.result()
    # join the background shard writes (usually long done — they overlap
    # the whole finalize) and collect their lineage manifests
    for f in shard_writes:
        group_stats.append(f.result())
    write_pool.shutdown()
    t_nodes = (time.perf_counter() - t_start
               - t_phase_a - t_shard_read - t_canon - t_edges)

    n_edges = sum(pa.parquet.read_metadata(f).num_rows
                  for f in glob.glob(os.path.join(edges_dir, "*.parquet")))
    n_nodes = sum(pa.parquet.read_metadata(f).num_rows
                  for f in glob.glob(os.path.join(nodes_dir, "*.parquet")))
    n_props = sum(pa.parquet.read_metadata(f).num_rows
                  for f in glob.glob(os.path.join(props_dir, "*.parquet")))
    n_turns = sum(pa.parquet.read_metadata(f).num_rows for f in files)
    wall = time.perf_counter() - t_start
    payload = {
        "n_turns": n_turns,
        "n_groups": len(groups),
        "groups_skipped_by_resume": skipped,
        "n_distinct_edges": n_edges,
        "n_nodes": n_nodes,
        "n_props": n_props,
        "n_canonical_rewrites": len(rewrite),
        "finalize_fp": finalize_fp,
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "phase_sec": {"extract": round(t_phase_a, 3),
                      "shard_read": round(t_shard_read, 3),
                      "canonicalize": round(t_canon, 3),
                      "dedup_sort": round(t_edges, 3),
                      "outputs": round(t_nodes, 3)},
        "groups": group_stats,
    }
    mf.write_global_manifest(out_dir, payload)
    return payload


def _edge_diff_counts(old: Dataset, new: Dataset) -> dict:
    """Graph-level what-changed audit between two edge shards: distinct
    triples on each side (marker rows dropped), then ``snapshot_diff``
    keyed on the 64-bit triple hash — counts of edges the rebuild added
    and removed. Cost is bounded by the two shards, never the corpus."""
    import numpy as np
    import pyarrow.compute as pc

    from uckg_ray.schema import EDGE_KEY_COLS
    from uckg_ray.stages.dedup import _stable64
    from uckg_ray.stages.extract import ALIAS_MARKER_PRED
    from uckg_ray.stages.joins import snapshot_diff
    from uckg_ray.stages.materialize import distinct_edges

    def keyed(b: pa.Table) -> pa.Table:
        b = b.filter(pc.not_equal(b.column("pred"), ALIAS_MARKER_PRED))
        cols = []
        for c in EDGE_KEY_COLS:
            col = b.column(c).cast(pa.string())
            cols.append(col.combine_chunks()
                        if isinstance(col, pa.ChunkedArray) else col)
        trip = pc.binary_join_element_wise(*cols, "\x1f")
        texts = trip.to_pylist()
        # distinct_edges guarantees unique triples per side, so the
        # hash key is unique per side too (the diff's precondition)
        k = np.fromiter((_stable64(t) for t in texts), dtype=np.uint64,
                        count=len(texts)).view(np.int64)
        return pa.table({"edge_key": pa.array(k, pa.int64()),
                         "triple": pa.array(texts, pa.string())})

    def prep(ds: Dataset) -> Dataset:
        return distinct_edges(ds, sort=False).map_batches(
            keyed, batch_format="pyarrow", batch_size=None)

    ops = snapshot_diff(prep(old), prep(new), key_col="edge_key",
                        text_col="triple")
    counts = {r["op"]: r["count()"]
              for r in ops.groupby("op").count().take_all()}
    return {"edges_added": int(counts.get("add", 0)),
            "edges_removed": int(counts.get("del", 0))}


def build_kg_incremental(transcripts_dir: str, fixture_dir: str,
                         out_dir: str, cfg: PipelineConfig | None = None,
                         *, canonicalize: bool = True,
                         audit_diff: bool = True) -> dict:
    """Incremental daily re-sync driver — the composition the reference
    schedules as its ingestion DAG (``airflow/dags/ingestion_dag.py:
    27-77``: re-download → SHA-compare → reprocess changed sources →
    merge, with the SQLite offset row ``cve_collection.py:311-336``):

    1. **Detect** — each current transcript file is compared against its
       recorded group manifest (``state/manifest.py`` fingerprint:
       name+size+mtime, the analogue of the reference's SHA-256 snapshot
       compare): no manifest → *added*, fingerprint/flags mismatch →
       *changed*, match → *unchanged*; shard dirs whose input file
       vanished → *removed* (pruned).
    2. **Rebuild** — ``build_kg(resume=True, group_by="file")``
       re-extracts ONLY added+changed groups (file-keyed groups make the
       assignment stable under inserts) and re-runs the finalize merge
       over all shards; when nothing changed, the finalize fingerprint
       short-circuits the rerun to a metadata no-op.
    3. **Audit** — per changed group, ``snapshot_diff`` between its
       previous and new distinct edge shards reports how many edges the
       rebuild added/removed (A6's change report at graph granularity).

    Returns the global build manifest plus an ``incremental`` section:
    ``{added, changed, unchanged, removed, edge_diff}``."""
    import shutil

    from uckg_ray.state import manifest as mf

    cfg = cfg or PipelineConfig()
    files = transcript_files(transcripts_dir)
    named = _named_groups(files, cfg.files_per_group, "file")
    shards_root = os.path.join(out_dir, "shards")
    prev_root = os.path.join(out_dir, "shards_prev")
    shutil.rmtree(prev_root, ignore_errors=True)
    flags = f"mark_aliases={canonicalize}"
    report: dict = {"added": [], "changed": [], "unchanged": [],
                    "removed": []}
    for name, gfiles in named:
        gdir = os.path.join(shards_root, name)
        if not os.path.exists(mf.manifest_path(gdir)):
            report["added"].append(name)
        elif mf.group_is_complete(gdir, gfiles, flags):
            report["unchanged"].append(name)
        else:
            report["changed"].append(name)
            if audit_diff:
                # stash the stale shard OUTSIDE shards_root (build_kg
                # prunes unexpected dirs inside it) for the post-rebuild
                # edge diff; without audit the fingerprint gate alone
                # forces the re-extract
                os.makedirs(prev_root, exist_ok=True)
                os.replace(gdir, os.path.join(prev_root, name))
    expected = {name for name, _ in named}
    report["removed"] = sorted(
        os.path.basename(d)
        for d in glob.glob(os.path.join(shards_root, "*"))
        if os.path.basename(d) not in expected)

    manifest = build_kg(transcripts_dir, fixture_dir, out_dir, cfg,
                        resume=True, canonicalize=canonicalize,
                        group_by="file")

    edge_diff: dict = {}
    if audit_diff:
        for name in report["changed"]:
            old_files = sorted(glob.glob(
                os.path.join(prev_root, name, "*.parquet")))
            new_files = sorted(glob.glob(
                os.path.join(shards_root, name, "*.parquet")))
            if old_files and new_files:
                edge_diff[name] = _edge_diff_counts(
                    ray.data.read_parquet(old_files),
                    ray.data.read_parquet(new_files))
        shutil.rmtree(prev_root, ignore_errors=True)
    manifest["incremental"] = {**report, "edge_diff": edge_diff}
    return manifest


def kg_for_sf(sf_dir: str, out_dir: str, cfg: PipelineConfig | None = None,
              **kw) -> dict:
    """Convenience: generate fixtures for sf_dir and run the full build."""
    fdir = fx.ensure_fixtures(sf_dir)
    return build_kg(os.path.join(fdir, "transcripts"), fdir, out_dir, cfg, **kw)
