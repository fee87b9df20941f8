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
from uckg_ray.stages.canonicalize import canonical_map, observed_alias_pairs
from uckg_ray.stages.extract import TripleEmitter, attack_triples, cwe_dict_triples
from uckg_ray.stages.link import AliasLinker, load_alias_table
from uckg_ray.stages.materialize import distinct_edges, node_table, union_edge_sources


def transcript_files(transcripts_dir: str) -> list[str]:
    if os.path.isfile(transcripts_dir):
        return [transcripts_dir]
    return sorted(glob.glob(os.path.join(transcripts_dir, "*.parquet")))


def read_transcripts(paths: list[str] | str) -> Dataset:
    return ray.data.read_parquet(paths)


def extract_edges(turns: Dataset, fixture_dir: str,
                  cfg: PipelineConfig | None = None) -> Dataset:
    """Transcript turns → edge stream with lineage (one text pass: regex
    mention templates + dictionary gate + CPE lookup join + alias link)."""
    cfg = cfg or PipelineConfig()
    return turns.map_batches(
        TripleEmitter,
        fn_constructor_args=(
            os.path.join(fixture_dir, "cwe_dict.parquet"),
            os.path.join(fixture_dir, "cpe_dict.parquet"),
            os.path.join(fixture_dir, "alias_dict.parquet"),
        ),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=cfg.concurrency,
        num_cpus=1,
    )


def side_table_edges(fixture_dir: str) -> pa.Table:
    """CWE-dictionary + ATT&CK side-table triples (small, driver-built)."""
    t1 = cwe_dict_triples(os.path.join(fixture_dir, "cwe_dict.parquet"))
    t2 = attack_triples(os.path.join(fixture_dir, "attack_nodes.parquet"),
                        os.path.join(fixture_dir, "attack_relationships.parquet"))
    return pa.concat_tables([t1, t2])


def _groups(files: list[str], files_per_group: int | None) -> list[list[str]]:
    if not files_per_group:
        return [files]
    return [files[i:i + files_per_group] for i in range(0, len(files), files_per_group)]


def build_canonical_rewriter(turns: Dataset, fixture_dir: str,
                             cfg: PipelineConfig | None = None) -> dict[str, str]:
    """IRI → canonical IRI map from the distributed union-find over
    observed alias/entity pairs. Small by construction (bounded by the
    alias dictionary), broadcast into the rewrite stage."""
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
    pairs = observed_alias_pairs(links, alias_df)
    cmap = canonical_map(pairs)
    etype = dict(zip(alias_df["entity_id"], alias_df["entity_type"]))
    rewrite: dict[str, str] = {}
    for eid, canon in zip(cmap["entity_id"], cmap["canonical_id"]):
        if eid != canon:
            rewrite[ns.entity_iri(eid, etype[eid])] = ns.entity_iri(canon, etype[canon])
    return rewrite


def _apply_rewrite(batch: pa.Table, rewrite: dict[str, str]) -> pa.Table:
    if not rewrite:
        return batch
    subj = [rewrite.get(s, s) for s in batch.column("subj").to_pylist()]
    obj_raw = batch.column("obj").to_pylist()
    lit = batch.column("obj_is_literal").to_pylist()
    obj = [o if l else rewrite.get(o, o) for o, l in zip(obj_raw, lit)]
    return batch.set_column(0, "subj", pa.array(subj, pa.string())) \
                .set_column(2, "obj", pa.array(obj, pa.string()))


def build_kg(transcripts_dir: str, fixture_dir: str, out_dir: str,
             cfg: PipelineConfig | None = None, *, resume: bool = True,
             canonicalize: bool = True) -> dict:
    """Full pipeline with per-group checkpointing. Returns the global
    manifest (metrics included)."""
    from uckg_ray.state import manifest as mf

    cfg = cfg or PipelineConfig()
    t_start = time.perf_counter()
    files = transcript_files(transcripts_dir)
    groups = _groups(files, cfg.files_per_group)
    shards_root = os.path.join(out_dir, "shards")
    os.makedirs(shards_root, exist_ok=True)

    group_stats = []
    skipped = 0
    for gi, gfiles in enumerate(groups):
        gdir = os.path.join(shards_root, f"group-{gi:04d}")
        if resume and mf.group_is_complete(gdir, gfiles):
            skipped += 1
            continue
        t0 = time.perf_counter()
        turns = read_transcripts(gfiles)
        edges = extract_edges(turns, fixture_dir, cfg)
        tmp_dir = gdir + ".tmp"
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(gdir, ignore_errors=True)
        edges.write_parquet(tmp_dir)
        os.replace(tmp_dir, gdir)
        rows_in = sum(pa.parquet.read_metadata(f).num_rows for f in gfiles)
        edges_out = sum(
            pa.parquet.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(gdir, "*.parquet")))
        group_stats.append(mf.write_group_manifest(
            gdir, gfiles, rows_in=rows_in, edges_out=edges_out,
            wall_sec=time.perf_counter() - t0))

    # phase B — finalize from shard outputs (narrow rows only)
    shard_edges = ray.data.read_parquet(
        sorted(glob.glob(os.path.join(shards_root, "group-*", "*.parquet"))))
    side = side_table_edges(fixture_dir)
    all_edges = union_edge_sources(shard_edges, side)

    rewrite: dict[str, str] = {}
    if canonicalize:
        turns_all = read_transcripts(files)
        rewrite = build_canonical_rewriter(turns_all, fixture_dir, cfg)
        all_edges = all_edges.map_batches(
            lambda b: _apply_rewrite(b, rewrite), batch_format="pyarrow")

    final = distinct_edges(all_edges, sort=True)
    edges_dir = os.path.join(out_dir, "edges")
    nodes_dir = os.path.join(out_dir, "nodes")
    import shutil
    shutil.rmtree(edges_dir, ignore_errors=True)
    shutil.rmtree(nodes_dir, ignore_errors=True)
    final.write_parquet(edges_dir)

    final_read = ray.data.read_parquet(
        sorted(glob.glob(os.path.join(edges_dir, "*.parquet"))))
    nodes = node_table(final_read)
    nodes.write_parquet(nodes_dir)

    n_edges = sum(pa.parquet.read_metadata(f).num_rows
                  for f in glob.glob(os.path.join(edges_dir, "*.parquet")))
    n_nodes = sum(pa.parquet.read_metadata(f).num_rows
                  for f in glob.glob(os.path.join(nodes_dir, "*.parquet")))
    n_turns = sum(pa.parquet.read_metadata(f).num_rows for f in files)
    wall = time.perf_counter() - t_start
    payload = {
        "n_turns": n_turns,
        "n_groups": len(groups),
        "groups_skipped_by_resume": skipped,
        "n_distinct_edges": n_edges,
        "n_nodes": n_nodes,
        "n_canonical_rewrites": len(rewrite),
        "wall_sec": round(wall, 3),
        "turns_per_sec": round(n_turns / wall, 1),
        "groups": group_stats,
    }
    mf.write_global_manifest(out_dir, payload)
    return payload


def kg_for_sf(sf_dir: str, out_dir: str, cfg: PipelineConfig | None = None,
              **kw) -> dict:
    """Convenience: generate fixtures for sf_dir and run the full build."""
    fdir = fx.ensure_fixtures(sf_dir)
    return build_kg(os.path.join(fdir, "transcripts"), fdir, out_dir, cfg, **kw)
