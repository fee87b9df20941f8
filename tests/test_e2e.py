"""Golden end-to-end + invariance tests (SURVEY.md §5.2-5.4):

- P/R vs the single-process oracle (target 1.0, gate ≥ 0.95)
- chunking/grouping invariance (same edges at any files_per_group /
  batch_size — order-independence of the distributed plan)
- resume-from-checkpoint equivalence after killing a shard group
- idempotency: duplicated input turns → identical canonical graph
  (unique-URI upsert semantics, graph_updater.py:30-46)
"""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from uckg_ray.config import PipelineConfig
from uckg_ray.pipelines.kg import build_kg, kg_for_sf
from uckg_ray.pipelines.oracle import oracle_triples, precision_recall

SF = "/root/testdata/sf0.001"


def _spo_set(out_dir):
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(os.path.join(out_dir, "edges", "*.parquet")))])
    return set(zip(t.column("subj").to_pylist(), t.column("pred").to_pylist(),
                   t.column("obj").to_pylist()))


def _rows(out_dir):
    t = pa.concat_tables([pq.read_table(f) for f in
                          sorted(glob.glob(os.path.join(out_dir, "edges", "*.parquet")))])
    cols = [t.column(c).to_pylist() for c in t.column_names]
    return sorted(zip(*cols))


@pytest.fixture(scope="module")
def built(ray_session, sf_small_fixtures, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_e2e"))
    manifest = kg_for_sf(SF, out)
    return out, manifest


def test_golden_pr(built, sf_small_fixtures):
    out, _ = built
    got = _spo_set(out)
    want = oracle_triples(os.path.join(sf_small_fixtures, "transcripts"),
                          sf_small_fixtures, canonicalize=True)
    p, r = precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95  # BASELINE.md gate
    assert (p, r) == (1.0, 1.0)     # and we hold exact parity


def test_props_artifact_matches_edge_multivals(built):
    """props/ (A4 multival arrays) must equal a recomputation from the
    final edges/ table: per (subj, pred) over literal edges, distinct
    values sorted and ';;'-joined."""
    out, manifest = built
    pt = pa.concat_tables([pq.read_table(f) for f in
                           sorted(glob.glob(os.path.join(out, "props", "*.parquet")))])
    got = {(s, p): v for s, p, v in zip(pt.column("subj").to_pylist(),
                                        pt.column("pred").to_pylist(),
                                        pt.column("vals").to_pylist())}
    et = pa.concat_tables([pq.read_table(f) for f in
                           sorted(glob.glob(os.path.join(out, "edges", "*.parquet")))])
    want: dict[tuple[str, str], set] = {}
    for s, p, o, lit in zip(et.column("subj").to_pylist(),
                            et.column("pred").to_pylist(),
                            et.column("obj").to_pylist(),
                            et.column("obj_is_literal").to_pylist()):
        if lit:
            want.setdefault((s, p), set()).add(o)
    assert got == {k: ";;".join(sorted(v)) for k, v in want.items()}
    assert manifest["n_props"] == len(got)


def test_output_sorted_and_unique(built):
    out, _ = built
    rows = _rows(out)
    keys = [(s, p, o) for s, p, o, *_ in rows]
    assert keys == sorted(keys)
    assert len(set(keys)) == len(keys)


def test_manifest_metrics(built):
    out, m = built
    assert m["n_distinct_edges"] > 0 and m["n_nodes"] > 0
    assert m["turns_per_sec"] > 0
    assert os.path.exists(os.path.join(out, "MANIFEST.json"))
    for g in glob.glob(os.path.join(out, "shards", "group-*")):
        assert os.path.exists(os.path.join(g, "manifest.json"))


def test_grouping_invariance_and_resume(ray_session, sf_small_fixtures, built,
                                        tmp_path):
    out_ref, _ = built
    out = str(tmp_path / "kg_grouped")
    cfg = PipelineConfig(files_per_group=1, batch_size=512)
    kg_for_sf(SF, out, cfg)
    assert _rows(out) == _rows(out_ref)
    # kill one shard group; resume must rebuild only it and reproduce
    groups = sorted(glob.glob(os.path.join(out, "shards", "group-*")))
    assert len(groups) >= 2
    shutil.rmtree(groups[1])
    m = kg_for_sf(SF, out, cfg)
    assert m["groups_skipped_by_resume"] == len(groups) - 1
    assert _rows(out) == _rows(out_ref)


def test_incremental_append(ray_session, sf_small_fixtures, tmp_path):
    """The reference's daily incremental re-sync (ingestion_dag.py:27-77):
    appending new input files re-extracts only the new shard groups and
    folds their triples into the canonical graph."""
    import pyarrow as pa
    tdir = os.path.join(sf_small_fixtures, "transcripts")
    inc_dir = str(tmp_path / "inc_transcripts")
    os.makedirs(inc_dir)
    base_files = sorted(glob.glob(os.path.join(tdir, "*.parquet")))
    for f in base_files:
        shutil.copy(f, os.path.join(inc_dir, os.path.basename(f)))
    out = str(tmp_path / "kg_inc")
    cfg = PipelineConfig(files_per_group=1)
    m1 = build_kg(inc_dir, sf_small_fixtures, out, cfg)
    # append a new conversation file (sorts after existing part-* names)
    new = pa.Table.from_pydict({
        "conv_id": ["conv-new"] * 2,
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": ["user", "assistant"],
        "text": ["brand new CVE-2030-99999 appears", "ack CVE-2030-99999"],
        "tool": ["", ""],
        "ts": pa.array([1, 2], pa.timestamp("us")),
    })
    pq.write_table(new, os.path.join(inc_dir, "part-zzz-new.parquet"))
    m2 = build_kg(inc_dir, sf_small_fixtures, out, cfg)
    assert m2["groups_skipped_by_resume"] == m1["n_groups"]  # old groups reused
    assert m2["n_groups"] == m1["n_groups"] + 1
    spo = _spo_set(out)
    from uckg_ray import namespaces as ns
    assert (ns.UCO + "CVE-2030-99999", ns.RDF_TYPE, ns.UCO + "CVE") in spo
    assert m2["n_distinct_edges"] > m1["n_distinct_edges"]


def test_stale_groups_pruned(ray_session, sf_small_fixtures, built, tmp_path):
    """Rerunning into the same out_dir with fewer input files / different
    grouping must not union stale shard outputs into the final table."""
    out_ref, _ = built
    tdir = os.path.join(sf_small_fixtures, "transcripts")
    files = sorted(glob.glob(os.path.join(tdir, "*.parquet")))
    sub_dir = str(tmp_path / "subset_transcripts")
    os.makedirs(sub_dir)
    for f in files[:1]:
        shutil.copy(f, os.path.join(sub_dir, os.path.basename(f)))
    out = str(tmp_path / "kg_stale")
    # first run: all files, one group per file
    build_kg(tdir, sf_small_fixtures, out, PipelineConfig(files_per_group=1))
    n_groups_before = len(glob.glob(os.path.join(out, "shards", "group-*")))
    assert n_groups_before > 1
    # second run: single file, default grouping → stale groups must go
    m = build_kg(sub_dir, sf_small_fixtures, out, resume=False)
    assert len(glob.glob(os.path.join(out, "shards", "group-*"))) == 1
    # result must equal a fresh single-file build
    out_fresh = str(tmp_path / "kg_fresh")
    m2 = build_kg(sub_dir, sf_small_fixtures, out_fresh)
    assert _spo_set(out) == _spo_set(out_fresh)


def test_resume_honors_pipeline_flags(ray_session, sf_small_fixtures, tmp_path):
    """A --no-canonicalize run's shards (no alias markers) must NOT be
    reused by a canonicalizing resume."""
    tdir = os.path.join(sf_small_fixtures, "transcripts")
    out = str(tmp_path / "kg_flags")
    build_kg(tdir, sf_small_fixtures, out, canonicalize=False)
    m = build_kg(tdir, sf_small_fixtures, out, canonicalize=True)
    assert m["groups_skipped_by_resume"] == 0      # flags differ → re-extract
    assert m["n_canonical_rewrites"] > 0           # rewrites actually happen


def test_idempotent_under_duplicated_input(ray_session, sf_small_fixtures,
                                           built, tmp_path):
    out_ref, _ = built
    # duplicate every transcript file → same canonical (deduped) graph
    tdir = os.path.join(sf_small_fixtures, "transcripts")
    dup_dir = str(tmp_path / "dup_transcripts")
    os.makedirs(dup_dir)
    for f in glob.glob(os.path.join(tdir, "*.parquet")):
        base = os.path.basename(f)
        shutil.copy(f, os.path.join(dup_dir, base))
        shutil.copy(f, os.path.join(dup_dir, "copy-" + base))
    out = str(tmp_path / "kg_dup")
    build_kg(dup_dir, sf_small_fixtures, out)
    assert _spo_set(out) == _spo_set(out_ref)


def test_build_status(built):
    from uckg_ray.state.manifest import build_status
    out, _ = built
    st = build_status(out)
    assert st["state"] == "complete"
    assert st["groups_complete"] == st["groups_total"] >= 1
    assert st["final"]["n_distinct_edges"] > 0
    # a fresh dir reports never_started
    assert build_status("/tmp/definitely-missing-dir")["state"] == "never_started"


def test_full_rerun_skips_finalize(ray_session, sf_small_fixtures, tmp_path):
    """A rerun with unchanged inputs + dictionaries is a metadata no-op:
    every group reused AND finalize skipped, outputs intact."""
    out = str(tmp_path / "kg")
    fdir = sf_small_fixtures
    tdir = os.path.join(fdir, "transcripts")
    m1 = build_kg(tdir, fdir, out)
    assert "finalize_skipped" not in m1
    before = _rows(out)
    m2 = build_kg(tdir, fdir, out)
    assert m2.get("finalize_skipped") is True
    assert m2["groups_skipped_by_resume"] == m2["n_groups"]
    assert m2["n_distinct_edges"] == m1["n_distinct_edges"]
    assert _rows(out) == before
    # resume=False must force a full rebuild
    m3 = build_kg(tdir, fdir, out, resume=False)
    assert "finalize_skipped" not in m3
    assert _rows(out) == before


def test_build_kg_incremental_driver(ray_session, sf_small_fixtures, tmp_path):
    """The single detect→rebuild-affected→merge driver (the reference's
    scheduled re-sync, ingestion_dag.py:27-77): mutating 1 of N shard
    files re-extracts ONLY that file-keyed group (unchanged groups keep
    their original manifests byte-untouched), the merged edge table is
    identical to a from-scratch build, and the snapshot_diff audit
    reports the graph-level delta."""
    import json

    from uckg_ray.pipelines.kg import build_kg_incremental
    from uckg_ray.state.manifest import manifest_path

    tdir = os.path.join(sf_small_fixtures, "transcripts")
    inc_dir = str(tmp_path / "transcripts")
    os.makedirs(inc_dir)
    for f in sorted(glob.glob(os.path.join(tdir, "*.parquet"))):
        shutil.copy(f, os.path.join(inc_dir, os.path.basename(f)))
    files = sorted(glob.glob(os.path.join(inc_dir, "*.parquet")))
    assert len(files) >= 2
    out = str(tmp_path / "kg_incr")

    m1 = build_kg_incremental(inc_dir, sf_small_fixtures, out)
    assert sorted(m1["incremental"]["added"]) == sorted(
        "file-" + os.path.splitext(os.path.basename(f))[0] for f in files)
    assert m1["incremental"]["changed"] == []

    # a no-change rerun is a metadata no-op: nothing rebuilt, finalize
    # fingerprint short-circuits
    m_noop = build_kg_incremental(inc_dir, sf_small_fixtures, out)
    inc = m_noop["incremental"]
    assert inc["added"] == inc["changed"] == inc["removed"] == []
    assert m_noop.get("finalize_skipped") is True

    # mutate ONE file: append a turn carrying a brand-new CVE mention
    victim = files[0]
    vname = "file-" + os.path.splitext(os.path.basename(victim))[0]
    t = pq.read_table(victim)
    extra = pa.Table.from_pydict({
        "conv_id": ["conv-mut"], "turn_idx": pa.array([0], pa.int32()),
        "role": ["user"], "text": ["observe CVE-2031-11111 in the wild"],
        "tool": [""],
        "ts": pa.array([pa.scalar(1, pa.timestamp("us")).as_py()],
                       pa.timestamp("us"))},
        schema=t.schema)
    pq.write_table(pa.concat_tables([t, extra]), victim)
    untouched = {
        g: (os.stat(manifest_path(os.path.join(out, "shards", g))).st_mtime_ns,
            json.load(open(manifest_path(os.path.join(out, "shards", g)))))
        for g in m1["incremental"]["added"] if g != vname}

    m2 = build_kg_incremental(inc_dir, sf_small_fixtures, out)
    inc2 = m2["incremental"]
    assert inc2["changed"] == [vname] and inc2["added"] == []
    assert sorted(inc2["unchanged"]) == sorted(untouched)
    assert m2["groups_skipped_by_resume"] == len(files) - 1
    # manifest wall-times of unchanged groups prove no re-extraction
    for g, (mt, man) in untouched.items():
        p = manifest_path(os.path.join(out, "shards", g))
        assert os.stat(p).st_mtime_ns == mt
        assert json.load(open(p)) == man
    # the audit saw the new conversation's edges arrive, none removed
    assert inc2["edge_diff"][vname]["edges_added"] > 0
    assert inc2["edge_diff"][vname]["edges_removed"] == 0
    from uckg_ray import namespaces as ns
    assert (ns.UCO + "CVE-2031-11111", ns.RDF_TYPE, ns.UCO + "CVE") \
        in _spo_set(out)

    # merged output == from-scratch build of the mutated inputs, bytes
    scratch = str(tmp_path / "kg_scratch")
    build_kg(inc_dir, sf_small_fixtures, scratch)
    assert _rows(out) == _rows(scratch)

    # removing a file prunes its group and its triples
    os.remove(victim)
    m3 = build_kg_incremental(inc_dir, sf_small_fixtures, out)
    assert m3["incremental"]["removed"] == [vname]
    assert (ns.UCO + "CVE-2031-11111", ns.RDF_TYPE, ns.UCO + "CVE") \
        not in _spo_set(out)
