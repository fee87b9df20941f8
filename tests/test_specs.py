"""Declarative ExtractorSpec surface + LSH-bucketed ANN recall."""

import numpy as np
import pandas as pd
import pyarrow as pa

from uckg_ray.schema import TRANSCRIPT_SCHEMA


def _turns_ds(ray):
    import ray.data
    tbl = pa.Table.from_pydict({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": ["user", "tool", "assistant"],
        "text": ["hello", "scan out", "reply"],
        "tool": ["", "nmap", ""],
        "ts": pa.array([0, 1, 2], pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    return ray.data.from_arrow(tbl)


def test_custom_spec_emission(ray_session):
    from uckg_ray.specs import ExtractorSpec, apply_specs
    specs = [
        ExtractorSpec(name="role",
                      subject_template="ex:TURN-{conv_id}-{turn_idx}",
                      predicate="ex:hasRole", object_column="role"),
        ExtractorSpec(name="tool",
                      subject_template="ex:TURN-{conv_id}-{turn_idx}",
                      predicate="ex:usedTool", object_column="tool",
                      where_col="role", where_val="tool"),
        ExtractorSpec(name="const",
                      subject_template="ex:CONV-{conv_id}",
                      predicate="ex:kind", object_constant="transcript"),
    ]
    rows = apply_specs(_turns_ds(ray_session), specs).take_all()
    spo = {(r["subj"], r["pred"], r["obj"]) for r in rows}
    assert ("ex:TURN-c1-0", "ex:hasRole", "user") in spo
    assert ("ex:TURN-c1-1", "ex:usedTool", "nmap") in spo
    assert ("ex:CONV-c2", "ex:kind", "transcript") in spo
    # where-gate: only the tool turn emits usedTool
    assert sum(1 for _, p, _ in spo if p == "ex:usedTool") == 1


def test_lsh_bucketed_ann_recall(ray_session):
    """In-bucket rescoring must return the true nearest neighbor for most
    queries (hyperplane LSH keeps near vectors in the same bucket with
    high probability at 4 planes)."""
    import ray.data
    from uckg_ray.stages.similarity import HyperplaneLSH, ann_cosine_topk
    rng = np.random.default_rng(11)
    M = rng.standard_normal((300, 16))
    # plant exact near-duplicates of the first 5 vectors
    for i in range(5):
        M[100 + i] = M[i] + rng.standard_normal(16) * 0.01
    ids = np.arange(300)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [r.tolist() for r in M]}))
    Q, qids = M[:5], ids[:5]
    lsh = HyperplaneLSH(16, n_planes=4)
    bucketed = ds.map_batches(HyperplaneLSH, fn_constructor_args=(16, 4),
                              batch_format="pyarrow", concurrency=1)
    qsig = (Q @ lsh.planes.T) > 0
    qb = set()
    for row in qsig:
        s = 0
        for k, bit in enumerate(row):
            s |= int(bit) << k
        qb.add(s)
    bucket_set = pa.array(sorted(qb), pa.int64())
    cand = bucketed.map_batches(
        lambda b: b.filter(pa.compute.is_in(b.column("bucket"),
                                            value_set=bucket_set)),
        batch_format="pyarrow").drop_columns(["bucket"])
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ann_cosine_topk(cand, Q, qids, k=3).take_all()}
    hits = sum(1 for i in range(5) if got.get((i, 1)) == 100 + i)
    assert hits >= 4  # near-dup lands in the same bucket for ≥4/5 queries


def test_ivf_topk_recall(ray_session):
    """IVF probe (4 of 16 centroids) must recover the planted nearest
    neighbors — the query's own cluster is always probed first."""
    import ray.data
    from uckg_ray.stages.similarity import IVFIndex, ivf_topk
    rng = np.random.default_rng(21)
    M = rng.standard_normal((400, 16))
    for i in range(5):
        M[200 + i] = M[i] + rng.standard_normal(16) * 0.01
    ids = np.arange(400)
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [r.tolist() for r in M]}))
    ivf = IVFIndex(M, n_centroids=8)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ivf_topk(ds, M[:5], ids[:5], ivf, k=3,
                             n_probe=3).take_all()}
    hits = sum(1 for i in range(5) if got.get((i, 1)) == 200 + i)
    assert hits == 5  # near-dup shares the query's own centroid
