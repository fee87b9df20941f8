"""ANN top-k vs brute-force oracle; LSH bucket determinism."""

import numpy as np
import pandas as pd
import pytest


def _emb_ds(ray, M, ids):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [row.tolist() for row in M]}))


def test_ann_topk_matches_bruteforce(ray_session):
    from uckg_ray.stages.similarity import ann_cosine_topk
    rng = np.random.default_rng(7)
    M = rng.standard_normal((200, 16)).astype(np.float32)
    ids = np.arange(200)
    Q, qids = M[:3].astype(np.float64), ids[:3]
    ds = _emb_ds(ray_session, M, ids)
    got = [(r["query_id"], r["neighbor_id"], r["rank"])
           for r in ann_cosine_topk(ds, Q, qids, k=5).take_all()]
    # oracle
    Md = M.astype(np.float64)
    sims = (Q @ Md.T) / (np.linalg.norm(Q, axis=1)[:, None]
                         * np.linalg.norm(Md, axis=1)[None, :])
    want = []
    for qi, q in enumerate(qids):
        order = sorted((j for j in range(200) if ids[j] != q),
                       key=lambda j: (-sims[qi, j], ids[j]))[:5]
        want += [(int(q), int(ids[j]), r + 1) for r, j in enumerate(order)]
    assert sorted(got) == sorted(want)


def test_neardup_pairs(ray_session):
    from uckg_ray.stages.similarity import embedding_neardup_pairs
    M = np.array([[1, 0], [0.999, 0.03], [0, 1], [-1, 0]], dtype=np.float64)
    ds = _emb_ds(ray_session, M, np.arange(4))
    got = {(r["vec_a"], r["vec_b"])
           for r in embedding_neardup_pairs(ds, tau=0.95).take_all()}
    assert got == {(0, 1)}


def test_lsh_bucket_deterministic(ray_session):
    from uckg_ray.stages.similarity import HyperplaneLSH
    rng = np.random.default_rng(3)
    M = rng.standard_normal((50, 8)).astype(np.float32)
    ds = _emb_ds(ray_session, M, np.arange(50))
    b1 = ds.map_batches(HyperplaneLSH, fn_constructor_args=(8,),
                        batch_format="pyarrow", concurrency=1)
    b2 = ds.map_batches(HyperplaneLSH, fn_constructor_args=(8,),
                        batch_format="pyarrow", concurrency=2)
    g1 = {r["vec_id"]: r["bucket"] for r in b1.take_all()}
    g2 = {r["vec_id"]: r["bucket"] for r in b2.take_all()}
    assert g1 == g2  # seeded planes → same buckets at any parallelism
