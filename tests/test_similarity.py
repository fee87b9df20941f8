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


def test_embed_lsh_join_path_identical_and_driverless(ray_session):
    """Forcing the pair ⨝ vectors shuffle-join verification
    (broadcast_max_candidates=0) must produce the exact same pair set as
    the broadcast path, with NO driver-side pull during the build."""
    import ray.data
    from uckg_ray.stages.similarity import embedding_neardup_lsh_pairs
    rng = np.random.default_rng(11)
    M = rng.standard_normal((60, 8))
    M[1] = M[0] + 0.01 * rng.standard_normal(8)   # a true near-dup pair
    M[7] = M[6] + 0.02 * rng.standard_normal(8)
    ds = _emb_ds(ray_session, M, np.arange(60))
    want = {(r["vec_a"], r["vec_b"])
            for r in embedding_neardup_lsh_pairs(ds, tau=0.95).take_all()}
    assert want

    def forbidden(*a, **kw):
        raise AssertionError("driver-side corpus pull")

    patched = ("iter_batches", "take_all", "iter_rows", "to_pandas", "take")
    saved = {m: getattr(ray.data.Dataset, m) for m in patched}
    for m in patched:
        setattr(ray.data.Dataset, m, forbidden)
    try:
        out = embedding_neardup_lsh_pairs(ds, tau=0.95,
                                          broadcast_max_candidates=0)
    finally:
        for m, fn in saved.items():
            setattr(ray.data.Dataset, m, fn)
    got = {(r["vec_a"], r["vec_b"]) for r in out.take_all()}
    assert got == want


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


def test_integer_ivf_exact_and_bounded(ray_session):
    """IntegerIVF: integer-exact quantize/assign/update (the SQL-
    replayable k-means), recall sanity vs brute force, sample bound."""
    import numpy as np
    import pytest
    import ray.data

    from uckg_ray.stages.similarity import IntegerIVF, ivf_topk

    rng = np.random.default_rng(3)
    M = rng.standard_normal((300, 16)).astype(np.float32).astype(np.float64)
    ids = np.arange(300, dtype=np.int64)
    ivf = IntegerIVF(M, ids, n_centroids=8, n_iters=8)
    # centroids are exact integers from floor-division means
    assert ivf.centroids.dtype == np.int64
    # deterministic: retrain -> identical
    again = IntegerIVF(M, ids, n_centroids=8, n_iters=8)
    assert np.array_equal(ivf.centroids, again.centroids)
    # every vector assigns to its true nearest centroid (ties -> lowest)
    Q = IntegerIVF.quantize(M)
    d2 = ((Q[:, None, :] - ivf.centroids[None, :, :]) ** 2).sum(axis=2)
    assert np.array_equal(ivf._nearest(Q), d2.argmin(axis=1))
    # recall of the probed exact rescore vs full brute force
    import pandas as pd
    ds = ray.data.from_pandas(pd.DataFrame({
        "vec_id": ids, "embedding": [list(map(float, r)) for r in M]}))
    got = {(r["query_id"], r["neighbor_id"])
           for r in ivf_topk(ds, M[:5], ids[:5], ivf, k=3,
                             n_probe=4).take_all()}
    sims = (M[:5] / np.linalg.norm(M[:5], axis=1, keepdims=True)) @ \
        (M / np.linalg.norm(M, axis=1, keepdims=True)).T
    hits = 0
    for qi in range(5):
        order = [i for i in np.argsort(-sims[qi]) if i != qi][:3]
        hits += sum((ids[qi], n) in got for n in order)
    assert hits >= 10  # >= 2/3 recall with 4 of 8 buckets probed
    with pytest.raises(ValueError):
        IntegerIVF(np.zeros((65537, 4)), np.arange(65537), n_centroids=4)


def test_semantic_dedup_marks_in_cluster_neardups(ray_session):
    """SemDeDup: a near-identical pair landing in the same IVF cluster
    marks the LARGER id duplicate; orthogonal vectors stay kept; the
    integer threshold predicate matches a float oracle away from the
    boundary; cluster-size guard aborts loudly."""
    import pytest

    from uckg_ray.stages.similarity import IntegerIVF, semantic_dedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    # plant two exact-duplicate pairs (ids 40/41 dup 0/1) and one
    # near-miss (id 42 ~ vector 2 but rotated well below tau)
    M = np.vstack([base, base[0], base[1],
                   np.roll(base[2], 1)]).astype(np.float32)
    ids = np.arange(len(M), dtype=np.int64)
    ivf = IntegerIVF(M.astype(np.float64), ids, n_centroids=4, n_iters=4)
    ds = _emb_ds(ray_session, M, ids)
    out = {r["vec_id"]: (r["cid"], r["is_dup"])
           for r in semantic_dedup(ds, ivf, tau_num=95,
                                   tau_den=100).take_all()}
    assert len(out) == len(M)
    assert out[40][1] == 1 and out[41][1] == 1     # exact dups flagged
    assert out[0][1] == 0 and out[1][1] == 0       # originals kept
    assert out[0][0] == out[40][0]                  # same cluster
    # float oracle: is_dup == exists same-cluster smaller-id cos >= tau
    Q = IntegerIVF.quantize(M.astype(np.float64))
    G = Q @ Q.T
    n = np.sqrt(np.diag(G).astype(np.float64))
    cos = G / (n[:, None] * n[None, :])
    cid = np.array([out[i][0] for i in ids])
    for j in ids:
        want = int(any(cid[i] == cid[j] and cos[i, j] >= 0.95
                       for i in range(j)))
        assert out[j][1] == want, j
    with pytest.raises(ray_session.exceptions.RayTaskError):
        semantic_dedup(ds, ivf, max_cluster_rows=2).take_all()


def test_semantic_dedup_row_blocking_identity(ray_session, monkeypatch):
    """Shrinking PAIR_BLOCK_ELEMS so every cluster spans many row
    blocks must not change a single is_dup bit — the blocked Gram pass
    is a pure memory-shape change."""
    from uckg_ray.stages import similarity as sim

    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 6)).astype(np.float32)
    M = np.vstack([base, base[:5]]).astype(np.float32)  # 5 exact dups
    ids = np.arange(len(M), dtype=np.int64)
    ivf = sim.IntegerIVF(M.astype(np.float64), ids, n_centroids=2,
                         n_iters=3)
    ds = _emb_ds(ray_session, M, ids)
    one_block = sorted(
        (r["vec_id"], r["cid"], r["is_dup"])
        for r in sim.semantic_dedup(ds, ivf, tau_num=95,
                                    tau_den=100).take_all())
    monkeypatch.setattr(sim, "PAIR_BLOCK_ELEMS", 64)  # ~2-row blocks
    many_blocks = sorted(
        (r["vec_id"], r["cid"], r["is_dup"])
        for r in sim.semantic_dedup(ds, ivf, tau_num=95,
                                    tau_den=100).take_all())
    assert one_block == many_blocks
    assert sum(d for _, _, d in one_block) >= 5


def test_quantize_int8(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.similarity import quantize_int8

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[0.5, -0.25, 0.1], [0.0, 0.0, 0.0]],
                              pa.list_(pa.float32()))}))
    got = {(r["vec_id"], r["dim"]): r["code"]
           for r in quantize_int8(ds).take_all()}
    # vec 1: q = (500000, -250000, 100000), max|q| = 500000 →
    # codes 127, -(250000*127//500000) = -63, 100000*127//500000 = 25
    assert got == {(1, 1): 127, (1, 2): -63, (1, 3): 25,
                   (2, 1): 0, (2, 2): 0, (2, 3): 0}


def test_semantic_contamination_eval_train(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.similarity import semantic_contamination

    # ids 10, 20 are the eval split (%10==0). Eval 10 duplicates train
    # ids 3 and 7 (cos=1); eval 20 is orthogonal to every train vector.
    vecs = {
        3: [1.0, 0.0, 0.0, 0.0],
        7: [1.0, 0.0, 0.0, 0.0],
        4: [0.0, 1.0, 0.0, 0.0],
        10: [2.0, 0.0, 0.0, 0.0],
        20: [0.0, 0.0, 0.0, 5.0],
    }
    t = pa.table({
        "vec_id": pa.array(list(vecs), pa.int64()),
        "embedding": pa.array(list(vecs.values()),
                              pa.list_(pa.float32())),
    })
    got = {r["vec_id"]: r for r in semantic_contamination(
        ray.data.from_arrow(t).repartition(2), tau=0.9).take_all()}
    assert list(got) == [10]
    assert got[10]["n_matches"] == 2 and got[10]["first_match"] == 3
