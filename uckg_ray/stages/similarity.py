"""Similarity search over embedding columns.

- ``ann_cosine_topk`` — brute-force cosine top-k: the query matrix is
  broadcast once (tiny), each batch does one float64 matmul, per-batch
  partial top-k rows flow into a small per-query global merge. Verified
  bit-identical to DuckDB's list_cosine_similarity ranking.
- ``embedding_neardup_pairs`` — all-pairs cosine ≥ τ (near-duplicate
  detection by embedding); batches × broadcast matrix, emits only
  passing pairs.
- ``lsh_bucket_topk`` — the scale path: random-hyperplane LSH buckets
  shrink the candidate set before exact rescoring.

All math in float64 (matching DuckDB DOUBLE) on vectors upcast from
float32 storage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def ann_cosine_topk(emb: Dataset, queries: np.ndarray, query_ids: np.ndarray,
                    *, k: int = 10, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> Dataset:
    """(query_id, neighbor_id, rank 1..k) by cosine desc, ties → min id;
    self-matches excluded."""
    Q = queries.astype(np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qids = np.asarray(query_ids)

    def partial(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch, vec_col)
        ids = np.asarray(batch.column(id_col).to_pylist())
        sims = (Q @ M.T) / (qn[:, None] * np.linalg.norm(M, axis=1)[None, :])
        QI, NI, S = [], [], []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi]
            cand_idx = np.nonzero(mask)[0]
            if len(cand_idx) == 0:
                continue
            take = min(k, len(cand_idx))
            # lexsort keeps the documented tie-break (sim desc, min id) at
            # the partial-top-k boundary — argpartition would keep an
            # arbitrary one of exactly-tied candidates
            order = np.lexsort((ids[cand_idx], -s[cand_idx]))[:take]
            top = cand_idx[order]
            for j in top:
                QI.append(int(qids[qi])); NI.append(int(ids[j])); S.append(float(s[j]))
        return pa.Table.from_pydict({
            "query_id": pa.array(QI, pa.int64()),
            "neighbor_id": pa.array(NI, pa.int64()),
            "sim": pa.array(S, pa.float64())})

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"],
                              ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["query_id", "neighbor_id", "rank"]]

    return (emb.map_batches(partial, batch_format="pyarrow")
            .groupby("query_id").map_groups(merge, batch_format="pandas"))


def _gather_embeddings(emb: Dataset, id_col: str, vec_col: str
                       ) -> tuple[np.ndarray, np.ndarray]:
    """(ids, matrix) assembled from Arrow batches (flat buffer reshape,
    no Python row objects). This is the broadcast-side build — O(corpus)
    in one place by definition; shard it when the table outgrows a node."""
    ids_c, m_c = [], []
    for b in emb.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=None):
        ids_c.append(b.column(id_col).to_numpy(zero_copy_only=False))
        m_c.append(_emb_matrix(b, vec_col))
    if not ids_c:
        return np.array([], dtype=np.int64), np.zeros((0, 1))
    return (np.concatenate(ids_c).astype(np.int64), np.vstack(m_c))


def embedding_neardup_pairs(emb: Dataset, *, tau: float = 0.45,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            max_rows: int = 100_000) -> Dataset:
    """All-pairs cosine ≥ tau with doc_a < doc_b. One side is broadcast —
    an O(corpus) driver gather by construction, so this is the EXACT
    small-side variant only (test oracles, dictionary-scale tables) and
    it enforces that contract with an explicit ``max_rows`` bound.
    ``embedding_neardup_lsh_pairs`` is the 100 TB path and is what the
    shipped ``embed_neardup`` query runs (identical output at full
    recall: every candidate is verified with exact cosine)."""
    ids_all, M_all = _gather_embeddings(emb, id_col, vec_col)
    if len(ids_all) > max_rows:
        raise ValueError(
            f"embedding_neardup_pairs is the exact broadcast variant, "
            f"capped at {max_rows} rows (got {len(ids_all)}); use "
            "embedding_neardup_lsh_pairs for corpus-scale near-dup")
    n_all = np.linalg.norm(M_all, axis=1)

    def pairs(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch, vec_col)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        sims = (M @ M_all.T) / (np.linalg.norm(M, axis=1)[:, None] * n_all[None, :])
        A, B = [], []
        for i in range(len(ids)):
            hit = np.nonzero((sims[i] >= tau) & (ids_all > ids[i]))[0]
            for j in hit:
                A.append(int(ids[i])); B.append(int(ids_all[j]))
        return pa.Table.from_pydict({
            "vec_a": pa.array(A, pa.int64()), "vec_b": pa.array(B, pa.int64())})

    return emb.map_batches(pairs, batch_format="pyarrow")


def embedding_neardup_lsh_pairs(emb: Dataset, *, tau: float = 0.45,
                                n_bands: int = 24, band_planes: int = 5,
                                seed: int = 42, id_col: str = "vec_id",
                                vec_col: str = "embedding",
                                broadcast_max_candidates: int = 20_000_000
                                ) -> Dataset:
    """Near-dup pairs via banded hyperplane LSH — the 100 TB path for
    ``embedding_neardup_pairs``. Each of ``n_bands`` independent
    ``band_planes``-bit signatures buckets the vectors; pairs that share
    any band bucket are verified with exact cosine INSIDE the partition
    task against a broadcast unit-normalized matrix (ray.put once).
    Recall for cosine ≥ tau pairs is 1-(1-p^b)^n with p = 1-θ/π the
    per-plane agreement probability: defaults (24×5) measure full recall
    at tau=0.45 on the sf0.01 fixture; tighter taus (real near-dup,
    ≥0.8) allow more planes / fewer bands. Raise band_planes ~log2(N)
    to keep buckets bounded as the corpus grows.

    Fully distributed (the minhash skeleton): banding and candidate
    distinct stay inside tasks. Verification state (unit vectors)
    delivery switches on the candidate pair count: at or below
    ``broadcast_max_candidates`` only the CANDIDATE docs' unit vectors
    (bounded by candidate volume, not corpus size) are gathered via a
    task-side id filter and broadcast with ray.put; above it the unit
    vectors co-partition with the pair stream on each side
    (``_copartition_attach`` ×2 — the pair ⨝ vectors shuffle join), so
    nothing candidate-sized ever lands on the driver."""
    import ray
    import ray.data

    from uckg_ray.stages.dedup import _EMPTY_PAIRS, _bucketed_pairs

    planes_by_dim: dict[int, np.ndarray] = {}

    def get_planes(dim: int) -> np.ndarray:
        if dim not in planes_by_dim:
            planes_by_dim[dim] = np.random.default_rng(seed).standard_normal(
                (n_bands, band_planes, dim))
        return planes_by_dim[dim]

    def band_rows(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch, vec_col)
        planes = get_planes(M.shape[1])
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        D, BI, BV = [], [], []
        for bnd in range(n_bands):
            bits = (M @ planes[bnd].T) > 0
            sig = np.zeros(len(M), dtype=np.int64)
            for k in range(band_planes):
                sig |= bits[:, k].astype(np.int64) << k
            D.append(ids); BI.append(np.full(len(M), bnd, np.int32)); BV.append(sig)
        return pa.Table.from_pydict({
            "doc_id": pa.array(np.concatenate(D), pa.int64()),
            "band": pa.array(np.concatenate(BI), pa.int32()),
            "band_val": pa.array(np.concatenate(BV), pa.int64())})

    banded = emb.map_batches(band_rows, batch_format="pyarrow")
    # no pre-verify distinct: the exact-cosine verify culls the candidate
    # flood by orders of magnitude, so the global pair dedup runs on the
    # verified survivors instead (distinct_pairs below)
    cand = _bucketed_pairs(banded, ["band", "band_val"],
                           distinct=False).materialize()
    empty = _EMPTY_PAIRS.rename_columns(["vec_a", "vec_b"])
    n_cand = cand.count()
    if n_cand == 0:
        return ray.data.from_arrow(empty)

    if n_cand > broadcast_max_candidates:
        return _embed_verify_join(emb, cand, tau=tau, id_col=id_col,
                                  vec_col=vec_col)

    # candidate-doc id set: per-block raw tasks return block-distinct
    # ids; the driver sees O(candidate docs) per block, never the pair
    # stream
    from uckg_ray.stages.dedup import pair_doc_ids
    need = pair_doc_ids(cand)
    need_ref = ray.put(need)

    def cand_vectors(batch: pa.Table) -> pa.Table:
        # task-side filter to candidate docs; unit-normalized vectors out
        need_arr = ray.get(need_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, need_arr)
        M = _emb_matrix(batch, vec_col)[keep]
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "v": pa.array(list(Mn), pa.list_(pa.float64()))})

    small = emb.map_batches(cand_vectors, batch_format="pyarrow")
    id_chunks, v_chunks = [], []
    for b in small.iter_batches(batch_format="pyarrow", batch_size=None):
        id_chunks.append(b.column("doc_id").to_numpy(zero_copy_only=False))
        v_chunks.append(_emb_matrix(b, "v"))
    if not id_chunks:
        return ray.data.from_arrow(empty)
    c_ids = np.concatenate(id_chunks)
    c_mat = np.vstack(v_chunks)
    order = np.argsort(c_ids)
    ids_ref = ray.put(c_ids[order])
    mat_ref = ray.put(np.ascontiguousarray(c_mat[order]))

    def verify_pairs(batch: pa.Table) -> pa.Table:
        ids_s = ray.get(ids_ref)
        Mb = ray.get(mat_ref)
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        va = Mb[np.searchsorted(ids_s, a)]
        vb = Mb[np.searchsorted(ids_s, b)]
        keep = np.einsum("ij,ij->i", va, vb) >= tau
        return pa.Table.from_pydict({
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64())})

    from uckg_ray.stages.dedup import distinct_pairs
    verified = cand.map_batches(verify_pairs, batch_format="pyarrow")
    # set-semantics output; row order is not part of the contract — no
    # cosmetic global sort
    return (distinct_pairs(verified.rename_columns(["doc_a", "doc_b"]))
            .map_batches(lambda b: b.rename_columns(["vec_a", "vec_b"]),
                         batch_format="pyarrow"))


def _embed_verify_join(emb: Dataset, cand: Dataset, *, tau: float,
                       id_col: str, vec_col: str,
                       num_partitions: int = 32) -> Dataset:
    """Shuffle-join verification for candidate volumes too large to
    broadcast: the unit-vector table co-partitions with the pair stream
    on doc_a then doc_b (``_copartition_attach`` ×2) and the exact
    cosine reads the two attached list columns — no driver state.
    Output identical to the broadcast path (same normalization, same
    float64 dot, same post-verify distinct)."""
    from uckg_ray.stages.dedup import _copartition_attach, distinct_pairs

    def unit_rows(batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch, vec_col)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        return pa.table({
            "doc_id": batch.column(id_col).cast(pa.int64()),
            "val": pa.array(list(Mn), pa.list_(pa.float64()))})

    # materialize: referenced by both attach exchanges — an
    # unmaterialized plan would normalize the full corpus twice
    state = emb.map_batches(unit_rows,
                            batch_format="pyarrow").materialize()
    lt = pa.list_(pa.float64())
    schema1 = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    a1 = _copartition_attach(cand, state, "doc_a", "v_a", lt, schema1,
                             num_partitions)
    schema2 = schema1.append(pa.field("v_a", lt))
    a2 = _copartition_attach(a1, state, "doc_b", "v_b", lt, schema2,
                             num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict({
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64())})
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        va = _emb_matrix(batch, "v_a")
        vb = _emb_matrix(batch, "v_b")
        keep = np.einsum("ij,ij->i", va, vb) >= tau
        return pa.Table.from_pydict({
            "doc_a": pa.array(a[keep], pa.int64()),
            "doc_b": pa.array(b[keep], pa.int64())})

    return (distinct_pairs(a2.map_batches(verify, batch_format="pyarrow"))
            .map_batches(lambda t: t.rename_columns(["vec_a", "vec_b"]),
                         batch_format="pyarrow"))


class IVFIndex:
    """IVF coarse quantizer: deterministic seeded k-means (fixed
    iteration count, no RNG in the loop) over a sample, then bucket =
    nearest centroid. Query path: probe the ``n_probe`` nearest
    centroids and rescore exactly in-bucket — the classic
    inverted-file ANN layout, expressed as a bucket column + filtered
    exact top-k."""

    def __init__(self, train: np.ndarray, n_centroids: int = 16,
                 n_iters: int = 10, seed: int = 42):
        X = train.astype(np.float64)
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)
        C = X[idx].copy()
        for _ in range(n_iters):
            assign = np.argmax(X @ C.T, axis=1)  # cosine on unit vectors
            for k in range(len(C)):
                m = assign == k
                if m.any():
                    v = X[m].mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        C[k] = v / n
        self.centroids = C

    def assign_batch(self, batch: pa.Table,
                     vec_col: str = "embedding") -> pa.Table:
        M = _emb_matrix(batch, vec_col)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        bucket = np.argmax(Mn @ self.centroids.T, axis=1).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def probe_buckets(self, queries: np.ndarray, n_probe: int = 4) -> set[int]:
        Q = queries.astype(np.float64)
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        sims = Qn @ self.centroids.T
        out: set[int] = set()
        for row in sims:
            out.update(int(i) for i in np.argsort(-row)[:n_probe])
        return out


class IntegerIVF:
    """IVF coarse quantizer with EXACT integer arithmetic end-to-end,
    so the whole index — Lloyd iterations included — is bit-for-bit
    reproducible in SQL (the only value-hash-checkable k-means):

    - vectors quantize to int64 (``floor(x · 10⁶ + 0.5)``; float32
      inputs widen to double identically in numpy and DuckDB);
    - distances are integer squared-L2 (max ≈ 4·10¹³ ≪ 2⁶³), ties break
      to the lowest centroid id — ``np.argmin`` ≡ ``row_number() OVER
      (ORDER BY d2, cid)``;
    - centroid updates are exact floor-division means (sign-safe mod in
      SQL mirrors ``np.floor_divide``); empty clusters keep their old
      centroid;
    - init = the k training vectors with the smallest vec_ids.

    Training state is the bounded sample side (stride-sampled, asserted
    ≤ 65536 rows); assignment and probing run vectorized per batch."""

    SCALE = 1_000_000.0

    @staticmethod
    def quantize(M: np.ndarray) -> np.ndarray:
        return np.floor(M.astype(np.float64) * IntegerIVF.SCALE + 0.5) \
            .astype(np.int64)

    def __init__(self, train: np.ndarray, train_ids: np.ndarray,
                 n_centroids: int = 16, n_iters: int = 8):
        if len(train) > 65536:
            raise ValueError("IntegerIVF training sample too large — "
                             "raise the sampling stride")
        order = np.argsort(train_ids, kind="stable")
        Q = self.quantize(train[order])
        C = Q[:n_centroids].copy()
        for _ in range(n_iters):
            d2 = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)          # first min = lowest cid
            for c in range(len(C)):
                sel = Q[assign == c]
                if len(sel):
                    C[c] = np.floor_divide(sel.sum(axis=0), len(sel))
        self.centroids = C

    def _nearest(self, Qi: np.ndarray) -> np.ndarray:
        d2 = ((Qi[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1).astype(np.int64)

    def assign_batch(self, batch: pa.Table,
                     vec_col: str = "embedding") -> pa.Table:
        M = _emb_matrix(batch, vec_col)
        bucket = self._nearest(self.quantize(M))
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))

    def probe_buckets(self, queries: np.ndarray, n_probe: int = 4) -> set[int]:
        Qi = self.quantize(queries)
        d2 = ((Qi[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        out: set[int] = set()
        for row in d2:
            # stable sort ⇒ ties to the lowest cid, like ORDER BY d2, cid
            out.update(int(i) for i in np.argsort(row, kind="stable")[:n_probe])
        return out


def ivf_topk(emb: Dataset, queries: np.ndarray, query_ids: np.ndarray,
             ivf: IVFIndex, *, k: int = 10, n_probe: int = 4) -> Dataset:
    """IVF ANN: restrict the exact rescoring to the probed buckets."""
    buckets = pa.array(sorted(ivf.probe_buckets(queries, n_probe)), pa.int64())
    bucketed = emb.map_batches(ivf.assign_batch, batch_format="pyarrow")
    cand = bucketed.map_batches(
        lambda b: b.filter(pa.compute.is_in(b.column("bucket"),
                                            value_set=buckets)),
        batch_format="pyarrow").drop_columns(["bucket"])
    return ann_cosine_topk(cand, queries, query_ids, k=k)


class HyperplaneLSH:
    """Random-hyperplane signatures for bucketed ANN (the 100 TB path:
    bucket groupby → in-bucket exact rescore). Deterministic seed."""

    def __init__(self, dim: int, n_planes: int = 16, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = _emb_matrix(batch, "embedding")
        bits = (M @ self.planes.T) > 0
        sig = np.zeros(len(M), dtype=np.int64)
        for k in range(self.planes.shape[0]):
            sig |= bits[:, k].astype(np.int64) << k
        return batch.append_column("bucket", pa.array(sig, pa.int64()))


def embedding_centroids(emb: Dataset, *, group_col: str = "label",
                        vec_col: str = "embedding") -> Dataset:
    """Per-group embedding centroid components in EXACT integer
    arithmetic — the vector aggregate a clustering / data-mixing
    pipeline runs to characterize sources. Vectors quantize to int64
    (``floor(x·10⁶ + 0.5)`` on the float32→double widening, the
    IntegerIVF contract), so per-(group, dim) sums are exact integers
    and the SQL oracle matches value-hashes bit-for-bit; the consumer
    divides sum_q/n for the centroid at whatever precision it wants.

    Scale shape: one block-local partial (labels × dims rows per
    block, independent of row count) feeding a small (group, dim)
    groupby — the classic pre-aggregated vector mean, no wide data
    ever shuffles."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # sparse upstream filter can emit empties
            return pa.table({"label": pa.array([], pa.int32()),
                             "dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64())})
        M = _emb_matrix(batch, vec_col)                  # float64 widened
        Q = np.floor(M * 1_000_000.0 + 0.5).astype(np.int64)
        lbl = batch.column(group_col).to_numpy(zero_copy_only=False)
        labels = np.unique(lbl)
        L, DIM, N, S = [], [], [], []
        dims = Q.shape[1]
        for lv in labels:
            rows = Q[lbl == lv]
            L.append(np.full(dims, lv))
            DIM.append(np.arange(1, dims + 1, dtype=np.int64))
            N.append(np.full(dims, len(rows), np.int64))
            S.append(rows.sum(axis=0))
        return pa.Table.from_pydict({
            "label": pa.array(np.concatenate(L), pa.int32()),
            "dim": pa.array(np.concatenate(DIM), pa.int64()),
            "n": pa.array(np.concatenate(N), pa.int64()),
            "sum_q": pa.array(np.concatenate(S), pa.int64())})

    def pin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "label" not in b.schema.names:
            return pa.table({"label": pa.array([], pa.int32()),
                             "dim": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sum_q": pa.array([], pa.int64())})
        return pa.table({"label": b.column("label").cast(pa.int32()),
                         "dim": b.column("dim").cast(pa.int64()),
                         "n": b.column("n").cast(pa.int64()),
                         "sum_q": b.column("sum_q").cast(pa.int64())})

    return (emb.map_batches(partial, batch_format="pyarrow",
                            batch_size=None)
            .groupby(["label", "dim"])
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_q", alias_name="sum_q"))
            .map_batches(pin, batch_format="pyarrow", batch_size=None))


# Gram-entry budget per pairwise row-block in semantic_dedup: the two
# transient block matrices are PAIR_BLOCK_ELEMS×8 bytes each (~33 MB),
# independent of cluster size. Module-level so tests can shrink it to
# force the multi-block path on small fixtures.
PAIR_BLOCK_ELEMS = 1 << 22


def semantic_dedup(emb: Dataset, ivf: "IntegerIVF", *, tau_num: int = 45,
                   tau_den: int = 100, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cluster_rows: int = 200_000) -> Dataset:
    """SemDeDup-style semantic deduplication: IVF clustering is the
    blocking step, an exact in-cluster cosine threshold is the verify —
    the canonical cluster-then-compare layout for embedding dedup at
    100 TB (pairwise work never crosses a cluster boundary).

    Output ``(vec_id, cid, is_dup)``: ``is_dup = 1`` iff some
    SAME-CLUSTER vector with a smaller id has cosine ≥
    ``tau_num/tau_den`` — the keep-lowest-id representative rule, the
    deterministic twin of SemDeDup's keep-farthest-from-centroid.

    Integer-exact: vectors quantize to int64 (the ``IntegerIVF``
    contract), and the threshold is the cross-multiplied predicate
    ``tau_den²·dot² ≥ tau_num²·|a|²·|b|² AND dot > 0`` evaluated in
    arbitrary-precision Python ints on the float-prefiltered candidate
    pairs (near-dups only — tiny), so the HUGEINT SQL oracle matches
    value-hashes bit-for-bit.

    Scale shape: one bucket-keyed exchange total; each cluster is one
    task (the SemDeDup cost model — ``n_centroids`` grows with the
    corpus so clusters stay bounded). The pairwise pass is ROW-BLOCKED
    (each block holds ~2²² Gram entries ≈ 33 MB int64 + 33 MB float64,
    regardless of cluster size), so memory stays flat in ``n``;
    ``max_cluster_rows`` bounds the single-task O(n²·dim) COMPUTE time
    of a pathologically skewed cluster and aborts loudly past it."""
    tau_f = tau_num / tau_den

    def _empty() -> pa.Table:
        return pa.table({"vec_id": pa.array([], pa.int64()),
                         "cid": pa.array([], pa.int64()),
                         "is_dup": pa.array([], pa.int64())})

    def per_cluster(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty()
        if n > max_cluster_rows:
            raise ValueError(
                f"semantic_dedup: cluster of {n} rows exceeds "
                f"max_cluster_rows={max_cluster_rows} — raise the IVF "
                "n_centroids so in-cluster pairwise work stays bounded")
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = _emb_matrix(t, vec_col)[order]
        Q = IntegerIVF.quantize(M)
        nn = (Q * Q).sum(axis=1)        # exact: ≤ dim·10¹² ≪ 2⁶³
        naf = nn.astype(np.float64)
        dup = np.zeros(n, dtype=bool)
        t2n, t2d = tau_num * tau_num, tau_den * tau_den
        # row-blocked Gram: each block is ~2²² entries, so memory is
        # O(block·n) however big the cluster; float64 prefilter with a
        # safety margin (cos from exact-integer dot/norms carries
        # ~1e-16 relative error), then the exact integer predicate
        # confirms each survivor
        blk = max(1, PAIR_BLOCK_ELEMS // max(n, 1))
        for a in range(0, n, blk):
            b = min(a + blk, n)
            Gb = Q[a:b] @ Q.T           # exact: |entry| ≤ dim·10¹²
            with np.errstate(invalid="ignore", divide="ignore"):
                cosf = Gb / np.sqrt(naf[a:b, None] * naf[None, :])
            # only j > global row index (ids ascend ⇒ j is larger id)
            cosf[:, :b] [np.tril_indices(b - a, k=a, m=b)] = -np.inf
            bi, bj = np.nonzero(cosf >= tau_f - 1e-6)
            for i, j in zip(bi.tolist(), bj.tolist()):
                gi = a + i
                d = int(Gb[i, j])
                if d > 0 and t2d * d * d >= t2n * int(nn[gi]) * int(nn[j]):
                    dup[j] = True
        cid = t.column("bucket").to_numpy(zero_copy_only=False)[order]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cid": pa.array(cid, pa.int64()),
                         "is_dup": pa.array(dup.astype(np.int64),
                                            pa.int64())})

    bucketed = emb.map_batches(ivf.assign_batch, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        per_cluster, batch_format="pyarrow")


def quantize_int8(emb: Dataset, *, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> Dataset:
    """Per-vector symmetric int8 quantization — the codebook-free
    compression step before shipping embeddings to an ANN index
    (4× smaller than float32, dot products within ~1%). Exact-integer
    contract end-to-end: vectors first quantize to int64 on the
    ``IntegerIVF`` scale (``floor(x·10⁶ + 0.5)``), then each code is
    ``sign(q) · (|q| · 127 // max|q|)`` — truncation toward zero spelt
    out explicitly so numpy and the SQL oracle can't diverge on
    negative components; an all-zero vector codes to all zeros.

    Stateless vectorized map, zero shuffles; long-format output
    (vec_id, dim, code) so the driver's value-hash can compare cells
    without list-column semantics."""
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "code": pa.array([], pa.int64())})
        M = _emb_matrix(batch, vec_col)
        Q = np.floor(M * 1_000_000.0 + 0.5).astype(np.int64)
        m = np.abs(Q).max(axis=1)
        safe = np.where(m == 0, 1, m)
        codes = np.sign(Q) * (np.abs(Q) * 127 // safe[:, None])
        n, d = Q.shape
        ids = batch.column(id_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    n), pa.int64()),
            "code": pa.array(codes.ravel(), pa.int64())})

    return emb.map_batches(partial, batch_format="pyarrow")


def semantic_contamination(emb: Dataset, *, tau: float = 0.45,
                           eval_mod: int = 10,
                           id_col: str = "vec_id") -> Dataset:
    """Cross-corpus semantic (embedding-space) contamination check:
    eval-split vectors (``id % eval_mod == 0``) whose cosine to ANY
    train-split vector reaches ``tau`` — the decontamination gate an
    LLM data pipeline runs before training (the embedding-space
    sibling of the n-gram ``ngram_contamination`` detector; flags
    paraphrased benchmark leakage that exact n-grams miss). Output per
    contaminated eval vector: ``(vec_id, n_matches, first_match)``
    with ``first_match`` the smallest matching train id (order-free —
    no float argmax to reconcile across engines).

    Composes the banded-LSH candidate machinery of
    ``embedding_neardup_lsh_pairs`` (in-task exact-cosine verify,
    broadcast/shuffle-join switch), then filters the verified pair
    stream to eval↔train crossings and folds it with one
    eval-id-bounded Count/Min groupby."""
    from ray.data.aggregate import Count, Min

    pairs = embedding_neardup_lsh_pairs(emb, tau=tau, id_col=id_col)

    def crossings(b: pa.Table) -> pa.Table:
        out = pa.schema([("vec_id", pa.int64()), ("train_id", pa.int64())])
        if b.num_rows == 0:
            return out.empty_table()
        a = b.column("vec_a").cast(pa.int64()).to_numpy(zero_copy_only=False)
        c = b.column("vec_b").cast(pa.int64()).to_numpy(zero_copy_only=False)
        a_eval = (a % eval_mod) == 0
        b_eval = (c % eval_mod) == 0
        keep = a_eval != b_eval
        ev = np.where(a_eval[keep], a[keep], c[keep])
        tr = np.where(a_eval[keep], c[keep], a[keep])
        return pa.table({"vec_id": pa.array(ev, pa.int64()),
                         "train_id": pa.array(tr, pa.int64())})

    return (pairs.map_batches(crossings, batch_format="pyarrow",
                              batch_size=None)
            .groupby("vec_id")
            .aggregate(Count(alias_name="n_matches"),
                       Min("train_id", alias_name="first_match")))
