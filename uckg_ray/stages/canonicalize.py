"""Distributed union-find canonicalization.

Reference: node identity in UCKG is the IRI itself under a Neo4j unique
constraint (``process/graph_updater.py:30-46``) — canonicalization is
implicit. The graft adds alias-based linking, so entities reachable
through shared aliases must merge: a union-find over the bipartite
(alias ↔ entity) candidate graph. Canonical id of an entity = the
lexicographically smallest entity_id in its connected component.

The component computation is an iterative min-label propagation
expressed purely with Ray Data shuffles (no driver-side graph):

    labels(v) ← v
    repeat:  labels(v) ← min(labels(v), min_{(u,v)∈E} labels(u))

Each round is fully vectorized — union(labels, symmetric-edges) →
explicit hash partition on node → ONE pandas merge + groupby.min per
partition (label rows ⨝ edge rows flows each node's current label to
its neighbors, with a partial per-node min as the combiner) →
groupby(node).Min. No per-node Python calls anywhere: partition count,
not node count, bounds the Python-call overhead. Convergence is
detected by a content fingerprint (labels are monotone non-increasing,
so an unchanged fingerprint ⇒ fixpoint). Hot hub nodes are mitigated by
(a) pairs being deduped first (fan-out bounded by *distinct* neighbor
count, see ``observed_alias_pairs``) and (b) optional explicit salting:
``salt > 1`` splits each node's edge rows across salt sub-partitions by
hash(neighbor) with label rows replicated into each, so one hub never
serializes one partition task.

The DuckDB oracle reproduces this with a recursive CTE (transitive
closure + MIN over entity labels) — see __ray_entry__.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Min


def _symmetrize(batch: pa.Table, src: str, dst: str) -> pa.Table:
    s = batch.column(src).to_pylist()
    d = batch.column(dst).to_pylist()
    return pa.table({"node": s + d, "nbr": d + s})


def _add_cc_partition(batch: pa.Table, num_partitions: int,
                      salt: int) -> pa.Table:
    """Vectorized partition assignment for one propagation round.

    Partition key is hash(node) (all rows of a node — its label row and
    its edge rows — must co-locate for the in-partition merge). With
    ``salt > 1`` edge rows are sub-keyed by hash(nbr) % salt and label
    rows are replicated into every sub-key, so a hub node's fan-out is
    spread across up to ``salt`` partitions. Sub-key collisions across
    nodes are harmless: the merge joins on node, and duplicate label
    replicas only duplicate message rows that the Min collapses."""
    import polars as pl

    node = batch.column("node")
    node = node.combine_chunks() if isinstance(node, pa.ChunkedArray) else node
    h = pl.from_arrow(node).hash(seed=0).to_numpy().astype(np.uint64)
    if salt <= 1:
        p = (h % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("p", pa.array(p, pa.int32()))
    nbr = batch.column("nbr")
    nbr = nbr.combine_chunks() if isinstance(nbr, pa.ChunkedArray) else nbr
    is_edge = pc.is_valid(nbr).to_numpy(zero_copy_only=False)
    hn = (pl.from_arrow(pc.fill_null(nbr, "")).hash(seed=1)
          .to_numpy().astype(np.uint64) % np.uint64(salt))
    edges_t = batch.filter(pa.array(is_edge))
    p_edges = ((h[is_edge] * np.uint64(1315423911) + hn[is_edge])
               % np.uint64(num_partitions)).astype(np.int32)
    edges_t = edges_t.append_column("p", pa.array(p_edges, pa.int32()))
    labels_t = batch.filter(pa.array(~is_edge))
    h_lab = h[~is_edge]
    reps = []
    for k in range(salt):
        p_lab = ((h_lab * np.uint64(1315423911) + np.uint64(k))
                 % np.uint64(num_partitions)).astype(np.int32)
        reps.append(labels_t.append_column("p", pa.array(p_lab, pa.int32())))
    return pa.concat_tables([edges_t, *reps])


def _propagate_partition(part: pa.Table) -> pa.Table:
    """One vectorized propagation step for one hash partition: labels
    flow across the partition's edge rows via a pandas merge; a per-node
    partial min acts as the combiner before the global Min shuffle."""
    df = part.to_pandas()
    is_lab = df["nbr"].isna()
    lab = df.loc[is_lab, ["node", "label"]]
    edg = df.loc[~is_lab, ["node", "nbr"]]
    m = edg.merge(lab, on="node", how="inner")   # node's label → its nbrs
    msgs = pd.DataFrame({
        "node": pd.concat([lab["node"], m["nbr"]], ignore_index=True),
        "label": pd.concat([lab["label"], m["label"]], ignore_index=True)})
    g = msgs.groupby("node", sort=False)["label"].min().reset_index()
    return pa.table({"node": g["node"].tolist(),
                     "label": g["label"].tolist()})


def _labels_with_shortcuts(batch: pa.Table) -> pa.Table:
    """(node, label) rows → the round's label rows PLUS both half-edges
    of each node↔label shortcut (edge-row shape: null label column),
    self-labels dropped — one fused emission so the fixed-point loop
    unions two datasets per round, not three. Used by
    ``connected_components`` for logarithmic-round convergence."""
    keep = pc.invert(pc.equal(batch.column("node"), batch.column("label")))
    t = batch.filter(keep)
    n, m = t.num_rows, batch.num_rows
    return pa.table({
        "node": pa.concat_arrays([_cc0(batch.column("node")),
                                  _cc0(t.column("node")),
                                  _cc0(t.column("label"))]),
        "nbr": pa.concat_arrays([pa.nulls(m, pa.string()),
                                 _cc0(t.column("label")),
                                 _cc0(t.column("node"))]),
        "label": pa.concat_arrays([_cc0(batch.column("label")),
                                   pa.nulls(2 * n, pa.string())])})


def _cc0(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Vectorized content fingerprint of (node, label) rows: one polars
    64-bit hash pass (no per-row Python), >>1 so the Sum aggregate stays
    within int64. Only compared between successive rounds of one run, so
    in-session stability is all that's required."""
    import polars as pl
    if batch.num_rows == 0:
        return pa.table({"h": pa.array([], pa.int64())})
    df = pl.from_arrow(batch.select(["node", "label"]))
    h = (df.select(pl.concat_str([pl.col("node"), pl.col("label")],
                                 separator="\x00").hash(seed=7).alias("h"))
         .to_series().to_numpy().astype(np.uint64) >> np.uint64(1))
    return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})


def connected_components(pairs: Dataset, src: str, dst: str,
                         max_iters: int = 15, salt: int = 1,
                         num_partitions: int = 16) -> Dataset:
    """(src, dst) edge Dataset → (node, label) with label = min node id of
    the component. Each round is an explicit hash-partition shuffle +
    one vectorized pandas merge/min per partition + a Min aggregate —
    zero per-node Python calls.

    ``salt > 1`` enables explicit hub-key salting: a node's edge rows
    spread across salt sub-partitions by hash(neighbor) with its label
    row replicated into each, so a hub entity with millions of aliases
    fans out across `salt` partition tasks instead of one (north-star
    skew handling). Results are identical to the unsalted path — the
    final groupby(node).Min merges the sub-partition minima."""
    # Block-count discipline: Ray's sort-based groupby emits as many
    # output partitions as it has INPUT blocks, and `union` concatenates
    # block lists — so without an explicit repartition, `labels` gains
    # ~edge-block-count blocks EVERY round and per-round cost grows
    # linearly (O(rounds²) total; measured 78→117→156… blocks and
    # 6→8→11→14→17→24→34 s/round on a 40-node chain). Pinning both
    # fixed-point inputs to `num_partitions` blocks keeps every round
    # the same constant cost.
    edges_sym = pairs.map_batches(
        lambda b: _symmetrize(b, src, dst), batch_format="pyarrow"
    ).repartition(num_partitions).materialize()
    labels = (
        edges_sym.map_batches(lambda b: b.select(["node"]), batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_c")).drop_columns(["_c"])
        .map_batches(lambda b: b.append_column("label", b.column("node")),
                     batch_format="pyarrow")
        .repartition(num_partitions)
        .materialize()
    )
    prev_fp = None
    for _ in range(max_iters):
        edges_tagged = edges_sym.map_batches(
            lambda b: pa.table({
                "node": b.column("node"), "nbr": b.column("nbr"),
                "label": pa.nulls(b.num_rows, pa.string()),
            }),
            batch_format="pyarrow",
        )
        # Label rows + label-shortcut pseudo-edges (hash-to-min
        # acceleration) in ONE fused map over labels: each node's
        # CURRENT label becomes an undirected edge node↔label, so label
        # nodes act as hubs that collect and redistribute minima —
        # convergence drops from O(diameter) rounds (a 64-round chain
        # crawl measured 452 s on the sf0.1 relatedWeakness subgraph) to
        # O(log diameter). A label is always a node id from the SAME
        # component (induction from the self-label init), so shortcuts
        # never bridge components and the fixpoint is unchanged.
        labels_tagged = labels.map_batches(
            _labels_with_shortcuts, batch_format="pyarrow")
        combined = labels_tagged.union(edges_tagged)
        msgs = (combined.map_batches(
                    lambda b: _add_cc_partition(b, num_partitions, salt),
                    batch_format="pyarrow", batch_size=None)
                .groupby("p").map_groups(
                    lambda t: _propagate_partition(t.drop_columns(["p"])),
                    batch_format="pyarrow"))
        labels = (msgs.groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .repartition(num_partitions).materialize())
        fp = labels.map_batches(_fingerprint_batch, batch_format="pyarrow").sum("h")
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge within {max_iters} "
            "iterations (component diameter exceeds the bound) — raise "
            "cc_max_iters; silent partial merges are never returned")
    return labels


def observed_alias_pairs(link_rows: Dataset, alias_table: pd.DataFrame) -> Dataset:
    """Distinct (alias, entity_id) candidate pairs actually observed in the
    transcripts: the distinct observed aliases (a groupby shuffle over the
    mention stream — this is the data-scale step) joined against ALL
    dictionary candidates for those aliases (small side, broadcast)."""
    observed = (
        link_rows.map_batches(lambda b: b.select(["alias"]), batch_format="pyarrow")
        .groupby("alias").aggregate(Count(alias_name="_c")).drop_columns(["_c"])
    )
    seen = set(r["alias"] for r in observed.take_all())  # bounded by dict size
    cand = alias_table[alias_table["block_key"].isin(seen)]
    return ray.data.from_pandas(
        cand[["block_key", "entity_id"]].rename(columns={"block_key": "alias"})
        .drop_duplicates().reset_index(drop=True)
    )


def canonical_map(pairs: Dataset, max_iters: int = 15,
                  salt: int = 1) -> pd.DataFrame:
    """(alias, entity_id) pairs → (entity_id, canonical_id) via distributed
    connected components. The final component→canonical reduction is
    bounded by the dictionary size (documented small side)."""
    prefixed = pairs.map_batches(
        lambda b: pa.table({
            "src": ["A:" + a for a in b.column("alias").to_pylist()],
            "dst": ["E:" + e for e in b.column("entity_id").to_pylist()],
        }),
        batch_format="pyarrow",
    )
    cc = connected_components(prefixed, "src", "dst", max_iters=max_iters,
                              salt=salt)
    ent = cc.map_batches(
        lambda b: b.filter(
            pa.compute.starts_with(b.column("node"), "E:")),
        batch_format="pyarrow",
    )
    rows = ent.take_all()  # bounded by dictionary size
    comp_min: dict[str, str] = {}
    for r in rows:
        e = r["node"][2:]
        comp_min[r["label"]] = min(comp_min.get(r["label"], e), e)
    out = pd.DataFrame({
        "entity_id": [r["node"][2:] for r in rows],
        "canonical_id": [comp_min[r["label"]] for r in rows],
    }).sort_values("entity_id").reset_index(drop=True)
    return out


def union_find_oracle(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Single-process union-find oracle for tests: alias/entity pairs →
    entity_id → canonical (min entity in component)."""
    parent: dict[str, str] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for alias, ent in pairs:
        union("A:" + alias, "E:" + ent)
    comp: dict[str, list[str]] = {}
    for alias, ent in pairs:
        comp.setdefault(find("E:" + ent), []).append(ent)
    out = {}
    for members in comp.values():
        canon = min(members)
        for e in members:
            out[e] = canon
    return out
