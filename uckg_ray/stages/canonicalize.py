"""Distributed union-find canonicalization.

Reference: node identity in UCKG is the IRI itself under a Neo4j unique
constraint (``process/graph_updater.py:30-46``) — canonicalization is
implicit. The graft adds alias-based linking, so entities reachable
through shared aliases must merge: a union-find over the bipartite
(alias ↔ entity) candidate graph. Canonical id of an entity = the
lexicographically smallest entity_id in its connected component.

The component computation is an iterative min-label propagation
expressed purely with Ray Data groupby shuffles (no driver-side graph):

    labels(v) ← v
    repeat:  labels(v) ← min(labels(v), min_{(u,v)∈E} labels(u))

Each round is: union(labels, symmetric-edges) → groupby(node) →
emit min label to self + neighbors → groupby(node).min. Convergence is
detected by a content fingerprint (labels are monotone non-increasing,
so an unchanged fingerprint ⇒ fixpoint). Hot hub nodes are mitigated by
Ray Data's per-block partial aggregation on the Min aggregate; the
neighbor fan-out of a hub is bounded by its *distinct* neighbor count
because pairs are deduped first (see ``observed_alias_pairs``).

The DuckDB oracle reproduces this with a recursive CTE (transitive
closure + MIN over entity labels) — see __ray_entry__.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count, Min


def _symmetrize(batch: pa.Table, src: str, dst: str) -> pa.Table:
    s = batch.column(src).to_pylist()
    d = batch.column(dst).to_pylist()
    return pa.table({"node": s + d, "nbr": d + s})


def _propagate(group: pd.DataFrame) -> pd.DataFrame:
    labels = group["label"].dropna()
    ml = labels.min()
    nbrs = group["nbr"].dropna()
    nodes = [group["node"].iloc[0], *nbrs.tolist()]
    return pd.DataFrame({"node": nodes, "label": [ml] * len(nodes)})


def _salt_batch(batch: pa.Table, salt: int) -> pa.Table:
    """Explicit hub-key salting: split each node's rows into `salt`
    sub-groups keyed by hash(nbr) so a hub's neighbor fan-out never
    lands in one task; label rows are replicated into every sub-group
    so each sub-group can compute the node's current min label."""
    import polars as pl
    node = batch.column("node").to_pylist()
    nbr = batch.column("nbr").to_pylist()
    label = batch.column("label").to_pylist()
    N, B, L, S = [], [], [], []
    nbr_salt = (pl.Series([x or "" for x in nbr]).hash(seed=1)
                % salt).to_list()
    for n, b, l, s in zip(node, nbr, label, nbr_salt):
        if b is not None:                      # edge row → its salt bucket
            N.append(n); B.append(b); L.append(l); S.append(int(s))
        else:                                  # label row → every bucket
            for k in range(salt):
                N.append(n); B.append(b); L.append(l); S.append(k)
    return pa.table({"node": N, "nbr": pa.array(B, pa.string()),
                     "label": pa.array(L, pa.string()),
                     "salt": pa.array(S, pa.int32())})


def _fingerprint_batch(batch: pa.Table) -> pa.Table:
    h = []
    for n, l in zip(batch.column("node").to_pylist(),
                    batch.column("label").to_pylist()):
        digest = hashlib.blake2b(f"{n}\x00{l}".encode(), digest_size=8).digest()
        h.append(int.from_bytes(digest, "big") >> 1)
    return pa.table({"h": pa.array(h, pa.int64())})


def connected_components(pairs: Dataset, src: str, dst: str,
                         max_iters: int = 15, salt: int = 1) -> Dataset:
    """(src, dst) edge Dataset → (node, label) with label = min node id of
    the component. Pure groupby-shuffle label propagation.

    ``salt > 1`` enables explicit hub-key salting: the per-node message
    groups are split into `salt` sub-groups by hash(neighbor), with
    label rows replicated into each, so a hub entity with millions of
    aliases fans out across `salt` tasks instead of one (north-star
    skew handling). Results are identical to the unsalted path — the
    final groupby(node).min merges the sub-group minima."""
    edges_sym = pairs.map_batches(
        lambda b: _symmetrize(b, src, dst), batch_format="pyarrow"
    ).materialize()
    labels = (
        edges_sym.map_batches(lambda b: b.select(["node"]), batch_format="pyarrow")
        .groupby("node").aggregate(Count(alias_name="_c")).drop_columns(["_c"])
        .map_batches(lambda b: b.append_column("label", b.column("node")),
                     batch_format="pyarrow")
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
        labels_tagged = labels.map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "nbr": pa.nulls(b.num_rows, pa.string()),
                "label": b.column("label"),
            }),
            batch_format="pyarrow",
        )
        combined = labels_tagged.union(edges_tagged)
        if salt > 1:
            msgs = (combined.map_batches(
                        lambda b: _salt_batch(b, salt),
                        batch_format="pyarrow", batch_size=None)
                    .groupby(["node", "salt"]).map_groups(
                        lambda g: _propagate(g.drop(columns=["salt"])),
                        batch_format="pandas"))
        else:
            msgs = combined.groupby("node").map_groups(
                _propagate, batch_format="pandas")
        labels = msgs.groupby("node").aggregate(
            Min("label", alias_name="label")).materialize()
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
