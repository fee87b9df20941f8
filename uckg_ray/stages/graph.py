"""Graph-analytics operators over the materialized KG edge table.

``triangles``: enumerate (a < b < c) node triangles in the undirected
relationship graph (non-literal, non-rdf:type edges; type edges link
everything to a handful of class hubs and would drown the relationship
structure in hub wedges).

Distributed shape — two explicit hash-partition rounds, no Dataset.join
(robust to empty partitions, vectorized pandas merges inside the
partition tasks):

1. undirected distinct pairs (u < v): block-local dedup combiner, then
   a pair-key hash-partition distinct — feed it RAW unioned edges
   (multiplicity is collapsed here; an upstream distinct_edges would
   just add a redundant shuffle);
2. wedge round: every edge (u,v) contributes u as a lo-neighbor of
   center v and v as a hi-neighbor of center u; partition by center,
   cross lo×hi per center → candidate (a, c, center) wedges;
3. closure round: wedge candidates ∪ edge rows partitioned by the
   (a, c) pair key; a wedge survives iff its closing edge co-locates.

Partition keys go through ``materialize._add_hash_partition`` (the
repo's single polars-hash helper). ``num_partitions`` defaults to the
cluster CPU count. Wedge volume is Σ_m lo(m)·hi(m) — bounded by
excluding the type hubs; for skewed relationship hubs, salt the wedge
stage by the lo side (same trick as canonicalize._add_cc_partition).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from uckg_ray import namespaces as ns
from uckg_ray.stages.materialize import _add_hash_partition

_PAIR_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string())])
_TRI_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string()),
                         ("c", pa.string())])


def _default_partitions() -> int:
    import ray
    return max(16, int(ray.cluster_resources().get("CPU", 16))
               if ray.is_initialized() else 16)


def _cc(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def undirected_pairs(edges: Dataset, num_partitions: int | None = None
                     ) -> Dataset:
    """Distinct (u < v) node pairs from non-literal, non-rdf:type,
    non-self-loop edges. Accepts raw (non-distinct) edge streams: the
    block-local dedup is the combiner, the pair-key partition the
    global distinct."""
    num_partitions = num_partitions or _default_partitions()

    def to_und(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.invert(batch.column("obj_is_literal")),
                       pc.and_(pc.not_equal(batch.column("pred"), ns.RDF_TYPE),
                               pc.not_equal(batch.column("subj"),
                                            batch.column("obj"))))
        t = batch.filter(keep)
        u = pc.min_element_wise(t.column("subj"), t.column("obj"))
        v = pc.max_element_wise(t.column("subj"), t.column("obj"))
        key = pc.binary_join_element_wise(_cc(u), _cc(v), "\x1f")
        # block-local dedup combiner before the shuffle
        pairs = (pa.Table.from_pydict({"u": u, "v": v, "k": key})
                 .group_by(["k", "u", "v"]).aggregate([]))
        return _add_hash_partition(pairs, num_partitions)

    def uniq(part: pa.Table) -> pa.Table:
        d = part.group_by(["u", "v"]).aggregate([])
        return pa.Table.from_pydict(
            {"u": d.column("u"), "v": d.column("v")}, schema=_PAIR_SCHEMA)

    return (edges.map_batches(to_und, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(
                lambda t: uniq(t.drop_columns(["p", "k"])),
                batch_format="pyarrow"))


def triangles(edges: Dataset, num_partitions: int | None = None) -> Dataset:
    """All (a < b < c) triangles of the undirected relationship graph."""
    num_partitions = num_partitions or _default_partitions()
    und = undirected_pairs(edges, num_partitions).materialize()

    def wedge_rows(batch: pa.Table) -> pa.Table:
        u = _cc(batch.column("u"))
        v = _cc(batch.column("v"))
        n = batch.num_rows
        # u is a lo-neighbor of center v; v is a hi-neighbor of center u
        center = pa.concat_arrays([v, u])
        other = pa.concat_arrays([u, v])
        is_lo = pa.concat_arrays([
            pa.array(np.ones(n, dtype=bool)),
            pa.array(np.zeros(n, dtype=bool))])
        t = pa.Table.from_pydict(
            {"center": center, "other": other, "is_lo": is_lo,
             "k": center})
        return _add_hash_partition(t, num_partitions)

    def wedges_in_partition(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        A, B, C = [], [], []
        for center, g in df.groupby("center", sort=False):
            lo = g.loc[g["is_lo"], "other"].to_numpy()
            hi = g.loc[~g["is_lo"], "other"].to_numpy()
            if len(lo) == 0 or len(hi) == 0:
                continue
            # cross product lo × hi — candidate wedges a < center < c
            A.append(np.repeat(lo, len(hi)))
            C.append(np.tile(hi, len(lo)))
            B.extend([center] * (len(lo) * len(hi)))
        if not A:
            return pa.Table.from_pydict(
                {"a": [], "b": [], "c": []}, schema=_TRI_SCHEMA)
        return pa.Table.from_pydict({
            "a": np.concatenate(A).tolist(), "b": B,
            "c": np.concatenate(C).tolist()}, schema=_TRI_SCHEMA)

    cand = (und.map_batches(wedge_rows, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(
                lambda t: wedges_in_partition(t.drop_columns(["p", "k"])),
                batch_format="pyarrow"))

    def tag_wedge(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            _cc(batch.column("a")), _cc(batch.column("c")), "\x1f")
        return _add_hash_partition(
            batch.append_column("k", key), num_partitions)

    def tag_edge(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            _cc(batch.column("u")), _cc(batch.column("v")), "\x1f")
        t = pa.Table.from_pydict({
            "a": batch.column("u"),
            "b": pa.nulls(batch.num_rows, pa.string()),  # edge marker
            "c": batch.column("v"), "k": key})
        return _add_hash_partition(t, num_partitions)

    def close_in_partition(part: pa.Table) -> pa.Table:
        df = part.to_pandas()
        is_edge = df["b"].isna()
        have = set(zip(df.loc[is_edge, "a"], df.loc[is_edge, "c"]))
        w = df.loc[~is_edge]
        keep = [(a, c) in have for a, c in zip(w["a"], w["c"])]
        out = w.loc[keep]
        return pa.Table.from_pydict(
            {"a": out["a"].tolist(), "b": out["b"].tolist(),
             "c": out["c"].tolist()}, schema=_TRI_SCHEMA)

    tagged = (cand.map_batches(tag_wedge, batch_format="pyarrow",
                               batch_size=None)
              .union(und.map_batches(tag_edge, batch_format="pyarrow",
                                     batch_size=None)))
    return tagged.groupby("p").map_groups(
        lambda t: close_in_partition(t.drop_columns(["p", "k"])),
        batch_format="pyarrow")


def pagerank_int(edges: Dataset, *, iters: int = 3, damping_pct: int = 85,
                 scale: int = 1_000_000,
                 max_driver_nodes: int = 5_000_000) -> Dataset:
    """Integer-exact PageRank over the KG link graph — the iterative
    graph algorithm made hash-checkable by fixed-point floor arithmetic
    (the IntegerIVF trick): a SQL oracle replays every iteration
    bit-for-bit with materialized CTEs.

    Graph: distinct (subj, obj) pairs with resource objects; nodes are
    all subjects plus resource objects. Recurrence (unnormalized base,
    dangling mass dropped — both documented, both mirrored in SQL)::

        r_0(v)     = scale
        r_{t+1}(v) = (100-damping_pct)*scale//100
                     + Σ_{(u,v)∈E} (r_t(u)*damping_pct) // (100*outdeg(u))

    Scale shape: the link table is distincted once and MATERIALIZED
    (each iteration re-reads it; Ray plans are trees). Per iteration:
    per-node contribution weights are computed vectorized DRIVER-side
    over the node-bounded rank vector (the entity vocabulary — the same
    bounded state as the node table / canonical map), broadcast once
    via ``ray.put`` as an Arrow table, joined in-block (polars) with a
    per-block partial sum, then ONE Sum groupby on the target node.
    Ranks above ``max_driver_nodes`` raise loudly — the extension is
    the canonicalize-style co-partitioned rank attach."""
    import ray
    from ray.data.aggregate import Count, Sum

    def link_part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(b.column("obj_is_literal")))
        return pa.table({"subj": t.column("subj"), "obj": t.column("obj")})

    le = (edges.map_batches(link_part, batch_format="pyarrow",
                            batch_size=None)
          .groupby(["subj", "obj"]).aggregate(Count(alias_name="_c"))
          .drop_columns(["_c"]).materialize())

    def _flat(col) -> list:
        # ChunkedArray.combine_chunks() returns a plain Array on recent
        # pyarrow; normalize either shape to a list of Arrays
        c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return c.chunks if isinstance(c, pa.ChunkedArray) else [c]

    def node_part(b: pa.Table) -> pa.Table:
        objs = (b.filter(pc.invert(b.column("obj_is_literal")))
                .column("obj"))
        arrs = _flat(b.column("subj")) + _flat(objs)
        return pa.table({"node": pa.concat_arrays(arrs) if arrs
                         else pa.array([], pa.string())})

    nodes_ds = (edges.map_batches(node_part, batch_format="pyarrow",
                                  batch_size=None)
                .groupby("node").aggregate(Count(alias_name="_c")))
    node_arr = np.array([r["node"] for r in nodes_ds.take_all()])
    if len(node_arr) > max_driver_nodes:
        raise ValueError(
            f"pagerank_int holds the rank vector driver-side (bounded by "
            f"the entity vocabulary); {len(node_arr)} nodes exceeds "
            f"max_driver_nodes={max_driver_nodes} — extend with a "
            f"co-partitioned rank attach (see canonicalize) for wider "
            f"vocabularies")
    order = np.argsort(node_arr)
    node_arr = node_arr[order]
    deg_map = {r["subj"]: r["outdeg"] for r in
               le.groupby("subj").aggregate(Count(alias_name="outdeg"))
               .take_all()}
    outdeg = np.array([deg_map.get(n, 0) for n in node_arr], np.int64)
    has_out = outdeg > 0

    base = (100 - damping_pct) * scale // 100
    ranks = np.full(len(node_arr), scale, np.int64)

    _P = pa.schema([("obj", pa.string()), ("w", pa.int64())])

    def contrib_factory(wref):
        def f(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _P.empty_table()
            import polars as pl
            wdf = pl.from_arrow(ray.get(wref))
            j = (pl.from_arrow(b.select(["subj", "obj"]))
                 .join(wdf, on="subj")
                 .group_by("obj").agg(pl.col("w").sum()))
            return pa.table({
                "obj": j["obj"].to_arrow().cast(pa.string()),
                "w": j["w"].to_arrow().cast(pa.int64())})
        return f

    for _ in range(iters):
        w = (ranks[has_out] * damping_pct) // (100 * outdeg[has_out])
        wref = ray.put(pa.table({"subj": pa.array(node_arr[has_out]),
                                 "w": pa.array(w, pa.int64())}))
        inc = (le.map_batches(contrib_factory(wref),
                              batch_format="pyarrow", batch_size=None)
               .groupby("obj").aggregate(Sum("w", alias_name="w")))
        ranks = np.full(len(node_arr), base, np.int64)
        inc_rows = inc.take_all()
        if inc_rows:
            idx = np.searchsorted(node_arr,
                                  np.array([r["obj"] for r in inc_rows]))
            ranks[idx] += np.array([r["w"] for r in inc_rows], np.int64)

    import ray.data
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr), "rank": pa.array(ranks, pa.int64())}))
