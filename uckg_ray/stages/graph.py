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
    from uckg_ray.partitioning import default_partitions
    return default_partitions()


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


def triangles(edges: Dataset, num_partitions: int | None = None,
              *, und: Dataset | None = None) -> Dataset:
    """All (a < b < c) triangles of the undirected relationship graph.
    Pass a pre-materialized ``und`` (from ``undirected_pairs`` with the
    SAME num_partitions) to share the distinct-pair exchange with other
    consumers (clustering_counts does)."""
    num_partitions = num_partitions or _default_partitions()
    if und is None:
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
                 max_driver_nodes: int = 5_000_000,
                 force_distributed: bool = False,
                 num_partitions: int | None = None) -> Dataset:
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
    (each iteration re-reads it; Ray plans are trees). Two size-adaptive
    placements, identical output (forced-path tested):

    - ``≤ max_driver_nodes`` (the entity vocabulary — the same bounded
      state as the node table / canonical map): per-node contribution
      weights are computed vectorized DRIVER-side, broadcast once per
      iteration via ``ray.put`` as an Arrow table, joined in-block
      (polars) with a per-block partial sum, then ONE Sum groupby on
      the target node.
    - above it (or ``force_distributed``): ranks stay a Dataset
      carrying ``outdeg``; each iteration is two explicit key-hash
      co-partitions (weights⨝links, ranks⨝incoming — per-partition
      exact polars string joins) plus the same Sum groupby. Nothing is
      ever O(nodes) on the driver."""
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
                .groupby("node").aggregate(Count(alias_name="_c"))
                .drop_columns(["_c"]).materialize())
    if force_distributed or nodes_ds.count() > max_driver_nodes:
        return _pagerank_distributed(le, nodes_ds, iters=iters,
                                     damping_pct=damping_pct, scale=scale,
                                     num_partitions=num_partitions)
    def _cols_np(ds, cols):
        # bounded driver pull as Arrow batches → numpy (no per-row
        # Python dicts; ~10-50x lighter than take_all at the node cap)
        chunks = {c: [] for c in cols}
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            for c in cols:
                chunks[c].append(b.column(c).to_numpy(zero_copy_only=False))
        return [np.concatenate(chunks[c]) if chunks[c]
                else np.array([]) for c in cols]

    (node_arr,) = _cols_np(nodes_ds, ["node"])
    node_arr = np.sort(node_arr)
    deg_subj, deg_n = _cols_np(
        le.groupby("subj").aggregate(Count(alias_name="outdeg")),
        ["subj", "outdeg"])
    outdeg = np.zeros(len(node_arr), np.int64)
    if len(deg_subj):
        outdeg[np.searchsorted(node_arr, deg_subj)] = deg_n.astype(np.int64)
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
        inc_obj, inc_w = _cols_np(inc, ["obj", "w"])
        if len(inc_obj):
            ranks[np.searchsorted(node_arr, inc_obj)] += \
                inc_w.astype(np.int64)

    import ray.data
    return ray.data.from_arrow(pa.table({
        "node": pa.array(node_arr), "rank": pa.array(ranks, pa.int64())}))


def _pagerank_distributed(le: Dataset, nodes_ds: Dataset, *, iters: int,
                          damping_pct: int, scale: int,
                          num_partitions: int | None) -> Dataset:
    """Co-partitioned PageRank: the rank vector never visits the driver.
    Ranks are a Dataset (node, outdeg, rank) — outdeg rides along so the
    per-iteration weight map needs no extra join. Each iteration:
    weights (stateless map off ranks) co-partition with the link table
    by hash(subj) → per-partition polars string join + partial sums →
    Sum groupby on the target node → co-partition incoming with ranks
    by hash(node) → per-partition left join applies base + damping."""
    import polars as pl

    from ray.data.aggregate import Count, Sum
    from uckg_ray.stages.materialize import _add_hash_partition

    if num_partitions is None:
        num_partitions = _default_partitions()
    base = (100 - damping_pct) * scale // 100

    deg = le.groupby("subj").aggregate(Count(alias_name="outdeg"))

    # --- setup: ranks0 = nodes ⟕ outdeg, rank = scale -----------------
    _SETUP = pa.schema([("key", pa.string()), ("side", pa.int8()),
                        ("ival", pa.int64())])

    def tag_nodes(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _add_hash_partition(_SETUP.empty_table(),
                                       num_partitions, "key")
        t = pa.table({"key": b.column("node").cast(pa.string()),
                      "side": pa.array(np.zeros(b.num_rows, np.int8)),
                      "ival": pa.array(np.zeros(b.num_rows, np.int64))})
        return _add_hash_partition(t, num_partitions, "key")

    def tag_deg(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "subj" not in b.column_names:
            return _add_hash_partition(_SETUP.empty_table(),
                                       num_partitions, "key")
        t = pa.table({"key": b.column("subj").cast(pa.string()),
                      "side": pa.array(np.ones(b.num_rows, np.int8)),
                      "ival": b.column("outdeg").cast(pa.int64())})
        return _add_hash_partition(t, num_partitions, "key")

    _RANKS = pa.schema([("node", pa.string()), ("outdeg", pa.int64()),
                        ("rank", pa.int64())])

    def init_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _RANKS.empty_table()
        df = pl.from_arrow(part.select(["key", "side", "ival"]))
        n = df.filter(pl.col("side") == 0).select(node="key")
        d = (df.filter(pl.col("side") == 1)
             .select(node="key", outdeg="ival"))
        j = n.join(d, on="node", how="left").fill_null(0)
        return pa.table({
            "node": j["node"].to_arrow().cast(pa.string()),
            "outdeg": j["outdeg"].to_arrow().cast(pa.int64()),
            "rank": pa.array(np.full(j.height, scale, np.int64))})

    ranks = (nodes_ds.map_batches(tag_nodes, batch_format="pyarrow",
                                  batch_size=None)
             .union(deg.map_batches(tag_deg, batch_format="pyarrow",
                                    batch_size=None))
             .groupby("p").map_groups(init_partition,
                                      batch_format="pyarrow")
             .materialize())

    # --- per-iteration exchanges --------------------------------------
    _CU = pa.schema([("key", pa.string()), ("side", pa.int8()),
                     ("obj", pa.string()), ("w", pa.int64())])

    def tag_le(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "subj" not in b.column_names:
            return _add_hash_partition(_CU.empty_table(),
                                       num_partitions, "key")
        t = pa.table({"key": b.column("subj").cast(pa.string()),
                      "side": pa.array(np.zeros(b.num_rows, np.int8)),
                      "obj": b.column("obj").cast(pa.string()),
                      "w": pa.array(np.zeros(b.num_rows, np.int64))})
        return _add_hash_partition(t, num_partitions, "key")

    def weights(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _add_hash_partition(_CU.empty_table(),
                                       num_partitions, "key")
        r = b.column("rank").to_numpy(zero_copy_only=False)
        d = b.column("outdeg").to_numpy(zero_copy_only=False)
        m = d > 0
        w = (r[m] * damping_pct) // (100 * d[m])
        t = pa.table({"key": b.column("node").filter(pa.array(m))
                      .cast(pa.string()),
                      "side": pa.array(np.ones(int(m.sum()), np.int8)),
                      "obj": pa.nulls(int(m.sum()), pa.string()),
                      "w": pa.array(w, pa.int64())})
        return _add_hash_partition(t, num_partitions, "key")

    _INC = pa.schema([("obj", pa.string()), ("w", pa.int64())])

    def contrib_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _INC.empty_table()
        df = pl.from_arrow(part.select(["key", "side", "obj", "w"]))
        links = df.filter(pl.col("side") == 0).select("key", "obj")
        wt = df.filter(pl.col("side") == 1).select("key", "w")
        if links.height == 0 or wt.height == 0:
            return _INC.empty_table()
        j = (links.join(wt, on="key")
             .group_by("obj").agg(pl.col("w").sum()))
        return pa.table({"obj": j["obj"].to_arrow().cast(pa.string()),
                         "w": j["w"].to_arrow().cast(pa.int64())})

    _RU = pa.schema([("key", pa.string()), ("side", pa.int8()),
                     ("outdeg", pa.int64()), ("w", pa.int64())])

    def tag_ranks(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "node" not in b.column_names:
            return _add_hash_partition(_RU.empty_table(),
                                       num_partitions, "key")
        t = pa.table({"key": b.column("node").cast(pa.string()),
                      "side": pa.array(np.zeros(b.num_rows, np.int8)),
                      "outdeg": b.column("outdeg").cast(pa.int64()),
                      "w": pa.array(np.zeros(b.num_rows, np.int64))})
        return _add_hash_partition(t, num_partitions, "key")

    def tag_inc(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "obj" not in b.column_names:
            return _add_hash_partition(_RU.empty_table(),
                                       num_partitions, "key")
        t = pa.table({"key": b.column("obj").cast(pa.string()),
                      "side": pa.array(np.ones(b.num_rows, np.int8)),
                      "outdeg": pa.array(np.zeros(b.num_rows, np.int64)),
                      "w": b.column("w").cast(pa.int64())})
        return _add_hash_partition(t, num_partitions, "key")

    def update_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _RANKS.empty_table()
        df = pl.from_arrow(part.select(["key", "side", "outdeg", "w"]))
        r = (df.filter(pl.col("side") == 0)
             .select(node="key", outdeg="outdeg"))
        i = df.filter(pl.col("side") == 1).select(node="key", w="w")
        j = r.join(i, on="node", how="left").fill_null(0)
        return pa.table({
            "node": j["node"].to_arrow().cast(pa.string()),
            "outdeg": j["outdeg"].to_arrow().cast(pa.int64()),
            "rank": (j["w"] + base).to_arrow().cast(pa.int64())})

    for _ in range(iters):
        inc = (le.map_batches(tag_le, batch_format="pyarrow",
                              batch_size=None)
               .union(ranks.map_batches(weights, batch_format="pyarrow",
                                        batch_size=None))
               .groupby("p").map_groups(contrib_partition,
                                        batch_format="pyarrow")
               .groupby("obj").aggregate(Sum("w", alias_name="w")))
        # repartition pins the per-iteration block count: sort-based
        # groupby emits one partition per INPUT block and union
        # concatenates block lists, so without it `ranks` gains
        # ~link-block-count blocks every iteration (the O(rounds²)
        # growth fixed in canonicalize.connected_components)
        ranks = (ranks.map_batches(tag_ranks, batch_format="pyarrow",
                                   batch_size=None)
                 .union(inc.map_batches(tag_inc, batch_format="pyarrow",
                                        batch_size=None))
                 .groupby("p").map_groups(update_partition,
                                          batch_format="pyarrow")
                 .repartition(num_partitions)
                 .materialize())

    return ranks.drop_columns(["outdeg"])


def bfs_levels(edges: Dataset, seed_type_iri: str, *, max_hops: int = 3,
               num_partitions: int | None = None) -> Dataset:
    """Multi-source BFS hop levels over the directed KG link graph:
    ``(node, lvl)`` where ``lvl`` is the minimum number of directed
    resource-edge hops from any node asserted ``rdf:type
    seed_type_iri`` (reachability radius — the "what does this source
    influence within k hops" audit). Mirrors a recursive-CTE min-level
    BFS in SQL.

    Distributed shape: the frontier and visited sets stay Datasets
    end-to-end (entity-vocabulary-bounded, the pagerank argument —
    nothing is ever O(nodes) on the driver). Each hop is two explicit
    hash-partition exchanges, both per-partition vectorized polars set
    ops:

    1. expansion — links keyed by ``subj`` meet the frontier keyed by
       node; a per-partition semi join emits the partition-distinct
       successor set;
    2. dedup + anti-visited — successors keyed by node meet the
       visited set; per-partition global distinct minus visited
       assigns the new nodes this hop's level.

    The visited union grows by materialized per-level increments
    (``max_hops`` is small and bounded); BFS exits early on an empty
    frontier."""
    import polars as pl

    from ray.data.aggregate import Count

    if num_partitions is None:
        num_partitions = _default_partitions()

    def link_part(b: pa.Table) -> pa.Table:
        # relationship edges only: rdf:type edges link everything to a
        # handful of class hubs and would flood every BFS level 2 with
        # the whole graph (same exclusion as ``triangles``)
        t = b.filter(pc.and_(pc.invert(b.column("obj_is_literal")),
                             pc.not_equal(b.column("pred"), ns.RDF_TYPE)))
        return pa.table({"subj": t.column("subj"), "obj": t.column("obj")})

    le = (edges.map_batches(link_part, batch_format="pyarrow",
                            batch_size=None)
          .groupby(["subj", "obj"]).aggregate(Count(alias_name="_c"))
          .drop_columns(["_c"]).materialize())

    def seed_part(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b.column("pred"), ns.RDF_TYPE),
                       pc.equal(b.column("obj"), seed_type_iri))
        return pa.table({"node": b.filter(keep).column("subj")})

    _LVL = pa.schema([("node", pa.string()), ("lvl", pa.int64())])

    def lvl_rows(nodes: pa.Table, lvl: int) -> pa.Table:
        return pa.table({"node": nodes.column("node").cast(pa.string()),
                         "lvl": pa.array(
                             np.full(nodes.num_rows, lvl, np.int64))})

    seeds = (edges.map_batches(seed_part, batch_format="pyarrow",
                               batch_size=None)
             .groupby("node").aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"])
             .map_batches(lambda b: lvl_rows(b, 0),
                          batch_format="pyarrow", batch_size=None)
             .materialize())

    _KEYED = pa.schema([("key", pa.string()), ("side", pa.int8()),
                        ("obj", pa.string())])

    def _tag(b: pa.Table, key_col: str, side: int,
             obj_col: str | None) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.column_names:
            return _add_hash_partition(_KEYED.empty_table(),
                                       num_partitions, "key")
        obj = (b.column(obj_col).cast(pa.string()) if obj_col
               else pa.nulls(b.num_rows, pa.string()))
        t = pa.table({"key": b.column(key_col).cast(pa.string()),
                      "side": pa.array(np.full(b.num_rows, side, np.int8)),
                      "obj": obj})
        return _add_hash_partition(t, num_partitions, "key")

    _NODE = pa.schema([("node", pa.string())])

    def expand(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _NODE.empty_table()
        df = pl.from_arrow(part.select(["key", "side", "obj"]))
        fr = df.filter(pl.col("side") == 0).select("key")
        ln = df.filter(pl.col("side") == 1)
        nxt = (ln.join(fr, on="key", how="semi")
               .select(node="obj").unique())
        return pa.table({"node": nxt["node"].to_arrow().cast(pa.string())})

    def anti_visited_factory(lvl: int):
        def f(part: pa.Table) -> pa.Table:
            if part.num_rows == 0:
                return _LVL.empty_table()
            df = pl.from_arrow(part.select(["key", "side"]))
            cand = (df.filter(pl.col("side") == 0)
                    .select(node="key").unique())
            seen = df.filter(pl.col("side") == 1).select(node="key")
            new = cand.join(seen, on="node", how="anti")
            return pa.table({
                "node": new["node"].to_arrow().cast(pa.string()),
                "lvl": pa.array(np.full(new.height, lvl, np.int64))})
        return f

    visited = seeds
    frontier = seeds
    for hop in range(1, max_hops + 1):
        if frontier.count() == 0:
            break
        succ = (frontier.map_batches(
                    lambda b: _tag(b, "node", 0, None),
                    batch_format="pyarrow", batch_size=None)
                .union(le.map_batches(
                    lambda b: _tag(b, "subj", 1, "obj"),
                    batch_format="pyarrow", batch_size=None))
                .groupby("p").map_groups(
                    lambda t: expand(t.drop_columns(["p"])),
                    batch_format="pyarrow"))
        new = (succ.map_batches(
                   lambda b: _tag(b, "node", 0, None),
                   batch_format="pyarrow", batch_size=None)
               .union(visited.map_batches(
                   lambda b: _tag(b, "node", 1, None),
                   batch_format="pyarrow", batch_size=None))
               .groupby("p").map_groups(
                   lambda t: anti_visited_factory(hop)(
                       t.drop_columns(["p"])),
                   batch_format="pyarrow")
               .repartition(num_partitions)
               .materialize())
        # repartition pins the block count: union concatenates block
        # lists and sort-based groupby mirrors input blocks, so visited
        # would otherwise gain new.blocks + link-blocks every hop (the
        # O(rounds²) growth fixed in connected_components)
        visited = (visited.union(new)
                   .repartition(num_partitions).materialize())
        frontier = new
    return visited


def predicate_components(edges: Dataset, pred_iri: str, *,
                         max_iters: int = 64,
                         num_partitions: int = 16) -> Dataset:
    """Connected components of ONE predicate's undirected subgraph —
    ``(node, comp)`` with ``comp`` = the component's minimum node IRI.
    The KG-curation use: cluster CWEs by ``relatedWeakness`` into
    weakness families (the full relationship graph is one giant
    component and carries no cluster signal; a single predicate's
    subgraph does).

    Reuses the distributed min-label CC kernel (explicit hash-partition
    rounds, vectorized per-partition min-merges, fingerprint early
    exit — ``canonicalize.connected_components``); ``max_iters`` bounds
    label flooding at the subgraph diameter. Isolated nodes (no edge
    with this predicate) are absent by definition."""
    from uckg_ray.stages.canonicalize import connected_components

    def filt(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(b.column("pred"), pred_iri),
                       pc.not_equal(b.column("subj"), b.column("obj")))
        t = b.filter(keep)
        return pa.table({"u": t.column("subj"), "v": t.column("obj")})

    pairs = edges.map_batches(filt, batch_format="pyarrow",
                              batch_size=None)
    cc = connected_components(pairs, "u", "v", max_iters=max_iters,
                              num_partitions=num_partitions)
    return cc.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "comp": b.column("label")}),
        batch_format="pyarrow")


def clustering_counts(edges: Dataset,
                      num_partitions: int | None = None) -> Dataset:
    """Per-node triangle participation and wedge capacity over the
    undirected relationship graph — the two integer components of the
    local clustering coefficient ``tri_cnt / wedge_cnt`` (kept as exact
    BIGINTs so the SQL oracle value-hashes match; the float ratio is a
    trivial client-side divide). Output: (node, tri_cnt, wedge_cnt) for
    every node of degree ≥ 2 (wedge_cnt = d·(d−1)/2, always an exact
    integer).

    Scale shape: ONE materialized distinct-pair set feeds both the
    triangle enumeration and the degree count (no second distinct
    exchange); each side collapses to per-block (node, count) partials
    before a single node-keyed Sum groupby; the wedge arithmetic and
    the degree filter are a stateless map after the shuffle."""
    import polars as pl

    from ray.data.aggregate import Sum

    num_partitions = num_partitions or _default_partitions()
    und = undirected_pairs(edges, num_partitions).materialize()
    tris = triangles(edges, num_partitions, und=und)

    _MID = pa.schema([("node", pa.string()), ("tri_cnt", pa.int64()),
                      ("deg", pa.int64())])

    def count_partial(names: list[str], as_tri: bool):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _MID.empty_table()
            nodes = pa.concat_arrays(
                [_cc(batch.column(c)) for c in names])
            t = (pl.DataFrame({"node": pl.from_arrow(nodes)})
                 .group_by("node")
                 .agg(pl.len().cast(pl.Int64).alias("n"))
                 .to_arrow())
            n = t.column("n").cast(pa.int64())
            z = pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            return pa.table({"node": t.column("node").cast(pa.string()),
                             "tri_cnt": n if as_tri else z,
                             "deg": z if as_tri else n})
        return f

    _OUT = pa.schema([("node", pa.string()), ("tri_cnt", pa.int64()),
                      ("wedge_cnt", pa.int64())])

    def final(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OUT.empty_table()
        d = b.column("deg").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = d >= 2
        t = b.filter(pa.array(keep))
        d = d[keep]
        return pa.table({
            "node": t.column("node").cast(pa.string()),
            "tri_cnt": t.column("tri_cnt").cast(pa.int64()),
            "wedge_cnt": pa.array(d * (d - 1) // 2, pa.int64())})

    return (tris.map_batches(count_partial(["a", "b", "c"], True),
                             batch_format="pyarrow", batch_size=None)
            .union(und.map_batches(count_partial(["u", "v"], False),
                                   batch_format="pyarrow",
                                   batch_size=None))
            .groupby("node")
            .aggregate(Sum("tri_cnt", alias_name="tri_cnt"),
                       Sum("deg", alias_name="deg"))
            .map_batches(final, batch_format="pyarrow", batch_size=None))


def reciprocal_pairs(edges: Dataset, num_partitions: int | None = None
                     ) -> Dataset:
    """Reciprocal-edge audit: per predicate, the number of unordered
    node pairs {u, v} where BOTH directed edges (u, p, v) and (v, p, u)
    exist — the graph-integrity check that flags predicates behaving
    symmetrically (modeling smell when the ontology declares them
    directed, candidate `owl:SymmetricProperty` otherwise). Same edge
    filter as ``undirected_pairs``: non-literal, non-rdf:type,
    no self-loops. Output: (pred, n_pairs).

    Scale shape: block-local distinct combiner on (pred, u, v, dir) →
    ONE hash exchange on the (pred, pair) key, where both-direction
    detection and the per-predicate count collapse in-partition →
    tiny Sum groupby on pred (≤ #preds × #partitions rows)."""
    import polars as pl

    from ray.data.aggregate import Sum

    num_partitions = num_partitions or _default_partitions()

    def tag(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.invert(batch.column("obj_is_literal")),
                       pc.and_(pc.not_equal(batch.column("pred"), ns.RDF_TYPE),
                               pc.not_equal(batch.column("subj"),
                                            batch.column("obj"))))
        t = batch.filter(keep)
        u = pc.min_element_wise(t.column("subj"), t.column("obj"))
        v = pc.max_element_wise(t.column("subj"), t.column("obj"))
        fwd = pc.cast(pc.equal(t.column("subj"), u), pa.int64())
        key = pc.binary_join_element_wise(_cc(t.column("pred")),
                                          _cc(u), _cc(v), "\x1f")
        rows = (pa.Table.from_pydict(
                    {"pred": t.column("pred"), "u": u, "v": v,
                     "fwd": fwd, "k": key})
                .group_by(["k", "pred", "u", "v", "fwd"]).aggregate([]))
        return _add_hash_partition(rows, num_partitions)

    _MID = pa.schema([("pred", pa.string()), ("n", pa.int64())])

    def count_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _MID.empty_table()
        df = pl.from_arrow(part.select(["pred", "u", "v", "fwd"]))
        out = (df.group_by("pred", "u", "v")
               .agg(pl.col("fwd").max().alias("f"),
                    (1 - pl.col("fwd")).max().alias("b"))
               .filter((pl.col("f") == 1) & (pl.col("b") == 1))
               .group_by("pred").agg(pl.len().cast(pl.Int64).alias("n")))
        return pa.table({"pred": out["pred"].to_arrow().cast(pa.string()),
                         "n": out["n"].to_arrow()})

    return (edges.map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(
                lambda t: count_part(t.drop_columns(["p", "k"])),
                batch_format="pyarrow")
            .groupby("pred").aggregate(Sum("n", alias_name="n_pairs")))


def predicate_stats(edges: Dataset) -> Dataset:
    """VoID-style per-predicate profile of the canonical edge table:
    ``(pred, n_edges, n_literal_obj, n_distinct_subj,
    n_distinct_obj)`` — the dataset-statistics descriptor a KG
    publisher ships with a graph (VoID property partitions), and the
    cardinality profile that flags functional-property candidates
    (n_distinct_subj ≈ n_edges) and hub objects (n_distinct_obj ≪
    n_edges).

    Two streams, ONE final Sum groupby (≤ |predicates| rows):
    - plain counts: block-local groupby(pred) partials, zero-filled
      distinct columns;
    - distinct counts: block-distinct (pred, side, val) rows → global
      (pred, side, val) distinct — the only data-scale exchange, the
      tf-idf vocabulary shape — → per-block (pred) partial counts with
      zero-filled plain columns.
    Nothing is ever O(edges) on the driver."""
    import polars as pl

    from ray.data.aggregate import Count, Sum

    _OUT = pa.schema([("pred", pa.string()), ("n_edges", pa.int64()),
                      ("n_literal_obj", pa.int64()),
                      ("n_distinct_subj", pa.int64()),
                      ("n_distinct_obj", pa.int64())])

    def count_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OUT.empty_table()
        g = (pl.from_arrow(b.select(["pred", "obj_is_literal"]))
             .group_by("pred")
             .agg(pl.len().cast(pl.Int64).alias("n_edges"),
                  pl.col("obj_is_literal").sum().cast(pl.Int64)
                  .alias("n_literal_obj")))
        n = g.height
        return pa.table({
            "pred": g["pred"].to_arrow().cast(pa.string()),
            "n_edges": g["n_edges"].to_arrow(),
            "n_literal_obj": g["n_literal_obj"].to_arrow(),
            "n_distinct_subj": pa.nulls(n, pa.int64()).fill_null(0),
            "n_distinct_obj": pa.nulls(n, pa.int64()).fill_null(0)})

    _SIDES = pa.schema([("pred", pa.string()), ("side", pa.int8()),
                        ("val", pa.string())])

    def side_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _SIDES.empty_table()
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        u = pl.concat([
            df.select("pred", val="subj").with_columns(
                side=pl.lit(0, pl.Int8)),
            df.select("pred", val="obj").with_columns(
                side=pl.lit(1, pl.Int8)),
        ]).unique()
        return pa.table({
            "pred": u["pred"].to_arrow().cast(pa.string()),
            "side": u["side"].to_arrow(),
            "val": u["val"].to_arrow().cast(pa.string())})

    def distinct_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "pred" not in b.column_names:
            return _OUT.empty_table()
        g = (pl.from_arrow(b.select(["pred", "side"]))
             .group_by("pred")
             .agg((pl.col("side") == 0).sum().cast(pl.Int64)
                  .alias("n_distinct_subj"),
                  (pl.col("side") == 1).sum().cast(pl.Int64)
                  .alias("n_distinct_obj")))
        n = g.height
        return pa.table({
            "pred": g["pred"].to_arrow().cast(pa.string()),
            "n_edges": pa.nulls(n, pa.int64()).fill_null(0),
            "n_literal_obj": pa.nulls(n, pa.int64()).fill_null(0),
            "n_distinct_subj": g["n_distinct_subj"].to_arrow(),
            "n_distinct_obj": g["n_distinct_obj"].to_arrow()})

    counts = edges.map_batches(count_partial, batch_format="pyarrow",
                               batch_size=None)
    distincts = (edges.map_batches(side_partial, batch_format="pyarrow",
                                   batch_size=None)
                 .groupby(["pred", "side", "val"])
                 .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
                 .map_batches(distinct_partial, batch_format="pyarrow",
                              batch_size=None))
    return (counts.union(distincts)
            .groupby("pred")
            .aggregate(Sum("n_edges", alias_name="n_edges"),
                       Sum("n_literal_obj", alias_name="n_literal_obj"),
                       Sum("n_distinct_subj",
                           alias_name="n_distinct_subj"),
                       Sum("n_distinct_obj",
                           alias_name="n_distinct_obj")))


def degree_histogram(edges: Dataset) -> Dataset:
    """Frequency-of-degrees profile of the canonical edge table:
    (degree, n_nodes) with degree = out-degree over DISTINCT edges
    (same node definition as ``kg_degree_topk``) — the graph-shape
    Zipf sanity check that surfaces hub explosions before they skew a
    downstream shuffle.

    Two bounded shuffles, nothing O(edges) on the driver: block-local
    subj value_counts is the combiner for the per-node degree Sum
    (shuffle 1, ≤ #distinct-subjects rows), then block-local degree
    value_counts feeds the tiny (degree → n_nodes) Sum (shuffle 2,
    ≤ #distinct-degrees rows)."""
    from ray.data.aggregate import Sum

    def subj_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"subj": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64())})
        col = b.column("subj")
        vc = pc.value_counts(col.combine_chunks()
                             if isinstance(col, pa.ChunkedArray) else col)
        return pa.table({"subj": vc.field("values"),
                         "d": vc.field("counts")})

    def deg_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "d" not in b.schema.names:
            return pa.table({"degree": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vc = pc.value_counts(b.column("d").combine_chunks()
                             if isinstance(b.column("d"), pa.ChunkedArray)
                             else b.column("d"))
        return pa.table({"degree": vc.field("values").cast(pa.int64()),
                         "n": vc.field("counts")})

    return (edges.select_columns(["subj"])
            .map_batches(subj_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("subj").aggregate(Sum("d", alias_name="d"))
            .map_batches(deg_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("degree").aggregate(Sum("n", alias_name="n_nodes")))


def class_sizes(edges: Dataset) -> Dataset:
    """VoID class-partition sizes: instances per class over the
    canonical edge table — (class_iri, n_instances) from the
    ``rdf:type`` edges. Edges are already (s,p,o)-distinct, so the
    per-class row count IS the distinct-subject count; block-local
    value_counts is the combiner into a ≤ #classes Sum groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"class_iri": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        f = b.filter(pc.equal(b.column("pred"), ns.RDF_TYPE))
        col = f.column("obj")
        vc = pc.value_counts(col.combine_chunks()
                             if isinstance(col, pa.ChunkedArray) else col)
        return pa.table({"class_iri": vc.field("values"),
                         "n": vc.field("counts")})

    return (edges.select_columns(["pred", "obj"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("class_iri")
            .aggregate(Sum("n", alias_name="n_instances")))


def untyped_nodes(edges: Dataset) -> Dataset:
    """KG hygiene audit: subjects that never receive an ``rdf:type``
    edge — the orphan-node check a loader runs before shipping a
    graph (untyped nodes break class-partitioned consumers). One
    bounded exchange: block-local distinct (subj, is_typed) pairs are
    the combiner, a per-subject Max collapses them, and the untyped
    survivors filter out vectorized. Output: (subj) rows."""
    import pandas as pd

    from ray.data.aggregate import Max

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"subj": pa.array([], pa.string()),
                             "t": pa.array([], pa.int64())})
        typed = pc.equal(b.column("pred"), ns.RDF_TYPE)
        df = pd.DataFrame({
            "subj": b.column("subj").to_pandas(),
            "t": typed.to_pandas().astype("int64")})
        g = df.groupby("subj", sort=False)["t"].max().reset_index()
        return pa.table({"subj": pa.array(g["subj"].tolist(),
                                          pa.string()),
                         "t": pa.array(g["t"].to_numpy(np.int64),
                                       pa.int64())})

    def keep_untyped(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "t" not in b.schema.names:
            return pa.table({"subj": pa.array([], pa.string())})
        f = b.filter(pc.equal(b.column("t"), 0))
        return pa.table({"subj": f.column("subj").cast(pa.string())})

    return (edges.select_columns(["subj", "pred"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("subj").aggregate(Max("t", alias_name="t"))
            .map_batches(keep_untyped, batch_format="pyarrow",
                         batch_size=None))


def comention_lift(mentions: Dataset, *, min_pairs: int = 2,
                   broadcast_max: int = 5_000_000,
                   num_partitions: int | None = None) -> Dataset:
    """Entity co-mention association over the transcript mention
    stream: for every entity pair appearing together in ≥ ``min_pairs``
    conversations, the exact integer lift ratio
    ``lift_ppm = n_ab · n_convs · 10⁶ // (n_a · n_b)`` (> 10⁶ means the
    pair co-occurs more than independent mention rates predict) — the
    edge-weighting signal a KG-construction pass uses to prune
    coincidental co-mentions before emitting relatedTo edges.
    Output: (ent_a, ent_b, n_ab, n_a, n_b, lift_ppm), ent_a < ent_b.

    Distributed shape: the distinct (conv, ent) incidence set is
    reduced in-block, co-located by ONE conv-hash exchange and
    MATERIALIZED once (bounded: distinct mentions, far below turn
    count) so pairs, per-entity counts and the conv count all derive
    from a single extraction pass; per-conv pairs explode only within
    a partition task (fan-out ≤ per-conv distinct entities, a small
    set by construction); pair counts flow through one packed-key
    groupby; the conv count folds from per-block distinct-conv
    partials (convs are partition-disjoint after the exchange, so no
    extra shuffle); per-entity counts attach to the ≥ min_pairs
    survivors by broadcast when the entity vocabulary is small
    (≤ ``broadcast_max`` rows), else by a string-keyed co-partition
    union join (two bounded exchanges of the pair table) — a
    forced-path test pins both variants to identical output."""
    import polars as pl

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    def incidence(b: pa.Table) -> pa.Table:
        t = (pl.from_arrow(b.select(["conv_id", "ent_id"]))
             .unique().to_arrow())
        return _add_hash_partition(
            t.cast(pa.schema([("conv_id", pa.string()),
                              ("ent_id", pa.string())])),
            num_partitions, col="conv_id")

    def part_distinct(part: pa.Table) -> pa.Table:
        return (pl.from_arrow(part.select(["conv_id", "ent_id"]))
                .unique().to_arrow()
                .cast(pa.schema([("conv_id", pa.string()),
                                 ("ent_id", pa.string())])))

    # one extraction pass feeds pairs, entity counts and the conv count
    inc = (mentions.map_batches(incidence, batch_format="pyarrow",
                                batch_size=None)
           .groupby("p").map_groups(
               lambda t: part_distinct(t.drop_columns(["p"])),
               batch_format="pyarrow")
           .materialize())

    # convs are disjoint across the materialized partition blocks, so
    # per-block distinct-conv counts sum to the exact global count
    n_convs = sum(
        r["nc"] for r in inc.map_batches(
            lambda b: pa.table({"nc": pa.array(
                [pa.compute.count_distinct(b.column("conv_id"))
                 .as_py() if b.num_rows else 0], pa.int64())}),
            batch_format="pyarrow", batch_size=None).take_all())

    def pair_partial(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        j = df.join(df, on="conv_id", suffix="_r")
        j = (j.filter(pl.col("ent_id") < pl.col("ent_id_r"))
             .group_by("ent_id", "ent_id_r").len()
             .with_columns((pl.col("ent_id") + "\x1f"
                            + pl.col("ent_id_r")).alias("k"))
             .select(["k", pl.col("len").cast(pl.Int64).alias("n")]))
        t = j.to_arrow().cast(pa.schema([("k", pa.string()),
                                         ("n", pa.int64())]))
        return _add_hash_partition(t, num_partitions, col="k")

    def pair_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"k": pa.array([], pa.string()),
                             "n_ab": pa.array([], pa.int64())})
        out = (pl.from_arrow(part.select(["k", "n"]))
               .group_by("k").agg(pl.col("n").sum().alias("n_ab")))
        return out.to_arrow().cast(pa.schema([("k", pa.string()),
                                              ("n_ab", pa.int64())]))

    # explicit hash-partition + per-partition polars fold instead of
    # groupby(k).aggregate: Ray's sort-based aggregate would sort the
    # full pair stream by LONG string keys (measured 69 s of an 86 s
    # run at sf0.1); partitioning on the int32 bucket cuts that to the
    # shuffle itself
    pairs = (inc.map_batches(pair_partial, batch_format="pyarrow",
                             batch_size=None)
             .groupby("p").map_groups(
                 lambda t: pair_fold(t.drop_columns(["p"])),
                 batch_format="pyarrow"))

    def ent_partial(b: pa.Table) -> pa.Table:
        t = (pl.from_arrow(b).group_by("ent_id").len()
             .select([pl.col("ent_id"),
                      pl.col("len").cast(pl.Int64).alias("n")])
             .to_arrow().cast(pa.schema([("ent_id", pa.string()),
                                         ("n", pa.int64())])))
        return _add_hash_partition(t, num_partitions, col="ent_id")

    def ent_fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"ent_id": pa.array([], pa.string()),
                             "n_ent": pa.array([], pa.int64())})
        out = (pl.from_arrow(part.select(["ent_id", "n"]))
               .group_by("ent_id").agg(pl.col("n").sum()
                                       .alias("n_ent")))
        return out.to_arrow().cast(pa.schema([("ent_id", pa.string()),
                                              ("n_ent", pa.int64())]))

    ent_counts = (inc.map_batches(ent_partial, batch_format="pyarrow",
                                  batch_size=None)
                  .groupby("p").map_groups(
                      lambda t: ent_fold(t.drop_columns(["p"])),
                      batch_format="pyarrow"))

    _PAIR = pa.schema([("ent_a", pa.string()), ("ent_b", pa.string()),
                       ("n_ab", pa.int64())])

    def unpack_filter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_ab" not in b.schema.names:
            return _PAIR.empty_table()
        import pyarrow.compute as pc
        b = b.filter(pc.greater_equal(b.column("n_ab"), min_pairs))
        ks = [s.split("\x1f", 1) for s in b.column("k").to_pylist()]
        return pa.table({
            "ent_a": pa.array([x[0] for x in ks], pa.string()),
            "ent_b": pa.array([x[1] for x in ks], pa.string()),
            "n_ab": b.column("n_ab").cast(pa.int64())})

    surv = pairs.map_batches(unpack_filter, batch_format="pyarrow",
                             batch_size=None)

    def attach(stream: Dataset, key: str, out: str,
               schema: pa.Schema) -> Dataset:
        """String-keyed unique-lookup co-partition join: union the pair
        stream (side 0) with the (ent_id, n_ent) state (side 1), hash-
        partition on the key, resolve per partition with one polars
        join."""
        out_schema = pa.schema(list(schema) + [pa.field(out, pa.int64())])

        def prep_pairs(b: pa.Table) -> pa.Table:
            cols = {c: b.column(c) for c in schema.names}
            cols["_n"] = pa.nulls(b.num_rows, pa.int64())
            cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8),
                                     pa.int8())
            return _add_hash_partition(pa.table(cols), num_partitions,
                                       col=key)

        def prep_state(b: pa.Table) -> pa.Table:
            cols = {}
            for c in schema.names:
                if c == key:
                    cols[c] = b.column("ent_id").cast(pa.string())
                else:
                    cols[c] = pa.nulls(b.num_rows, schema.field(c).type)
            cols["_n"] = b.column("n_ent").cast(pa.int64())
            cols["_side"] = pa.array(np.ones(b.num_rows, np.int8),
                                     pa.int8())
            return _add_hash_partition(pa.table(cols), num_partitions,
                                       col=key)

        def resolve(part: pa.Table) -> pa.Table:
            if part.num_rows == 0 or "_side" not in part.column_names:
                return out_schema.empty_table()
            df = pl.from_arrow(part)
            pr = df.filter(pl.col("_side") == 0)
            st = (df.filter(pl.col("_side") == 1)
                  .select([pl.col(key),
                           pl.col("_n").alias(out)]))
            if pr.height == 0:
                return out_schema.empty_table()
            j = pr.select(schema.names).join(st, on=key, how="inner")
            return j.select(out_schema.names).to_arrow() \
                .cast(out_schema)

        u = (stream.map_batches(prep_pairs, batch_format="pyarrow",
                                batch_size=None)
             .union(ent_counts.map_batches(prep_state,
                                           batch_format="pyarrow",
                                           batch_size=None)))
        return u.groupby("p").map_groups(
            lambda t: resolve(t.drop_columns(["p"])),
            batch_format="pyarrow")

    # one pass over the (bounded) count table decides the path: build
    # the broadcast map until it would exceed broadcast_max, then bail
    # to the shuffle join — no separate count() execution
    import ray

    ent_counts = ent_counts.materialize()
    cmap: dict | None = {}
    for cb in ent_counts.iter_batches(batch_format="pyarrow"):
        cmap.update(zip(cb.column("ent_id").to_pylist(),
                        cb.column("n_ent").to_pylist()))
        if len(cmap) > broadcast_max:
            cmap = None
            break
    if cmap is not None:
        # vocabulary is small: ship the count map once (ray.put) and
        # gather both sides in ONE vectorized pass — saves two full
        # exchanges of the pair table
        cref = ray.put(cmap)

        def gather(b: pa.Table) -> pa.Table:
            m = ray.get(cref)
            na = [m[x] for x in b.column("ent_a").to_pylist()]
            nb = [m[x] for x in b.column("ent_b").to_pylist()]
            return (b.append_column("n_a", pa.array(na, pa.int64()))
                    .append_column("n_b", pa.array(nb, pa.int64())))

        with_b = surv.map_batches(gather, batch_format="pyarrow",
                                  batch_size=None)
    else:   # scale path — forced in tests via broadcast_max=0
        with_a = attach(surv, "ent_a", "n_a", _PAIR)
        with_b = attach(with_a, "ent_b", "n_b",
                        pa.schema(list(_PAIR) + [pa.field("n_a",
                                                          pa.int64())]))

    def lift(b: pa.Table) -> pa.Table:
        na = b.column("n_a").to_numpy(zero_copy_only=False)
        nb = b.column("n_b").to_numpy(zero_copy_only=False)
        nab = b.column("n_ab").to_numpy(zero_copy_only=False)
        ppm = (nab.astype(object) * n_convs * 1_000_000) // \
            (na.astype(object) * nb.astype(object))
        return b.append_column(
            "lift_ppm", pa.array([int(x) for x in ppm], pa.int64()))

    return with_b.map_batches(lift, batch_format="pyarrow",
                              batch_size=None)


def characteristic_sets(edges: Dataset,
                        num_partitions: int | None = None) -> Dataset:
    """Characteristic sets (Neumann & Moerkotte, ICDE'11): the number
    of subjects sharing each distinct predicate SET — the cardinality
    statistic RDF query optimizers build over the dump, and the
    structural profile that detects schema drift between graph
    snapshots. Output: (char_set, n_subjects) with char_set the
    ';;'-joined sorted distinct predicates of a subject.

    Scale shape: block-local distinct (subj, pred) pairs are the
    combiner; ONE subj-hash exchange co-locates each subject's
    predicate set; the partition task folds sets into per-partition
    (char_set → count) partials so the final Sum groupby sees at most
    one row per distinct set per partition — subjects never leave
    their partition."""
    import polars as pl

    from ray.data.aggregate import Sum

    if num_partitions is None:
        from uckg_ray.config import default_num_partitions
        num_partitions = default_num_partitions()

    def partial(b: pa.Table) -> pa.Table:
        t = (pl.from_arrow(b.select(["subj", "pred"])).unique()
             .to_arrow().cast(pa.schema([("subj", pa.string()),
                                         ("pred", pa.string())])))
        return _add_hash_partition(t, num_partitions, col="subj")

    def fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"char_set": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        out = (pl.from_arrow(part.select(["subj", "pred"]))
               .unique()
               .group_by("subj")
               .agg(pl.col("pred").sort().str.join(";;")
                    .alias("char_set"))
               .group_by("char_set")
               .agg(pl.len().cast(pl.Int64).alias("n")))
        return out.to_arrow().cast(pa.schema([
            ("char_set", pa.string()), ("n", pa.int64())]))

    return (edges.select_columns(["subj", "pred"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("p").map_groups(
                lambda t: fold(t.drop_columns(["p"])),
                batch_format="pyarrow")
            .groupby("char_set").aggregate(Sum("n",
                                               alias_name="n_subjects")))


def dangling_refs(edges: Dataset) -> Dataset:
    """Referential-integrity audit: non-literal objects of relationship
    edges (``pred != rdf:type``) that never occur as a subject —
    dangling references a loader must stub or reject before handing
    the graph to traversal consumers. Output: (obj, n_refs) with the
    number of distinct edges pointing at each dangling node.

    Scale shape: one bounded exchange — block-local partials emit
    (node, ref-count, is-subj flag) rows collapsed per block, a
    per-node Sum/Max groupby merges them, and the survivors filter
    vectorized. Text/literal payloads never shuffle."""
    import pandas as pd

    from ray.data.aggregate import Max, Sum

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"node": pa.array([], pa.string()),
                             "n_refs": pa.array([], pa.int64()),
                             "is_subj": pa.array([], pa.int64())})
        ref_mask = pc.and_(
            pc.invert(b.column("obj_is_literal").combine_chunks()
                      if isinstance(b.column("obj_is_literal"),
                                    pa.ChunkedArray)
                      else b.column("obj_is_literal")),
            pc.not_equal(b.column("pred"), ns.RDF_TYPE))
        refs = (pd.Series(b.filter(ref_mask).column("obj").to_pandas())
                .value_counts())
        subs = pd.Series(b.column("subj").to_pandas()).drop_duplicates()
        out = pd.DataFrame({
            "node": np.concatenate([refs.index.to_numpy(),
                                    subs.to_numpy()]),
            "n_refs": np.concatenate([
                refs.to_numpy(np.int64),
                np.zeros(len(subs), np.int64)]),
            "is_subj": np.concatenate([
                np.zeros(len(refs), np.int64),
                np.ones(len(subs), np.int64)])})
        return pa.Table.from_pandas(out, preserve_index=False)

    def keep_dangling(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_refs" not in b.schema.names:
            return pa.table({"obj": pa.array([], pa.string()),
                             "n_refs": pa.array([], pa.int64())})
        f = b.filter(pc.and_(pc.equal(b.column("is_subj"), 0),
                             pc.greater(b.column("n_refs"), 0)))
        return pa.table({"obj": f.column("node").cast(pa.string()),
                         "n_refs": f.column("n_refs").cast(pa.int64())})

    return (edges.select_columns(["subj", "pred", "obj",
                                  "obj_is_literal"])
            .map_batches(partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("node")
            .aggregate(Sum("n_refs", alias_name="n_refs"),
                       Max("is_subj", alias_name="is_subj"))
            .map_batches(keep_dangling, batch_format="pyarrow",
                         batch_size=None))


def star_query(edges: Dataset,
               patterns: list[tuple[str, str | None]]) -> Dataset:
    """SPARQL-style star basic-graph-pattern match: subjects satisfying
    ALL ``k`` patterns ``(pred, obj)`` — a bound object IRI/literal, or
    ``None`` for "any object" (``?var``). The workhorse lookup shape of
    a KG query engine (``SELECT ?s WHERE { ?s p1 o1 . ?s p2 ?x . … }``)
    expressed Ray-Data-first.

    Plan: one scan filters the edge stream to the k patterns and tags
    the pattern index (block-local distinct ``(subj, idx)`` combiner),
    then two vocabulary-bounded exchanges: a global ``(subj, idx)``
    distinct followed by a per-subject Count — a subject matches iff
    its distinct pattern count equals k. Everything past the scan is
    bounded by matches × k, never by the edge count."""
    import polars as pl
    from ray.data.aggregate import Count

    k = len(patterns)
    if k == 0:
        raise ValueError("star_query needs at least one pattern")
    _TAG = pa.schema([("subj", pa.string()), ("idx", pa.int32())])

    preds = [p for p, _ in patterns]
    objs = [o for _, o in patterns]

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _TAG.empty_table()
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        parts = []
        for i, (p, o) in enumerate(zip(preds, objs)):
            m = df.filter(
                (pl.col("pred") == p)
                & ((pl.col("obj") == o) if o is not None else pl.lit(True)))
            if m.height:
                parts.append(m.select(
                    "subj", idx=pl.lit(i, pl.Int32)))
        if not parts:
            return _TAG.empty_table()
        u = pl.concat(parts).unique()
        return pa.table({"subj": u["subj"].to_arrow().cast(pa.string()),
                         "idx": u["idx"].to_arrow()})

    def keep_full(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n" not in b.schema.names:
            return pa.table({"subj": pa.array([], pa.string())})
        f = b.filter(pc.equal(b.column("n"), k))
        return pa.table({"subj": f.column("subj").cast(pa.string())})

    return (edges.select_columns(["subj", "pred", "obj"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby(["subj", "idx"])
            .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
            .groupby("subj")
            .aggregate(Count(alias_name="n"))
            .map_batches(keep_full, batch_format="pyarrow",
                         batch_size=None))


def shacl_min_counts(edges: Dataset,
                     rules: list[tuple[str, str, str, int]]) -> Dataset:
    """SHACL-style ``sh:minCount`` shape validation: for each rule
    ``(shape_id, target_class_iri, path_pred, min_count)``, report the
    focus nodes typed ``target_class`` whose distinct ``path_pred``
    value count is below ``min_count`` — the constraint report a KG
    publisher runs before release (the reference's ontology carries
    the analogous owl:minQualifiedCardinality axioms; see
    ``entail_min1_restrictions``). Output: one violation row
    ``(shape, focus, n_values)`` per failing focus node.

    Plan (mirrors ``dangling_refs``): one scan emits two tagged
    streams — target membership rows and block-distinct
    ``(shape, focus, value)`` rows; a global distinct collapses value
    multiplicity, per-block partials count values, and ONE final
    ``(shape, focus)`` groupby merges ``Sum(n_values) / Max(is_target)``.
    Everything past the scan is bounded by targets + distinct values,
    never the edge count."""
    import polars as pl
    from ray.data.aggregate import Count, Max, Sum

    mins = {sid: m for sid, _, _, m in rules}
    _ROW = pa.schema([("shape", pa.string()), ("focus", pa.string()),
                      ("n_values", pa.int64()), ("is_target", pa.int8())])
    _VAL = pa.schema([("shape", pa.string()), ("focus", pa.string()),
                      ("val", pa.string())])

    def targets(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _ROW.empty_table()
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        parts = []
        for sid, cls, _, _ in rules:
            m = df.filter((pl.col("pred") == ns.RDF_TYPE)
                          & (pl.col("obj") == cls))
            if m.height:
                parts.append(m.select(focus="subj")
                             .with_columns(shape=pl.lit(sid)).unique())
        if not parts:
            return _ROW.empty_table()
        u = pl.concat(parts)
        n = u.height
        return pa.table({"shape": u["shape"].to_arrow().cast(pa.string()),
                         "focus": u["focus"].to_arrow().cast(pa.string()),
                         "n_values": pa.nulls(n, pa.int64()).fill_null(0),
                         "is_target": pa.nulls(n, pa.int8()).fill_null(1)})

    def values(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _VAL.empty_table()
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        parts = []
        for sid, _, pred, _ in rules:
            m = df.filter(pl.col("pred") == pred)
            if m.height:
                parts.append(m.select(focus="subj", val="obj")
                             .with_columns(shape=pl.lit(sid))
                             .select("shape", "focus", "val").unique())
        if not parts:
            return _VAL.empty_table()
        u = pl.concat(parts)
        return pa.table({"shape": u["shape"].to_arrow().cast(pa.string()),
                         "focus": u["focus"].to_arrow().cast(pa.string()),
                         "val": u["val"].to_arrow().cast(pa.string())})

    def count_vals(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "val" not in b.column_names:
            return _ROW.empty_table()
        g = (pl.from_arrow(b.select(["shape", "focus"]))
             .group_by(["shape", "focus"])
             .agg(pl.len().cast(pl.Int64).alias("n_values")))
        n = g.height
        return pa.table({"shape": g["shape"].to_arrow().cast(pa.string()),
                         "focus": g["focus"].to_arrow().cast(pa.string()),
                         "n_values": g["n_values"].to_arrow(),
                         "is_target": pa.nulls(n, pa.int8()).fill_null(0)})

    def violations(b: pa.Table) -> pa.Table:
        out = pa.schema([("shape", pa.string()), ("focus", pa.string()),
                         ("n_values", pa.int64())])
        if b.num_rows == 0 or "is_target" not in b.schema.names:
            return out.empty_table()
        df = pl.from_arrow(b).filter(pl.col("is_target") == 1)
        df = df.filter(pl.col("n_values")
                       < pl.col("shape").replace_strict(mins,
                                                        return_dtype=pl.Int64))
        return pa.table({"shape": df["shape"].to_arrow().cast(pa.string()),
                         "focus": df["focus"].to_arrow().cast(pa.string()),
                         "n_values": df["n_values"].to_arrow()})

    src = edges.select_columns(["subj", "pred", "obj"])
    t = src.map_batches(targets, batch_format="pyarrow", batch_size=None)
    v = (src.map_batches(values, batch_format="pyarrow", batch_size=None)
         .groupby(["shape", "focus", "val"])
         .aggregate(Count(alias_name="_c")).drop_columns(["_c"])
         .map_batches(count_vals, batch_format="pyarrow", batch_size=None))
    return (t.union(v)
            .groupby(["shape", "focus"])
            .aggregate(Sum("n_values", alias_name="n_values"),
                       Max("is_target", alias_name="is_target"))
            .map_batches(violations, batch_format="pyarrow",
                         batch_size=None))


def class_property_fill(edges: Dataset,
                        num_partitions: int | None = None) -> Dataset:
    """KG completeness profile: for every (class, predicate) pair the
    number of class members that carry at least one such property —
    joined against ``class_sizes`` this is the per-class property
    fill-rate matrix a KG publisher reads before release (the soft
    sibling of the hard ``shacl_min_counts`` constraints, and the
    per-class refinement of ``characteristic_sets``).

    One scan emits block-distinct tagged (subj, class) / (subj, pred)
    rows; a subject-keyed co-partition joins them per partition
    (classes × predicates per subject is small); one final
    (class, pred)-bounded Sum merge. Exchanges are node-bounded, never
    edge-bounded."""
    import polars as pl
    from ray.data.aggregate import Sum

    n_parts = num_partitions or _default_partitions()
    _TAG = pa.schema([("subj", pa.string()), ("kind", pa.int8()),
                      ("val", pa.string()), ("p", pa.int32())])

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _TAG.empty_table()
        df = pl.from_arrow(b.select(["subj", "pred", "obj"]))
        ty = (df.filter(pl.col("pred") == ns.RDF_TYPE)
              .select("subj", val="obj")
              .with_columns(kind=pl.lit(0, pl.Int8)).unique())
        pr = (df.filter(pl.col("pred") != ns.RDF_TYPE)
              .select("subj", val="pred")
              .with_columns(kind=pl.lit(1, pl.Int8)).unique())
        u = pl.concat([ty, pr]).with_columns(
            p=(pl.col("subj").hash(seed=0) % n_parts).cast(pl.Int32))
        return u.select(["subj", "kind", "val", "p"]).to_arrow().cast(_TAG)

    _OUT = pa.schema([("cls", pa.string()), ("pred", pa.string()),
                      ("n_subjects", pa.int64())])

    def join_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(["subj", "kind", "val"])).unique()
        ty = df.filter(pl.col("kind") == 0).select("subj", cls="val")
        pr = df.filter(pl.col("kind") == 1).select("subj", pred="val")
        g = (ty.join(pr, on="subj", how="inner")
             .group_by(["cls", "pred"])
             .agg(pl.len().cast(pl.Int64).alias("n_subjects")))
        return g.select(["cls", "pred", "n_subjects"]).to_arrow().cast(_OUT)

    return (edges.select_columns(["subj", "pred", "obj"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("p")
            .map_groups(lambda t: join_partition(t.drop_columns(["p"])),
                        batch_format="pyarrow")
            .groupby(["cls", "pred"])
            .aggregate(Sum("n_subjects", alias_name="n_subjects")))


def negative_samples(edges: Dataset,
                     num_partitions: int | None = None) -> Dataset:
    """Deterministic negative sampling for KG-embedding training
    (TransE-family corrupted triples): for every non-literal,
    non-rdf:type edge (s, p, o), emit (s, p, o, o_neg) where ``o_neg``
    is the NEXT distinct object of the same predicate in the cyclic
    md5 order — a type-compatible corruption (same-predicate objects
    share a range) that both engines order identically, with no RNG to
    reconcile. Predicates with a single distinct object yield no
    negative (o_neg would equal o).

    Two bounded exchanges: (1) block-distinct (pred, obj) rows
    partition by predicate; each partition sorts its predicates'
    object vocabularies once (md5 per DISTINCT object only) and emits
    the cyclic-successor map; (2) the successor map re-keys by
    (pred, obj) and co-partitions with the edge stream — fine-grained
    keys, so a hot predicate spreads across partitions instead of
    funneling one."""
    import hashlib

    import polars as pl

    n_parts = num_partitions or _default_partitions()

    def _rel(df: "pl.DataFrame") -> "pl.DataFrame":
        return df.filter((pl.col("pred") != ns.RDF_TYPE)
                         & ~pl.col("obj_is_literal"))

    _OBJ = pa.schema([("pred", pa.string()), ("obj", pa.string()),
                      ("p", pa.int32())])

    def obj_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _OBJ.empty_table()
        u = (_rel(pl.from_arrow(b.select(["pred", "obj",
                                          "obj_is_literal"])))
             .select("pred", "obj").unique()
             .with_columns(p=(pl.col("pred").hash(seed=0) % n_parts)
                           .cast(pl.Int32)))
        return u.select(["pred", "obj", "p"]).to_arrow().cast(_OBJ)

    _ROW = pa.schema([("pred", pa.string()), ("obj", pa.string()),
                      ("subj", pa.string()), ("neg", pa.string()),
                      ("side", pa.int8()), ("q", pa.int32())])

    def succ_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _ROW.empty_table()
        df = pl.from_arrow(part.select(["pred", "obj"])).unique()
        objs = df["obj"].to_list()
        dmap = {o: hashlib.md5(o.encode()).hexdigest()
                for o in set(objs)}
        df = (df.with_columns(
                  h=pl.Series([dmap[o] for o in objs]))
              .sort(["pred", "h", "obj"])
              .with_columns(
                  neg=pl.col("obj").shift(-1).over("pred")
                  .fill_null(pl.col("obj").first().over("pred"))))
        n = df.height
        out = pa.table({
            "pred": df["pred"].to_arrow().cast(pa.string()),
            "obj": df["obj"].to_arrow().cast(pa.string()),
            "subj": pa.nulls(n, pa.string()),
            "neg": df["neg"].to_arrow().cast(pa.string()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "q": pa.array(np.zeros(n, np.int32), pa.int32())})
        return _retag(out)

    def _retag(t: pa.Table) -> pa.Table:
        import polars as pl2
        key = pl2.from_arrow(t.column("pred").combine_chunks()) \
            + "\x1f" + pl2.from_arrow(t.column("obj").combine_chunks())
        q = (key.hash(seed=0) % n_parts).cast(pl2.Int32).to_numpy()
        return t.set_column(t.schema.get_field_index("q"), "q",
                            pa.array(q, pa.int32()))

    def edge_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _ROW.empty_table()
        df = _rel(pl.from_arrow(b.select(["subj", "pred", "obj",
                                          "obj_is_literal"])))
        n = df.height
        out = pa.table({
            "pred": df["pred"].to_arrow().cast(pa.string()),
            "obj": df["obj"].to_arrow().cast(pa.string()),
            "subj": df["subj"].to_arrow().cast(pa.string()),
            "neg": pa.nulls(n, pa.string()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "q": pa.array(np.zeros(n, np.int32), pa.int32())})
        return _retag(out)

    _FIN = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                      ("obj", pa.string()), ("obj_neg", pa.string())])

    def join_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _FIN.empty_table()
        df = pl.from_arrow(part.select(["pred", "obj", "subj", "neg",
                                        "side"]))
        succ = df.filter(pl.col("side") == 1).select("pred", "obj", "neg")
        e = df.filter(pl.col("side") == 0).select("subj", "pred", "obj")
        out = (e.join(succ, on=["pred", "obj"], how="inner")
               .filter(pl.col("neg") != pl.col("obj"))
               .select("subj", "pred", "obj",
                       obj_neg="neg"))
        return out.to_arrow().cast(_FIN)

    src = edges.select_columns(["subj", "pred", "obj", "obj_is_literal"])
    succ = (src.map_batches(obj_partial, batch_format="pyarrow",
                            batch_size=None)
            .groupby("p")
            .map_groups(lambda t: succ_partition(t.drop_columns(["p"])),
                        batch_format="pyarrow"))
    e = src.map_batches(edge_rows, batch_format="pyarrow",
                        batch_size=None)
    return (e.union(succ)
            .groupby("q")
            .map_groups(join_partition, batch_format="pyarrow"))


def predicate_cooccurrence(edges: Dataset,
                           num_partitions: int | None = None) -> Dataset:
    """Schema-graph discovery: for every unordered predicate pair
    (pred_a < pred_b), the number of subjects carrying BOTH — the
    pairwise relaxation of ``characteristic_sets`` (which groups by
    the exact set) and the statistic a query planner / ontology
    curator reads to find predicates that always travel together.

    Block-distinct (subj, pred) rows → one subject-keyed exchange →
    per-partition per-subject pair expansion (bounded by
    preds-per-subject², predicates are a small vocabulary) → one
    pair-bounded Sum merge."""
    import polars as pl
    from ray.data.aggregate import Sum

    n_parts = num_partitions or _default_partitions()
    _SP = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                     ("p", pa.int32())])

    def tag(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _SP.empty_table()
        u = (pl.from_arrow(b.select(["subj", "pred"])).unique()
             .with_columns(p=(pl.col("subj").hash(seed=0) % n_parts)
                           .cast(pl.Int32)))
        return u.select(["subj", "pred", "p"]).to_arrow().cast(_SP)

    _OUT = pa.schema([("pred_a", pa.string()), ("pred_b", pa.string()),
                      ("n_subjects", pa.int64())])

    def pairs_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = pl.from_arrow(part.select(["subj", "pred"])).unique()
        g = (df.join(df, on="subj")
             .filter(pl.col("pred") < pl.col("pred_right"))
             .group_by(["pred", "pred_right"])
             .agg(pl.len().cast(pl.Int64).alias("n_subjects"))
             .rename({"pred": "pred_a", "pred_right": "pred_b"}))
        return g.select(["pred_a", "pred_b", "n_subjects"]) \
            .to_arrow().cast(_OUT)

    return (edges.select_columns(["subj", "pred"])
            .map_batches(tag, batch_format="pyarrow", batch_size=None)
            .groupby("p")
            .map_groups(lambda t: pairs_partition(t.drop_columns(["p"])),
                        batch_format="pyarrow")
            .groupby(["pred_a", "pred_b"])
            .aggregate(Sum("n_subjects", alias_name="n_subjects")))
