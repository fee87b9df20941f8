"""Graph-analytics operators over the materialized KG edge table.

``triangles``: enumerate (a < b < c) node triangles in the undirected
relationship graph (non-literal, non-rdf:type edges; type edges link
everything to a handful of class hubs and would drown the relationship
structure in hub wedges).

Distributed shape — two explicit hash-partition rounds, no Dataset.join
(robust to empty partitions, vectorized pandas merges inside the
partition tasks):

1. undirected distinct pairs (u < v) via pair-key hash partition;
2. wedge round: every edge (u,v) contributes u as a lo-neighbor of
   center v and v as a hi-neighbor of center u; partition by center,
   cross lo×hi per center → candidate (a, c, center) wedges;
3. closure round: wedge candidates ∪ edge rows partitioned by the
   (a, c) pair key; a wedge survives iff its closing edge co-locates.

Wedge volume is Σ_m lo(m)·hi(m) — bounded by excluding the type hubs;
for skewed relationship hubs, salt the wedge stage by hashing the lo
side (same trick as canonicalize._add_cc_partition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from uckg_ray import namespaces as ns

_PAIR_SCHEMA = pa.schema([("u", pa.string()), ("v", pa.string())])
_TRI_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string()),
                         ("c", pa.string())])


def _hash_mod(values: pa.Array | pa.ChunkedArray, mod: int) -> np.ndarray:
    import polars as pl
    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    return (pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)
            % np.uint64(mod)).astype(np.int32)


def undirected_pairs(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """Distinct (u < v) node pairs from non-literal, non-rdf:type,
    non-self-loop edges."""
    def to_und(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.invert(batch.column("obj_is_literal")),
                       pc.and_(pc.not_equal(batch.column("pred"), ns.RDF_TYPE),
                               pc.not_equal(batch.column("subj"),
                                            batch.column("obj"))))
        t = batch.filter(keep)
        s = t.column("subj")
        o = t.column("obj")
        u = pc.min_element_wise(s, o)
        v = pc.max_element_wise(s, o)
        key = pc.binary_join_element_wise(
            u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u,
            v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v, "\x1f")
        return pa.Table.from_pydict(
            {"u": u, "v": v,
             "p": pa.array(_hash_mod(key, num_partitions), pa.int32())})

    def uniq(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates()
        return pa.Table.from_pydict(
            {"u": df["u"].tolist(), "v": df["v"].tolist()}, schema=_PAIR_SCHEMA)

    return (edges.map_batches(to_und, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(
                lambda t: uniq(t.drop_columns(["p"])), batch_format="pyarrow"))


def triangles(edges: Dataset, num_partitions: int = 16) -> Dataset:
    """All (a < b < c) triangles of the undirected relationship graph."""
    und = undirected_pairs(edges, num_partitions).materialize()

    def wedge_rows(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_pylist()
        v = batch.column("v").to_pylist()
        # u is a lo-neighbor of center v; v is a hi-neighbor of center u
        center = v + u
        other = u + v
        is_lo = [True] * len(u) + [False] * len(u)
        return pa.Table.from_pydict({
            "center": center, "other": other,
            "is_lo": pa.array(is_lo, pa.bool_()),
            "p": pa.array(_hash_mod(pa.array(center, pa.string()),
                                    num_partitions), pa.int32())})

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
                lambda t: wedges_in_partition(t.drop_columns(["p"])),
                batch_format="pyarrow"))

    def tag_wedge(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("a").combine_chunks()
            if isinstance(batch.column("a"), pa.ChunkedArray)
            else batch.column("a"),
            batch.column("c").combine_chunks()
            if isinstance(batch.column("c"), pa.ChunkedArray)
            else batch.column("c"), "\x1f")
        return pa.Table.from_pydict({
            "a": batch.column("a"), "b": batch.column("b"),
            "c": batch.column("c"),
            "p": pa.array(_hash_mod(key, num_partitions), pa.int32())})

    def tag_edge(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch.column("u").combine_chunks()
            if isinstance(batch.column("u"), pa.ChunkedArray)
            else batch.column("u"),
            batch.column("v").combine_chunks()
            if isinstance(batch.column("v"), pa.ChunkedArray)
            else batch.column("v"), "\x1f")
        return pa.Table.from_pydict({
            "a": batch.column("u"),
            "b": pa.nulls(batch.num_rows, pa.string()),  # edge marker
            "c": batch.column("v"),
            "p": pa.array(_hash_mod(key, num_partitions), pa.int32())})

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
        lambda t: close_in_partition(t.drop_columns(["p"])),
        batch_format="pyarrow")
