"""Canonical graph materialization: exact dedup, global sort, node table.

Reference semantics being preserved (SURVEY.md §2.7):

- A2 exact triple dedup — RDF set semantics / Neo4j unique-URI constraint
  (``process/ontology_updater.py:58-66``, ``process/graph_updater.py:30-46``)
  → here: block-local dedup (combiner) + one hash groupby on the triple key.
- A4 multival property aggregation (``neo4j/import/init.cypher:3-16``)
  → per-subject aggregation with a two-phase partial (per-block pandas
  groupby, then a tiny global merge) so hot subjects never funnel all
  their raw rows through one task.

Scale notes: the local dedup inside ``map_batches`` is the combiner that
keeps the all-to-all exchange proportional to the number of *distinct*
triples per block, not raw emissions (hub triples like the hot CVE's
rdf:type collapse to one row per block before the shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset

from uckg_ray import namespaces as ns
from uckg_ray.schema import EDGE_KEY_COLS, NODE_SCHEMA


_SEP = "\x1f"  # never occurs in IRIs or generated literals


def _local_dedup(batch: pa.Table) -> pa.Table:
    """Block-local distinct on the 5 triple-key columns (drops lineage)."""
    cols = [c for c in EDGE_KEY_COLS if c in batch.column_names]
    return batch.select(cols).group_by(cols).aggregate([])


def _encode_key(batch: pa.Table) -> pa.Table:
    """5 key columns → one \\x1f-joined key column. A single-column
    shuffle key is ~2× cheaper than a 5-string-column groupby in Ray's
    sort-based aggregate (measured on sf0.1). Nulls are rejected for
    the same reason as in ``_encode_sort_key``: the element-wise join
    would null the whole key and collapse distinct rows."""
    import pyarrow.compute as pc
    for c in EDGE_KEY_COLS:
        if batch.column(c).null_count:
            raise ValueError(
                f"edge column {c!r} contains nulls — normalize to ''"
                " upstream before the encoded-key distinct")
    k = pc.binary_join_element_wise(
        batch.column("subj").combine_chunks(),
        batch.column("pred").combine_chunks(),
        batch.column("obj").combine_chunks(),
        pc.cast(batch.column("obj_is_literal"), pa.string()).combine_chunks(),
        batch.column("obj_datatype").combine_chunks(),
        _SEP)
    return pa.table({"k": k})


def _decode_key(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc
    parts = pc.split_pattern(batch.column("k"), _SEP)
    cols = [pc.cast(pc.list_element(parts, i), pa.string()) for i in range(5)]
    return pa.Table.from_arrays(
        [cols[0], cols[1], cols[2],
         pc.equal(cols[3], "true"), cols[4]],
        names=EDGE_KEY_COLS)


def _add_hash_partition(batch: pa.Table, num_partitions: int,
                        col: str = "k") -> pa.Table:
    """Vectorized 64-bit key hash (polars) → partition id column."""
    import polars as pl
    h = pl.from_arrow(batch.column(col).combine_chunks()).hash(seed=0)
    p = (h % num_partitions).cast(pl.Int32).to_numpy()
    return batch.append_column("p", pa.array(p, pa.int32()))


def _dedup_partition(group: pa.Table) -> pa.Table:
    return group.select(["k"]).group_by(["k"]).aggregate([])


_NUL = "\x00"
_EDGE_ARROW_SCHEMA = pa.schema([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("obj_is_literal", pa.bool_()), ("obj_datatype", pa.string())])


def _encode_sort_key(batch: pa.Table) -> pa.Table:
    """5 key columns → one NUL-joined sort key. Byte order of the joined
    key equals tuple order of the columns because NUL sorts below every
    other byte — PROVIDED no field contains NUL, which the vectorized
    assertion enforces (generated IRIs can't contain it and JSON
    literals escape control chars; a violation raises loudly rather
    than silently mis-sorting)."""
    import pyarrow.compute as pc
    for c in EDGE_KEY_COLS:
        nulls = batch.column(c).null_count
        if nulls:
            raise ValueError(
                f"edge column {c!r} contains {nulls} nulls — "
                "binary_join_element_wise would emit null keys and "
                "collapse distinct null-bearing rows into one; normalize "
                "nulls upstream (this engine emits '' not null)")
    for c in ("subj", "pred", "obj", "obj_datatype"):
        bad = pc.sum(pc.count_substring(batch.column(c), _NUL)).as_py()
        if bad:
            raise ValueError(
                f"edge column {c!r} contains NUL bytes ({bad} occurrences)"
                " — the single-key canonical sort requires NUL-free"
                " fields; sanitize upstream or sort on the raw columns")
    k = pc.binary_join_element_wise(
        batch.column("subj").combine_chunks(),
        batch.column("pred").combine_chunks(),
        batch.column("obj").combine_chunks(),
        pc.cast(batch.column("obj_is_literal"), pa.string()).combine_chunks(),
        batch.column("obj_datatype").combine_chunks(),
        _NUL)
    return pa.table({"k": k})


def _decode_sorted_distinct(batch: pa.Table) -> pa.Table:
    """Sorted key block → distinct decoded edge rows. The sort's range
    partitioner is a pure function of the key, so every copy of a key is
    in this block and the in-block first-distinct mask is a global
    distinct; splitting after the mask touches only surviving rows."""
    import polars as pl
    df = pl.from_arrow(batch)
    if df.height == 0:
        return _EDGE_ARROW_SCHEMA.empty_table()
    df = df.filter(pl.col("k").is_first_distinct())
    parts = df["k"].str.split(_NUL)
    out = pl.DataFrame({
        "subj": parts.list.get(0), "pred": parts.list.get(1),
        "obj": parts.list.get(2),
        "obj_is_literal": parts.list.get(3) == "true",
        "obj_datatype": parts.list.get(4)})
    return out.to_arrow().cast(_EDGE_ARROW_SCHEMA)


def distinct_edges(edges: Dataset, *, sort: bool = True,
                   num_partitions: int = 64,
                   coalesce_blocks: int | None = None,
                   local_combine: bool = True) -> Dataset:
    """Global exact dedup of the edge stream on (subj, pred, obj,
    obj_is_literal, obj_datatype), optionally followed by the final
    global sort required for the canonical edge table (SURVEY.md §2.7).

    Shape when ``sort=True`` (the canonical-table path): block-local
    distinct (combiner) → ONE all-to-all — the global range-partitioned
    sort on (subj, pred, obj) — → per-block vectorized first-distinct
    mask. The sort's range partitioner is a pure function of the key, so
    every copy of a key (the combiner leaves ≤ one per block) lands in
    the same sorted partition and the in-block mask is a *global*
    distinct. This fuses what used to be two exchanges (hash-partition
    dedup shuffle + sort shuffle) plus an encode/decode pair into the
    sort alone: 8.6 s → 7.2 s median at sf0.1/32 CPUs, and the win grows
    with scale (one exchange of N rows instead of two).

    Shape when ``sort=False``: encode the 5 columns into one key →
    explicit hash partitioning (vectorized 64-bit hash) → per-partition
    vectorized distinct → decode. The explicit hash-partition +
    map_groups path measures ~2× faster than Ray's multi-column
    sort-based aggregate on this workload.

    ``local_combine=False`` skips the block-local combiner for callers
    whose input blocks are already block-locally distinct (build_kg's
    finalize pass dedups as it rewrites) — one full map pass saved.
    """
    ds = edges
    if local_combine:
        ds = ds.map_batches(_local_dedup, batch_format="pyarrow",
                            batch_size=None)
    # block-count control before the wide ops: the sort-based shuffle
    # exchanges (#map-blocks × #reduce-partitions) fragments, so feeding
    # it hundreds of small map-task output blocks is quadratic waste —
    # coalesce adjacent blocks (repartition WITHOUT shuffle, one concat
    # pass) first. Measured: groupby 25 s → 1.7 s, sort 26 s → 6 s at
    # sf0.1 when the upstream was a 200-block materialized extract
    # output. (`target_num_rows_per_block` is NOT usable here: it only
    # splits oversized blocks, never merges small ones.) Callers with an
    # already block-controlled upstream (e.g.
    # `read_parquet(override_num_blocks=...)`) leave this off.
    if coalesce_blocks:
        ds = ds.repartition(coalesce_blocks, shuffle=False)
    if sort:
        # single-key sort: the 5 columns are NUL-joined into one key, so
        # Ray's sort runs a 1-string-column comparator instead of a
        # 3-column one (measured 2× on the reduce merge: 7.5 s → 3.5 s
        # at sf0.1/32 CPUs) and byte order of the joined key ≡ tuple
        # order of the columns — guaranteed by the vectorized no-NUL
        # assertion in the encoder (NUL sorts below every other byte).
        # Terminal shuffle: nothing reorders after the sort, so block
        # order is the sorted order all the way into the writer (don't
        # enable use_polars_sort — its output dtype is large_string).
        ds = ds.map_batches(_encode_sort_key, batch_format="pyarrow",
                            batch_size=None)
        ds = ds.sort("k")
        return ds.map_batches(_decode_sorted_distinct,
                              batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(_encode_key, batch_format="pyarrow", batch_size=None)
    ds = ds.map_batches(lambda b: _add_hash_partition(b, num_partitions),
                        batch_format="pyarrow", batch_size=None)
    ds = ds.groupby("p").map_groups(_dedup_partition, batch_format="pyarrow")
    return ds.map_batches(_decode_key, batch_format="pyarrow", batch_size=None)


def _node_out(counts, cls) -> pa.Table:
    """(counts ⟕ classes) polars frames → Arrow table in NODE_SCHEMA."""
    import polars as pl
    out = (counts.join(cls, on="subj", how="left")
           .with_columns(pl.col("classes").fill_null(""))
           .select(["subj", "classes", "n_edges", "n_literals"]))
    return out.to_arrow().cast(NODE_SCHEMA)


def _node_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial node aggregate: (subj, classes set, n_edges,
    n_literals). Emits ≤ one row per subject per block. All-Rust polars
    aggregation (the pandas per-subject ``"|".join`` lambda was the one
    Python-per-group loop left in the finalize path)."""
    import polars as pl
    df = pl.from_arrow(batch.select(
        ["subj", "pred", "obj", "obj_is_literal"]))
    counts = df.group_by("subj").agg(
        pl.len().cast(pl.Int64).alias("n_edges"),
        pl.col("obj_is_literal").sum().cast(pl.Int64).alias("n_literals"))
    cls = (df.filter(pl.col("pred") == ns.RDF_TYPE)
           .select("subj", "obj").unique()
           .group_by("subj")
           .agg(pl.col("obj").sort().str.join("|").alias("classes")))
    return _node_out(counts, cls)


def _node_merge_partition(part: pa.Table) -> pa.Table:
    """Vectorized merge of ALL partials inside one hash partition:
    polars sum for the counts, split→explode→unique→sorted-join for the
    class sets (classes never contain '|')."""
    import warnings

    import polars as pl
    df = pl.from_arrow(part)
    counts = df.group_by("subj").agg(
        pl.col("n_edges").sum().cast(pl.Int64),
        pl.col("n_literals").sum().cast(pl.Int64))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        cls = (df.filter(pl.col("classes") != "")
               .select("subj", "classes")
               .with_columns(pl.col("classes").str.split("|"))
               .explode("classes").unique()
               .group_by("subj")
               .agg(pl.col("classes").sort().str.join("|")))
    return _node_out(counts, cls)


def node_table(distinct: Dataset, num_partitions: int = 16) -> Dataset:
    """Node table from the *deduped* edge stream: class labels (sorted,
    '|'-joined) + edge/literal counts per subject. Two-phase: per-block
    partials (≤ one row per subject per block), then a hash-partitioned
    vectorized merge — hot subjects are already collapsed per block, so
    partition skew is bounded by #blocks, not edge counts."""
    partial = distinct.map_batches(_node_partial, batch_format="pyarrow",
                                   batch_size=None)
    parted = partial.map_batches(
        lambda b: _add_hash_partition(b, num_partitions, col="subj"),
        batch_format="pyarrow", batch_size=None)
    return parted.groupby("p").map_groups(
        lambda t: _node_merge_partition(t.drop_columns(["p"])),
        batch_format="pyarrow")


_VAL_SEP = ";;"      # final output separator (mirrored in the SQL oracle)

_PROPS_PARTIAL_SCHEMA = pa.schema(
    [("k", pa.string()), ("subj", pa.string()), ("pred", pa.string()),
     ("vals", pa.string())])
_PROPS_SCHEMA = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("vals", pa.string())])


def _props_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial of the multival property aggregation (A4,
    neo4j/import/init.cypher:3-16): ≤ one row per (subj, pred) per
    block; values carried with the \\x1f separator (never occurs in
    values), joined with ';;' only at final output. All-Rust polars."""
    import polars as pl
    df = (pl.from_arrow(batch.select(["subj", "pred", "obj",
                                      "obj_is_literal"]))
          .filter(pl.col("obj_is_literal")))
    if len(df) == 0:
        return pa.Table.from_pydict(
            {"k": [], "subj": [], "pred": [], "vals": []},
            schema=_PROPS_PARTIAL_SCHEMA)
    g = (df.group_by(["subj", "pred"])
         .agg(pl.col("obj").unique().sort().str.join(_SEP).alias("vals"))
         .with_columns((pl.col("subj") + _SEP + pl.col("pred")).alias("k"))
         .select(["k", "subj", "pred", "vals"]))
    return g.to_arrow().cast(_PROPS_PARTIAL_SCHEMA)


def _props_merge_partition(part: pa.Table) -> pa.Table:
    """Vectorized merge of all partials in one hash partition:
    split→explode→unique→sorted-join per (subj, pred), all in polars."""
    import warnings

    import polars as pl
    df = pl.from_arrow(part)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        g = (df.with_columns(pl.col("vals").str.split(_SEP))
             .explode("vals").unique()
             .group_by(["subj", "pred"])
             .agg(pl.col("vals").sort().str.join(_VAL_SEP)))
    return g.select(["subj", "pred", "vals"]).to_arrow().cast(_PROPS_SCHEMA)


def node_props(distinct: Dataset, num_partitions: int = 16) -> Dataset:
    """Multival property arrays per (subj, pred) over literal edges —
    the n10s handleMultival:'ARRAY' semantics. Two-phase: block partial
    (≤ one row per key per block), then a hash-partitioned vectorized
    merge (same shape as node_table)."""
    partial = distinct.map_batches(_props_partial, batch_format="pyarrow",
                                   batch_size=None)
    parted = partial.map_batches(
        lambda b: _add_hash_partition(b, num_partitions, col="k"),
        batch_format="pyarrow", batch_size=None)
    return parted.groupby("p").map_groups(
        lambda t: _props_merge_partition(t.drop_columns(["p", "k"])),
        batch_format="pyarrow")


_TYPES_SCHEMA = pa.schema([("node", pa.string()), ("type_iri", pa.string())])


def infer_types(distinct: Dataset, closure: dict[str, list[str]] | None = None,
                num_partitions: int = 16) -> Dataset:
    """TBox entailment (SURVEY §2.5 T3): every ``rdf:type`` assertion
    broadcast-joined against the rdfs:subClassOf closure → distinct
    (node, type_iri) including inferred supertypes. The closure is the
    bounded ontology side (rides the task closure); the rdf:type stream
    is the data-scale side. Same block-partial + hash-partition distinct
    shape as node_table."""
    import pandas as pd

    from uckg_ray import namespaces as ns
    from uckg_ray.tbox import tbox_closure
    closure = tbox_closure() if closure is None else closure
    rt = ns.RDF_TYPE

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.equal(batch.column("pred"), rt))
        df = pd.DataFrame({"node": t.column("subj").to_pylist(),
                           "type_iri": t.column("obj").to_pylist()})
        sup = df.assign(type_iri=df["type_iri"].map(closure))
        sup = sup[sup["type_iri"].notna()].explode("type_iri")
        out = pd.concat([df, sup], ignore_index=True).drop_duplicates()
        return pa.Table.from_pydict(
            {"node": out["node"].tolist(), "type_iri": out["type_iri"].tolist()},
            schema=_TYPES_SCHEMA)

    def uniq(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates()
        return pa.Table.from_pydict(
            {"node": df["node"].tolist(), "type_iri": df["type_iri"].tolist()},
            schema=_TYPES_SCHEMA)

    parted = (distinct.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)
              .map_batches(lambda b: _add_hash_partition(
                  b.append_column("k", pa.compute.binary_join_element_wise(
                      b.column("node").combine_chunks()
                      if isinstance(b.column("node"), pa.ChunkedArray)
                      else b.column("node"),
                      b.column("type_iri").combine_chunks()
                      if isinstance(b.column("type_iri"), pa.ChunkedArray)
                      else b.column("type_iri"), "\x1f")),
                  num_partitions, col="k"),
                  batch_format="pyarrow", batch_size=None))
    return parted.groupby("p").map_groups(
        lambda t: uniq(t.drop_columns(["p", "k"])), batch_format="pyarrow")


def infer_types_domain_range(distinct: Dataset,
                             closure: dict[str, list[str]] | None = None,
                             domain: list[tuple[str, str]] | None = None,
                             range_: list[tuple[str, str]] | None = None,
                             num_partitions: int = 16) -> Dataset:
    """RDFS domain/range entailment (rules rdfs2/rdfs3) composed with
    the subclass closure (T3/T5 extension): for every edge
    ``(s, p, o)``, each ``rdfs:domain(p, C)`` axiom entails ``s : C``
    and each ``rdfs:range(p, C)`` axiom entails ``o : C`` (non-literal
    objects only — the snapshot's range axioms are object properties);
    asserted and entailed types are then closed over rdfs:subClassOf.
    The axiom tables ride the task closure (bounded ontology side); the
    edge stream is the data-scale side — same block-partial +
    hash-partition distinct shape as ``infer_types``.

    Reference scope note: this is the RDFS-level subset of the
    reference's optional ``sync_reasoner()`` OWL-DL pass
    (``reference/process/ontology_updater.py:69-74``); full DL
    reasoning remains documented out of scope (SURVEY §2.5 T5)."""
    import pandas as pd

    from uckg_ray import namespaces as ns
    from uckg_ray.tbox import TBOX_DOMAIN, TBOX_RANGE, tbox_closure
    closure = tbox_closure() if closure is None else closure
    dom_rows = TBOX_DOMAIN if domain is None else domain
    rng_rows = TBOX_RANGE if range_ is None else range_
    dom_map: dict[str, list[str]] = {}
    for p_, c_ in dom_rows:
        dom_map.setdefault(p_, []).append(c_)
    rng_map: dict[str, list[str]] = {}
    for p_, c_ in rng_rows:
        rng_map.setdefault(p_, []).append(c_)
    rt = ns.RDF_TYPE

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "subj": batch.column("subj").to_pylist(),
            "pred": batch.column("pred").to_pylist(),
            "obj": batch.column("obj").to_pylist(),
            "lit": batch.column("obj_is_literal").to_pylist(),
        })
        asserted = (df[df["pred"] == rt]
                    .rename(columns={"subj": "node", "obj": "type_iri"})
                    [["node", "type_iri"]])
        d = df[df["pred"].isin(dom_map)]
        d = (d.assign(type_iri=d["pred"].map(dom_map))
             .rename(columns={"subj": "node"})[["node", "type_iri"]]
             .explode("type_iri"))
        r = df[df["pred"].isin(rng_map) & ~df["lit"]]
        r = (r.assign(type_iri=r["pred"].map(rng_map))
             .rename(columns={"obj": "node"})[["node", "type_iri"]]
             .explode("type_iri"))
        base = pd.concat([asserted, d, r], ignore_index=True).drop_duplicates()
        sup = base.assign(type_iri=base["type_iri"].map(closure))
        sup = sup[sup["type_iri"].notna()].explode("type_iri")
        out = pd.concat([base, sup], ignore_index=True).drop_duplicates()
        return pa.Table.from_pydict(
            {"node": out["node"].tolist(), "type_iri": out["type_iri"].tolist()},
            schema=_TYPES_SCHEMA)

    def uniq(part: pa.Table) -> pa.Table:
        df = part.to_pandas().drop_duplicates()
        return pa.Table.from_pydict(
            {"node": df["node"].tolist(), "type_iri": df["type_iri"].tolist()},
            schema=_TYPES_SCHEMA)

    parted = (distinct.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None)
              .map_batches(lambda b: _add_hash_partition(
                  b.append_column("k", pa.compute.binary_join_element_wise(
                      b.column("node").combine_chunks()
                      if isinstance(b.column("node"), pa.ChunkedArray)
                      else b.column("node"),
                      b.column("type_iri").combine_chunks()
                      if isinstance(b.column("type_iri"), pa.ChunkedArray)
                      else b.column("type_iri"), "\x1f")),
                  num_partitions, col="k"),
                  batch_format="pyarrow", batch_size=None))
    return parted.groupby("p").map_groups(
        lambda t: uniq(t.drop_columns(["p", "k"])), batch_format="pyarrow")


_SUBPROP_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                             ("obj", pa.string())])


def _joined_key_arrays(batch: pa.Table, cols: tuple[str, ...]) -> list:
    """Validated column arrays for a \\x1f-joined tuple key: rejects
    nulls (they'd null the whole key and collapse distinct null-bearing
    tuples — same rule as ``_encode_sort_key``) and embedded separator
    bytes (two tuples differing only at a field boundary would collapse
    into one key)."""
    import pyarrow.compute as pc
    arrs = []
    for c in cols:
        col = batch.column(c)
        if col.null_count:
            raise ValueError(
                f"column {c!r} contains {col.null_count} nulls — the "
                "joined tuple key would be null and collapse distinct "
                "null-bearing rows; normalize nulls upstream "
                "(this engine emits '' not null)")
        bad = pc.sum(pc.count_substring(col, "\x1f")).as_py()
        if bad:
            raise ValueError(
                f"column {c!r} contains the \\x1f key separator "
                f"({bad} occurrences) — the joined tuple key "
                "would collapse distinct tuples; sanitize upstream")
        arrs.append(col.combine_chunks()
                    if isinstance(col, pa.ChunkedArray) else col)
    return arrs


def _distinct_on_cols(ds: Dataset, cols: tuple[str, ...],
                      out_schema: pa.Schema,
                      num_partitions: int) -> Dataset:
    """Global distinct on ``cols``: one \\x1f-joined key, explicit hash
    partition, per-partition vectorized unique — the shared machinery
    behind the entailment deltas and the closure rounds."""
    import pyarrow.compute as pc
    key_schema = pa.schema(list(out_schema) + [pa.field("k", pa.string()),
                                               pa.field("p", pa.int32())])

    def key(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return key_schema.empty_table()
        k = pc.binary_join_element_wise(
            *_joined_key_arrays(batch, cols), "\x1f")
        return _add_hash_partition(batch.append_column("k", k),
                                   num_partitions, col="k")

    def uniq(part: pa.Table) -> pa.Table:
        import polars as pl
        if part.num_rows == 0:
            return out_schema.empty_table()
        return (pl.from_arrow(part).unique(subset=["k"])
                .select(list(cols)).to_arrow().cast(out_schema))

    return (ds.map_batches(key, batch_format="pyarrow", batch_size=None)
            .groupby("p").map_groups(
                lambda t: uniq(t.drop_columns(["p"])),
                batch_format="pyarrow"))


def _subtract_on_cols(left: Dataset, right: Dataset, cols: tuple[str, ...],
                      out_schema: pa.Schema,
                      num_partitions: int) -> Dataset:
    """Distinct set difference ``left − right`` on ``cols``: both sides
    tag a \\x1f-joined key + side marker, ONE key-hash co-partition, a
    per-partition vectorized anti-filter. Equal keys land in one
    partition, so the in-partition subtraction is global. Both sides
    pass the shared key validation (nulls / embedded separator raise —
    a right-side field containing \\x1f could otherwise silently cancel
    a real left-side tuple)."""
    import pyarrow.compute as pc
    tagged_schema = pa.schema(
        list(out_schema) + [pa.field("k", pa.string()),
                            pa.field("side", pa.int8()),
                            pa.field("p", pa.int32())])

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:   # schema-less empty upstream block
                return tagged_schema.empty_table()
            k = pc.binary_join_element_wise(
                *_joined_key_arrays(batch, cols), "\x1f")
            t = batch.append_column("k", k).append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8)))
            return _add_hash_partition(t, num_partitions, col="k")
        return f

    def minus(part: pa.Table) -> pa.Table:
        import polars as pl
        if part.num_rows == 0 or "side" not in part.column_names:
            return out_schema.empty_table()
        df = pl.from_arrow(part)
        right_keys = df.filter(pl.col("side") == 1)["k"]
        out = (df.filter(pl.col("side") == 0)
               .unique(subset=["k"])
               .filter(~pl.col("k").is_in(right_keys))
               .select(list(cols)))
        return out.to_arrow().cast(out_schema)

    both = (left.map_batches(tag(0), batch_format="pyarrow",
                             batch_size=None)
            .union(right.map_batches(tag(1), batch_format="pyarrow",
                                     batch_size=None)))
    return both.groupby("p").map_groups(
        lambda t: minus(t.drop_columns(["p"])), batch_format="pyarrow")


def entail_subproperties(distinct: Dataset,
                         closure: dict[str, list[str]] | None = None,
                         num_partitions: int = 16) -> Dataset:
    """RDFS property-hierarchy entailment (rule rdfs7, SURVEY §2.5 T5):
    every edge ``(s, p, o)`` whose predicate has super-properties in the
    rdfs:subPropertyOf closure entails ``(s, q, o)`` for each strict
    super-property ``q``. Output: the distinct ENTAILED triples
    (subj, pred, obj) — the delta a reasoner would add, not the input
    re-emitted. The property closure is the bounded ontology side
    (rides the task closure); the edge stream is the data-scale side —
    same block-partial + hash-partition distinct shape as
    ``infer_types``.

    Reference scope note: with subclass (T3), domain/range (rdfs2/3)
    and this rule (rdfs7), the engine covers the RDFS entailment
    fragment of the reference's optional ``sync_reasoner()`` pass
    (``reference/process/ontology_updater.py:69-74``); OWL-DL
    constructs remain documented out of scope."""
    import pandas as pd

    from uckg_ray.tbox import subprop_closure
    closure = subprop_closure() if closure is None else closure

    child_set = pa.array(sorted(closure))

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow pre-filter: only child-predicate rows (typically a tiny
        # fraction of the edge stream) ever pay the Python conversion
        batch = batch.filter(
            pa.compute.is_in(batch.column("pred"), value_set=child_set))
        df = pd.DataFrame({
            "subj": batch.column("subj").to_pylist(),
            "pred": batch.column("pred").to_pylist(),
            "obj": batch.column("obj").to_pylist(),
        })
        m = (df.assign(pred=df["pred"].map(closure)).explode("pred")
             .drop_duplicates())
        return pa.Table.from_pydict(
            {"subj": m["subj"].tolist(), "pred": m["pred"].tolist(),
             "obj": m["obj"].tolist()}, schema=_SUBPROP_SCHEMA)

    return _distinct_on_cols(
        distinct.map_batches(partial, batch_format="pyarrow",
                             batch_size=None),
        ("subj", "pred", "obj"), _SUBPROP_SCHEMA, num_partitions)


def entail_owl(distinct: Dataset,
               inverse: list[tuple[str, str]] | None = None,
               symmetric: list[str] | None = None,
               transitive: list[str] | None = None,
               num_partitions: int = 16,
               driver_max_pairs: int = 200_000,
               max_iters: int = 32) -> Dataset:
    """OWL-lite property entailment beyond the RDFS fragment
    (``owl:inverseOf``, ``owl:SymmetricProperty``,
    ``owl:TransitiveProperty``) — the remaining slice of the
    reference's optional HermiT pass the snapshot exercises
    (``reference/process/ontology_updater.py:69-74``). Output: the
    distinct triples the reasoner ADDS, i.e. entailed MINUS asserted
    (subj, pred, obj) — nothing the edge stream already contains.

    Shapes:
    - inverse/symmetric: stateless ``map_batches`` swap over the
      (tiny) axiom-predicate slice of the edge stream;
    - transitive: the predicate-restricted subgraph is ontology-
      bounded (a dictionary hierarchy, not data-scale). At or below
      ``driver_max_pairs`` edges the closure runs driver-side
      (semi-naive, same justification as the alias union-find's
      ``cc_driver_max_pairs``); above it, a distributed squaring loop
      (closure ∪ closure⋈closure with a hash-partitioned distinct per
      round, count-fixpoint on the driver) takes over — log₂(diameter)
      exchanges over the bounded subgraph, no driver gather;
    - the final asserted-subtraction and distinct co-partition the
      entailed stream with the axiom-predicate slice of the asserted
      stream on a NUL-joined key — both sides are axiom-bounded, the
      full edge stream never reshuffles."""
    import pyarrow.compute as pc

    from uckg_ray.tbox import TBOX_INVERSE, TBOX_SYMMETRIC, TBOX_TRANSITIVE

    inv_map: dict[str, str] = {}
    for p, q in (TBOX_INVERSE if inverse is None else inverse):
        inv_map[p] = q
        inv_map[q] = p
    for p in (TBOX_SYMMETRIC if symmetric is None else symmetric):
        inv_map[p] = p
    trans = list(TBOX_TRANSITIVE if transitive is None else transitive)

    out_schema = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                            ("obj", pa.string())])
    inv_set = pa.array(sorted(inv_map)) if inv_map else pa.array([], pa.string())
    trans_set = pa.array(sorted(trans)) if trans else pa.array([], pa.string())

    def inv_partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(batch.column("pred"), value_set=inv_set),
                    pc.invert(batch.column("obj_is_literal")))
        b = batch.filter(m)
        # axiom-bounded row count after the Arrow pre-filter: the
        # Python predicate map touches only entailing rows
        pred = pa.array([inv_map[p] for p in b.column("pred").to_pylist()],
                        pa.string())
        return pa.Table.from_arrays(
            [b.column("obj").cast(pa.string()), pred,
             b.column("subj").cast(pa.string())], schema=out_schema)

    entailed = distinct.map_batches(inv_partial, batch_format="pyarrow",
                                    batch_size=None)

    def trans_slice(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(batch.column("pred"), value_set=trans_set),
                    pc.invert(batch.column("obj_is_literal")))
        b = batch.filter(m)
        return pa.Table.from_arrays(
            [b.column("subj").cast(pa.string()),
             b.column("pred").cast(pa.string()),
             b.column("obj").cast(pa.string())], schema=out_schema)

    if trans:
        base = distinct.map_batches(trans_slice, batch_format="pyarrow",
                                    batch_size=None).materialize()
        n_base = base.count()
        if n_base <= driver_max_pairs:
            closure_tbl = _closure_driver(base, out_schema)
            entailed = entailed.union(ray.data.from_arrow(closure_tbl))
        else:
            entailed = entailed.union(
                _closure_squaring(base, out_schema, num_partitions,
                                  max_iters))

    # subtract asserted: co-partition entailed rows with the
    # axiom-predicate slice of the asserted stream; both sides are
    # axiom-bounded
    axiom_preds = sorted(set(inv_map) | set(inv_map.values()) | set(trans))
    ax_set = pa.array(axiom_preds) if axiom_preds \
        else pa.array([], pa.string())

    def asserted_slice(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_in(batch.column("pred"), value_set=ax_set))
        return pa.Table.from_arrays(
            [b.column("subj").cast(pa.string()),
             b.column("pred").cast(pa.string()),
             b.column("obj").cast(pa.string())], schema=out_schema)

    return _subtract_on_cols(
        entailed,
        distinct.map_batches(asserted_slice, batch_format="pyarrow",
                             batch_size=None),
        ("subj", "pred", "obj"), out_schema, num_partitions)


def _closure_driver(base: Dataset, out_schema: pa.Schema) -> pa.Table:
    """Driver-side semi-naive transitive closure of the (ontology-
    bounded) predicate-restricted subgraph."""
    from collections import defaultdict

    succ: dict[str, dict[str, set[str]]] = defaultdict(lambda: defaultdict(set))
    for row in base.take_all():
        succ[row["pred"]][row["subj"]].add(row["obj"])
    S, P, O = [], [], []
    for pred, adj in succ.items():
        closure: set[tuple[str, str]] = {(s, o) for s, os in adj.items()
                                         for o in os}
        delta = closure
        while delta:
            new = {(s, o2) for s, o in delta for o2 in adj.get(o, ())}
            new -= closure
            closure |= new
            delta = new
        for s, o in sorted(closure):
            S.append(s); P.append(pred); O.append(o)
    return pa.Table.from_arrays(
        [pa.array(S, pa.string()), pa.array(P, pa.string()),
         pa.array(O, pa.string())], schema=out_schema)


def _closure_squaring(base: Dataset, out_schema: pa.Schema,
                      num_partitions: int, max_iters: int) -> Dataset:
    """Distributed transitive closure by repeated squaring: each round
    co-partitions the current closure with itself on the join node
    ((pred, obj) meets (pred, subj)), extends paths, unions and
    re-distincts; the driver sees only the per-round count. Path
    length doubles per round, so rounds = O(log diameter)."""
    import pyarrow.compute as pc

    joined_schema = pa.schema(
        list(out_schema) + [pa.field("k", pa.string()),
                            pa.field("side", pa.int8()),
                            pa.field("p", pa.int32())])

    def tag_for_join(side: int):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return joined_schema.empty_table()
            joinc = batch.column("obj" if side == 0 else "subj")
            joinc = joinc.combine_chunks() \
                if isinstance(joinc, pa.ChunkedArray) else joinc
            predc = batch.column("pred").combine_chunks() \
                if isinstance(batch.column("pred"), pa.ChunkedArray) \
                else batch.column("pred")
            k = pc.binary_join_element_wise(predc, joinc, "\x1f")
            t = batch.append_column("k", k).append_column(
                "side", pa.array(np.full(batch.num_rows, side, np.int8)))
            return _add_hash_partition(t, num_partitions, col="k")
        return f

    def extend(part: pa.Table) -> pa.Table:
        import polars as pl
        if part.num_rows == 0 or "side" not in part.column_names:
            return out_schema.empty_table()
        df = pl.from_arrow(part)
        lhs = df.filter(pl.col("side") == 0).select(["k", "subj", "pred"])
        rhs = df.filter(pl.col("side") == 1).select(["k", "obj"])
        if lhs.height == 0 or rhs.height == 0:
            return out_schema.empty_table()
        out = (lhs.join(rhs, on="k")
               .select(["subj", "pred", "obj"]).unique())
        return out.to_arrow().cast(out_schema)

    def distinct_triples(ds: Dataset) -> Dataset:
        return _distinct_on_cols(ds, ("subj", "pred", "obj"), out_schema,
                                 num_partitions)

    # distinct the base BEFORE the first fixpoint compare: duplicate
    # (subj,pred,obj) rows in the input (e.g. the same triple under two
    # obj_datatype values) would otherwise mask first-round growth
    # (dups removed == paths added → n_new == n → early, wrong, stop)
    closure = distinct_triples(base).materialize()
    n = closure.count()
    for _ in range(max_iters):
        paired = (closure.map_batches(tag_for_join(0),
                                      batch_format="pyarrow",
                                      batch_size=None)
                  .union(closure.map_batches(tag_for_join(1),
                                             batch_format="pyarrow",
                                             batch_size=None)))
        extended = paired.groupby("p").map_groups(
            lambda t: extend(t.drop_columns(["p"])), batch_format="pyarrow")
        closure = distinct_triples(closure.union(extended)).materialize()
        n_new = closure.count()
        if n_new == n:
            return closure
        n = n_new
    raise RuntimeError(
        f"transitive closure did not converge in {max_iters} squaring "
        "rounds — the predicate subgraph is not ontology-bounded; raise "
        "max_iters or audit the axiom")


def union_edge_sources(*sources: Dataset | pa.Table) -> Dataset:
    """A5 graph union: per-source edge datasets/tables → one edge stream."""
    ds_list = []
    for s in sources:
        if isinstance(s, pa.Table):
            ds_list.append(ray.data.from_arrow(s))
        else:
            ds_list.append(s)
    out = ds_list[0]
    if len(ds_list) > 1:
        out = out.union(*ds_list[1:])
    return out


_FUNC_VIOL_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                               ("n_values", pa.int64())])


def functional_violations(distinct: Dataset,
                          functional: list[str] | None = None,
                          num_partitions: int = 16) -> Dataset:
    """``owl:FunctionalProperty`` consistency audit: subjects carrying
    MORE than one distinct value under a functional predicate — the
    inconsistency a DL reasoner (the reference's optional HermiT pass)
    would surface as a sameAs collision, reported here as a data-quality
    table instead of a reasoner abort. Output: (subj, pred, n_values)
    with n_values ≥ 2.

    Shape: Arrow pre-filter to the (tiny) axiom-predicate slice, the
    shared keyed global distinct on (subj, pred, obj), a (subj, pred)
    Count groupby, then the ≥2 filter — the only data-scale exchange is
    the distinct, and it moves the axiom slice only."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count
    from uckg_ray.tbox import TBOX_FUNCTIONAL

    preds = pa.array(sorted(functional if functional is not None
                            else TBOX_FUNCTIONAL))
    _SLICE = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                        ("obj", pa.string())])

    def axiom_slice(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b.column("pred"), value_set=preds))
        return pa.table({"subj": t.column("subj").cast(pa.string()),
                         "pred": t.column("pred").cast(pa.string()),
                         "obj": t.column("obj").cast(pa.string())})

    def keep_violations(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_values" not in b.column_names:
            return _FUNC_VIOL_SCHEMA.empty_table()
        return (b.filter(pc.greater(b.column("n_values"), 1))
                .cast(_FUNC_VIOL_SCHEMA))

    sliced = distinct.map_batches(axiom_slice, batch_format="pyarrow",
                                  batch_size=None)
    uniq = _distinct_on_cols(sliced, ("subj", "pred", "obj"), _SLICE,
                             num_partitions)
    return (uniq.groupby(["subj", "pred"])
            .aggregate(Count(alias_name="n_values"))
            .map_batches(keep_violations, batch_format="pyarrow",
                         batch_size=None))


def entail_equivalent_classes(distinct: Dataset,
                              groups: dict[str, list[str]] | None = None,
                              num_partitions: int = 16) -> Dataset:
    """``owl:equivalentClass`` entailment over the snapshot's NAMED
    class equivalences (uco2.ttl:576-608 — cap:Weakness ≡ ucoCWE,
    the three-way Observable group, ucoAttack ≡ ucoIncident; the
    bnode owl:Restriction equivalences are OWL-DL, documented out of
    scope): every ``rdf:type C`` assertion entails ``rdf:type D`` for
    each other member D of C's equivalence group, minus what the edge
    stream already asserts. Shape: stateless broadcast map over the
    (tiny) group dictionary → the shared keyed distinct → the shared
    keyed subtraction — identical scale posture to entail_owl."""
    import polars as pl
    import pyarrow.compute as pc

    from uckg_ray.namespaces import RDF_TYPE
    from uckg_ray.tbox import equivalence_groups

    groups = equivalence_groups() if groups is None else groups
    member_set = pa.array(sorted(groups))
    out_schema = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                            ("obj", pa.string())])

    def entail(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(
            pc.equal(batch.column("pred"), RDF_TYPE),
            pc.is_in(batch.column("obj"), value_set=member_set)))
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = (pl.from_arrow(t.select(["subj", "obj"]))
              .with_columns(pl.col("obj").replace_strict(
                  old=list(groups), new=list(groups.values()),
                  return_dtype=pl.List(pl.String)).alias("others"))
              .explode("others"))
        return pa.table({
            "subj": df["subj"].to_arrow().cast(pa.string()),
            "pred": pa.array([RDF_TYPE] * df.height, pa.string()),
            "obj": df["others"].to_arrow().cast(pa.string())})

    # no pre-distinct: _subtract_on_cols already uniques the left side
    # inside its global key co-partition (same as entail_owl's feed)
    return _subtract_on_cols(
        distinct.map_batches(entail, batch_format="pyarrow",
                             batch_size=None),
        distinct.map_batches(_asserted_type_slice(member_set),
                             batch_format="pyarrow", batch_size=None),
        ("subj", "pred", "obj"), out_schema, num_partitions)


_ENT3_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                          ("obj", pa.string())])


def _asserted_type_slice(classes: pa.Array):
    """map_batches fn factory: the (subj, rdf:type, obj ∈ classes)
    slice of an edge stream cast to the 3-column entailment schema —
    the shared subtraction side of the equivalence / restriction
    entailments."""
    import pyarrow.compute as pc

    from uckg_ray.namespaces import RDF_TYPE

    def f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(
            pc.equal(batch.column("pred"), RDF_TYPE),
            pc.is_in(batch.column("obj"), value_set=classes)))
        return pa.Table.from_arrays(
            [t.column("subj").cast(pa.string()),
             t.column("pred").cast(pa.string()),
             t.column("obj").cast(pa.string())], schema=_ENT3_SCHEMA)
    return f


def entail_min1_restrictions(
        distinct: Dataset,
        restrictions: list[tuple[str, str, str]] | None = None,
        num_partitions: int = 16) -> Dataset:
    """QUALIFIED ``owl:minQualifiedCardinality 1`` restriction
    classification — the one OWL-DL class-expression construct the
    snapshot uses (uco2.ttl:605-616, ucoAttack ≡ [≥1 ucohasConsequence
    . ucoConsequence] ≡ [≥1 ucohasMeans . ucoMeans]). Axioms are
    (property, on_class, cls) triples: ``x`` is typed ``cls`` iff some
    ``(x, property, y)`` edge exists with ``(y, rdf:type, on_class)``
    asserted — the ``owl:onClass`` qualifier is honored (qualification
    reads ASSERTED types; chaining INFERRED object types would need a
    fixpoint with the other entailment rules, documented scope). The
    result subtracts asserted types.

    Shape: two tiny Arrow pre-filters (the restriction-property edge
    slice; the rdf:type slice over the on_classes), ONE key-hash
    co-partition on the edge OBJECT vs the typed node, a per-partition
    polars join through the (property, on_class, cls) axiom frame
    (duplicate properties across axioms are fine — the join fans out),
    then the shared keyed subtraction."""
    import pyarrow.compute as pc

    from uckg_ray.namespaces import RDF_TYPE
    from uckg_ray.tbox import TBOX_MIN1_RESTRICTIONS

    restrictions = (TBOX_MIN1_RESTRICTIONS if restrictions is None
                    else restrictions)
    props = pa.array(sorted({p for p, _, _ in restrictions}))
    on_classes = pa.array(sorted({o for _, o, _ in restrictions}))
    classes = pa.array(sorted({c for _, _, c in restrictions}))
    ax_rows = ([p for p, _, _ in restrictions],
               [o for _, o, _ in restrictions],
               [c for _, _, c in restrictions])

    _TAG = pa.schema([("key", pa.string()), ("side", pa.int8()),
                      ("subj", pa.string()), ("pred", pa.string()),
                      ("tcls", pa.string())])

    def tag_cand(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("pred"), value_set=props))
        if t.num_rows == 0:
            return _add_hash_partition(_TAG.empty_table(),
                                       num_partitions, "key")
        tt = pa.table({
            "key": t.column("obj").cast(pa.string()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
            "subj": t.column("subj").cast(pa.string()),
            "pred": t.column("pred").cast(pa.string()),
            "tcls": pa.nulls(t.num_rows, pa.string())})
        return _add_hash_partition(tt, num_partitions, "key")

    def tag_typed(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_(
            pc.equal(batch.column("pred"), RDF_TYPE),
            pc.is_in(batch.column("obj"), value_set=on_classes)))
        if t.num_rows == 0:
            return _add_hash_partition(_TAG.empty_table(),
                                       num_partitions, "key")
        tt = pa.table({
            "key": t.column("subj").cast(pa.string()),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
            "subj": pa.nulls(t.num_rows, pa.string()),
            "pred": pa.nulls(t.num_rows, pa.string()),
            "tcls": t.column("obj").cast(pa.string())})
        return _add_hash_partition(tt, num_partitions, "key")

    def classify(part: pa.Table) -> pa.Table:
        import polars as pl
        if part.num_rows == 0:
            return _ENT3_SCHEMA.empty_table()
        df = pl.from_arrow(part.select(["key", "side", "subj", "pred",
                                        "tcls"]))
        cand = (df.filter(pl.col("side") == 0)
                .select("key", "subj", "pred"))
        typed = (df.filter(pl.col("side") == 1)
                 .select("key", "tcls").unique())
        if cand.height == 0 or typed.height == 0:
            return _ENT3_SCHEMA.empty_table()
        ax = pl.DataFrame({"pred": ax_rows[0], "tcls": ax_rows[1],
                           "cls": ax_rows[2]})
        j = (cand.join(typed, on="key")
             .join(ax, on=["pred", "tcls"])
             .select("subj", "cls").unique())
        return pa.table({
            "subj": j["subj"].to_arrow().cast(pa.string()),
            "pred": pa.array([RDF_TYPE] * j.height, pa.string()),
            "obj": j["cls"].to_arrow().cast(pa.string())})

    entailed = (distinct.map_batches(tag_cand, batch_format="pyarrow",
                                     batch_size=None)
                .union(distinct.map_batches(tag_typed,
                                            batch_format="pyarrow",
                                            batch_size=None))
                .groupby("p").map_groups(classify, batch_format="pyarrow"))
    return _subtract_on_cols(
        entailed,
        distinct.map_batches(_asserted_type_slice(classes),
                             batch_format="pyarrow", batch_size=None),
        ("subj", "pred", "obj"), _ENT3_SCHEMA, num_partitions)


def triple_support(witness_edges: Dataset,
                   num_partitions: int | None = None) -> Dataset:
    """Per-triple provenance/confidence over the witness-preserving
    edge stream (``extract_edges(..., keep_witnesses=True)``): for
    every transcript-witnessed (subj, pred, obj) the number of distinct
    supporting turns, distinct supporting conversations, and the first
    witness under stable turn ordering — the support signal that ranks
    extracted facts by evidence before they enter the canonical graph
    (single-witness triples are extraction-noise candidates; the
    reference's count audits track record-level analogues,
    ``data_collection/cve_collection.py:311-336``). Dictionary-side
    emissions carry no turn witness (conv_id = '') and are excluded.

    ONE pass, ONE exchange: block partials pre-fold to (triple, conv)
    rows (turn count + min witness), the stream explicit-hash-partitions
    by the \x1f-joined triple key (the repo's measured-faster
    alternative to Ray's string-keyed sort aggregate), and each
    partition folds its co-located triples to the final row in two
    vectorized polars group_bys. Hot triples are bounded by the
    conversation count per partition; nothing is ever O(witnesses) on
    the driver. (The first version branched the emitter Dataset into
    two streams — that re-ran the extraction actor pool per branch and
    ran two sort-based string aggregates: 852 s at sf0.1/32 CPUs; this
    shape measures ~13× faster.)"""
    import polars as pl

    from uckg_ray.config import default_num_partitions
    from uckg_ray.stages.extract import ALIAS_MARKER_PRED

    n_parts = num_partitions or default_num_partitions()

    _PC = pa.schema([("k", pa.string()), ("conv_id", pa.string()),
                     ("n_turns", pa.int64()), ("first_w", pa.string()),
                     ("p", pa.int32())])

    def pair_partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(["subj", "pred", "obj",
                                      "conv_id", "turn_idx"]))
              .filter((pl.col("pred") != ALIAS_MARKER_PRED)
                      & (pl.col("conv_id") != "")))
        if df.height == 0:
            return _PC.empty_table()
        g = (df.with_columns(
                k=pl.col("subj") + "\x1f" + pl.col("pred") + "\x1f"
                + pl.col("obj"),
                wk=pl.col("conv_id") + "#"
                + pl.col("turn_idx").cast(pl.Utf8).str.zfill(6))
             .group_by(["k", "conv_id"])
             .agg(pl.len().cast(pl.Int64).alias("n_turns"),
                  pl.col("wk").min().alias("first_w"))
             .with_columns(p=(pl.col("k").hash(seed=0) % n_parts)
                           .cast(pl.Int32)))
        return g.select(["k", "conv_id", "n_turns", "first_w", "p"])             .to_arrow().cast(_PC)

    _FIN = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                      ("obj", pa.string()), ("n_turns", pa.int64()),
                      ("n_convs", pa.int64()), ("first_conv", pa.string()),
                      ("first_turn", pa.int32())])

    def fold_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _FIN.empty_table()
        g = (pl.from_arrow(part.select(["k", "conv_id", "n_turns",
                                        "first_w"]))
             .group_by(["k", "conv_id"])
             .agg(pl.col("n_turns").sum(), pl.col("first_w").min())
             .group_by("k")
             .agg(pl.col("n_turns").sum(),
                  pl.len().cast(pl.Int64).alias("n_convs"),
                  pl.col("first_w").min()))
        out = (g.with_columns(
                   pl.col("k").str.split_exact("\x1f", 2)
                   .struct.rename_fields(["subj", "pred", "obj"])
                   .alias("_t"))
               .select(pl.col("_t").struct.field("subj"),
                       pl.col("_t").struct.field("pred"),
                       pl.col("_t").struct.field("obj"),
                       "n_turns", "n_convs",
                       pl.col("first_w").str.head(-7).alias("first_conv"),
                       pl.col("first_w").str.tail(6).cast(pl.Int32)
                       .alias("first_turn")))
        return out.to_arrow().cast(_FIN)

    return (witness_edges
            .map_batches(pair_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("p")
            .map_groups(lambda t: fold_partition(t.drop_columns(["p"])),
                        batch_format="pyarrow"))


def kg_version_diff(witness_edges: Dataset,
                    split_fn=None) -> Dataset:
    """Triple-level diff between two KG versions built from two
    partitions of the SAME transcript table (the versioned-KG /
    incremental-re-sync audit: which facts appear only in the new crawl,
    which disappeared — the graph-level sibling of ``snapshot_diff``
    and of the reference's daily re-sync count audit,
    ``airflow/dags/ingestion_dag.py:27-77``). Input is the
    witness-preserving edge stream; ``split_fn(conv_id Arrow array) →
    bool mask`` assigns each witness to version B (default: odd last
    digit of conv_id). Output: transcript-witnessed triples present in
    exactly one version, with status 'add' (B only) or 'del' (A only).

    One pass, one triple-keyed exchange: block partials fold each
    triple's side presence into two int8 flags (Max-merged), so the
    exchange is bounded by distinct triples per block — never raw
    witnesses. Dictionary-side emissions (no turn witness) belong to
    both versions by construction and are excluded."""
    import polars as pl

    from ray.data.aggregate import Max

    from uckg_ray.stages.extract import ALIAS_MARKER_PRED

    _P = pa.schema([("k", pa.string()), ("in_a", pa.int8()),
                    ("in_b", pa.int8())])

    def partial(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select(["subj", "pred", "obj", "conv_id"]))
              .filter((pl.col("pred") != ALIAS_MARKER_PRED)
                      & (pl.col("conv_id") != "")))
        if df.height == 0:
            return _P.empty_table()
        if split_fn is None:
            # odd-digit final character → version B; any other ending
            # (including non-digit ids) → A. Total and deterministic.
            side_b = df["conv_id"].str.tail(1) \
                .is_in(["1", "3", "5", "7", "9"])
        else:
            side_b = pl.Series(split_fn(df["conv_id"].to_arrow()))
        g = (df.with_columns(
                k=pl.col("subj") + "\x1f" + pl.col("pred") + "\x1f"
                + pl.col("obj"),
                _b=side_b)
             .group_by("k")
             .agg((~pl.col("_b")).any().cast(pl.Int8).alias("in_a"),
                  pl.col("_b").any().cast(pl.Int8).alias("in_b")))
        return pa.table({"k": g["k"].to_arrow().cast(pa.string()),
                         "in_a": g["in_a"].to_arrow(),
                         "in_b": g["in_b"].to_arrow()})

    _FIN = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                      ("obj", pa.string()), ("status", pa.string())])

    def emit_diff(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _FIN.empty_table()
        df = (pl.from_arrow(b)
              .filter(pl.col("in_a") != pl.col("in_b"))
              .with_columns(
                  pl.col("k").str.split_exact("\x1f", 2)
                  .struct.rename_fields(["subj", "pred", "obj"])
                  .alias("_t"),
                  status=pl.when(pl.col("in_b") == 1)
                  .then(pl.lit("add")).otherwise(pl.lit("del"))))
        out = df.select(pl.col("_t").struct.field("subj"),
                        pl.col("_t").struct.field("pred"),
                        pl.col("_t").struct.field("obj"), "status")
        return out.to_arrow().cast(_FIN)

    return (witness_edges.map_batches(partial, batch_format="pyarrow",
                                      batch_size=None)
            .groupby("k")
            .aggregate(Max("in_a", alias_name="in_a"),
                       Max("in_b", alias_name="in_b"))
            .map_batches(emit_diff, batch_format="pyarrow",
                         batch_size=None))
