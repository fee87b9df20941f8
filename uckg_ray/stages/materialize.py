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

import pandas as pd
import pyarrow as pa

import ray.data
from ray.data import Dataset
from ray.data.aggregate import Count

from uckg_ray import namespaces as ns
from uckg_ray.schema import EDGE_KEY_COLS, NODE_SCHEMA


def _local_dedup(batch: pa.Table) -> pa.Table:
    """Block-local distinct on the 5 triple-key columns (drops lineage)."""
    cols = [c for c in EDGE_KEY_COLS if c in batch.column_names]
    return batch.select(cols).group_by(cols).aggregate([])


def distinct_edges(edges: Dataset, *, sort: bool = True) -> Dataset:
    """Global exact dedup of the edge stream on (subj, pred, obj,
    obj_is_literal, obj_datatype), optionally followed by the final
    global sort required for the canonical edge table (SURVEY.md §2.7)."""
    ds = edges.map_batches(_local_dedup, batch_format="pyarrow")
    ds = ds.groupby(EDGE_KEY_COLS).aggregate(Count(alias_name="_cnt"))
    ds = ds.drop_columns(["_cnt"])
    if sort:
        ds = ds.sort(["subj", "pred", "obj"])
    return ds


def _node_partial(batch: pa.Table) -> pa.Table:
    """Per-block partial node aggregate: (subj, classes set, n_edges,
    n_literals). Emits ≤ one row per subject per block."""
    df = batch.to_pandas()
    is_type = df["pred"] == ns.RDF_TYPE
    g = df.groupby("subj", sort=False)
    classes = df[is_type].groupby("subj", sort=False)["obj"].agg(
        lambda s: "|".join(sorted(set(s))))
    out = pd.DataFrame({
        "subj": list(g.groups),
        "n_edges": g.size().values,
        "n_literals": g["obj_is_literal"].sum().astype("int64").values,
    })
    out["classes"] = out["subj"].map(classes).fillna("")
    return pa.Table.from_pydict(
        {"subj": out["subj"].tolist(), "classes": out["classes"].tolist(),
         "n_edges": out["n_edges"].astype("int64").tolist(),
         "n_literals": out["n_literals"].tolist()},
        schema=NODE_SCHEMA,
    )


def _node_merge(group: pd.DataFrame) -> pd.DataFrame:
    cls = sorted(set(c for cs in group["classes"] if cs for c in cs.split("|")))
    return pd.DataFrame({
        "subj": [group["subj"].iloc[0]],
        "classes": ["|".join(cls)],
        "n_edges": [int(group["n_edges"].sum())],
        "n_literals": [int(group["n_literals"].sum())],
    })


def node_table(distinct: Dataset) -> Dataset:
    """Node table from the *deduped* edge stream: class labels (sorted,
    '|'-joined) + edge/literal counts per subject. Two-phase: per-block
    partials, then a groupby over the much smaller partial rows."""
    partial = distinct.map_batches(_node_partial, batch_format="pyarrow")
    return partial.groupby("subj").map_groups(_node_merge, batch_format="pandas")


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
