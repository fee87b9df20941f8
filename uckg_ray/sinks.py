"""Export sinks beyond Parquet.

The reference serializes its graph to Turtle for the Neo4j/n10s bulk
load (`reference/process/shared_functions.py` K3); the engine's
canonical artifact is sorted Parquet, and this module adds the export
formats a downstream consumer asks for — JSONL and CSV (file-parallel
`write_json` / `write_csv`, one file per block, resumable per
directory) plus N-Triples, the reference-adjacent RDF line format,
rendered vectorized inside ``map_batches`` and written file-parallel.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def export_dataset(ds: Dataset, out_dir: str, *, fmt: str = "jsonl") -> None:
    """Write any result dataset as ``jsonl`` / ``csv`` / ``parquet`` —
    file-parallel, one file per block."""
    if fmt == "jsonl":
        ds.write_json(out_dir)
    elif fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "parquet":
        ds.write_parquet(out_dir)
    else:
        raise ValueError(f"unsupported export format: {fmt!r}")


def _ntriples_batch(b: pa.Table) -> pa.Table:
    """Render edge rows as N-Triples lines. IRIs angle-bracketed;
    literals quoted with backslash/quote/newline escapes and an
    ``^^<datatype>`` suffix when the datatype isn't xsd:string (the
    N-Triples default)."""
    import pyarrow.compute as pc

    subj = b.column("subj").combine_chunks() \
        if isinstance(b.column("subj"), pa.ChunkedArray) else b.column("subj")
    pred = b.column("pred").combine_chunks() \
        if isinstance(b.column("pred"), pa.ChunkedArray) else b.column("pred")
    objs = b.column("obj").to_pylist()
    lits = b.column("obj_is_literal").to_pylist()
    dts = b.column("obj_datatype").to_pylist()
    rendered = []
    for o, is_lit, dt in zip(objs, lits, dts):
        if not is_lit:
            rendered.append(f"<{o}>")
            continue
        esc = (o.replace("\\", "\\\\").replace('"', '\\"')
               .replace("\n", "\\n").replace("\r", "\\r"))
        if dt and dt not in ("xsd:string", ""):
            iri = dt.replace("xsd:", "http://www.w3.org/2001/XMLSchema#")
            rendered.append(f'"{esc}"^^<{iri}>')
        else:
            rendered.append(f'"{esc}"')
    line = pc.binary_join_element_wise(
        pa.compute.binary_join_element_wise(
            pa.array(["<"] * b.num_rows), subj, pa.array(["> <"] * b.num_rows),
            ""),
        pred, pa.array(["> "] * b.num_rows), "")
    line = pc.binary_join_element_wise(
        line, pa.array(rendered, pa.string()), pa.array([" ."] * b.num_rows),
        "")
    return pa.table({"ntriple": line})


def export_edges_ntriples(edges: Dataset, out_dir: str) -> None:
    """Serialize an edge dataset (subj, pred, obj, obj_is_literal,
    obj_datatype) to N-Triples text files, file-parallel."""
    import os

    import pyarrow.csv  # noqa: F401  (text write via single-column CSV)

    lines = edges.map_batches(_ntriples_batch, batch_format="pyarrow",
                              batch_size=None)

    def write_block(b: pa.Table, path_prefix=out_dir) -> pa.Table:
        import uuid
        os.makedirs(path_prefix, exist_ok=True)
        name = os.path.join(path_prefix, f"part-{uuid.uuid4().hex}.nt")
        with open(name, "w", encoding="utf-8") as f:
            f.write("\n".join(b.column("ntriple").to_pylist()))
            if b.num_rows:
                f.write("\n")
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    # consume: one .nt file per block, written inside the tasks
    lines.map_batches(write_block, batch_format="pyarrow",
                      batch_size=None).materialize()
