"""Export sinks beyond Parquet.

The reference serializes its graph to Turtle for the Neo4j/n10s bulk
load (`reference/process/shared_functions.py` K3); the engine's
canonical artifact is sorted Parquet, and this module adds the export
formats a downstream consumer asks for — JSONL and CSV (file-parallel
`write_json` / `write_csv`, one file per block) plus N-Triples, the
reference-adjacent RDF line format, rendered vectorized inside
``map_batches`` and written file-parallel with content-hash filenames
(a Ray task retry rewrites the same file instead of duplicating
triples). Export into a FRESH directory — files from a previous export
are not removed.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

# datatype prefix expansion for N-Triples IRIREFs (must be absolute)
_DT_PREFIXES = {
    "xsd:": "http://www.w3.org/2001/XMLSchema#",
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:": "http://www.w3.org/2000/01/rdf-schema#",
}


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


def _dt_iri(dt: str) -> str:
    if dt.startswith(("http://", "https://")):
        return dt
    for pfx, base in _DT_PREFIXES.items():
        if dt.startswith(pfx):
            return base + dt[len(pfx):]
    raise ValueError(f"unknown datatype prefix in {dt!r} — N-Triples "
                     "requires an absolute datatype IRI")


def _ntriples_batch(b: pa.Table) -> pa.Table:
    """Render edge rows as N-Triples lines. IRIs angle-bracketed;
    literals quoted with backslash/quote/newline escapes and an
    ``^^<datatype>`` suffix when the datatype isn't xsd:string (the
    N-Triples default). Constant fragments join as SCALARS so empty
    blocks render fine (a zero-length ``pa.array([...])`` is null-typed
    and has no join kernel)."""
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
            rendered.append(f'"{esc}"^^<{_dt_iri(dt)}>')
        else:
            rendered.append(f'"{esc}"')
    line = pc.binary_join_element_wise(
        "<", subj, "> <", pred, "> ", pa.array(rendered, pa.string()),
        " .", "")
    return pa.table({"ntriple": line})


def export_edges_ntriples(edges: Dataset, out_dir: str) -> None:
    """Serialize an edge dataset (subj, pred, obj, obj_is_literal,
    obj_datatype) to N-Triples text files, file-parallel. Filenames are
    content hashes, so a retried write task overwrites its own file
    (idempotent) rather than duplicating the block."""
    import os

    lines = edges.map_batches(_ntriples_batch, batch_format="pyarrow",
                              batch_size=None)

    def write_block(b: pa.Table, path_prefix=out_dir) -> pa.Table:
        import hashlib
        os.makedirs(path_prefix, exist_ok=True)
        text = "\n".join(b.column("ntriple").to_pylist())
        name = os.path.join(
            path_prefix,
            f"part-{hashlib.md5(text.encode()).hexdigest()}.nt")
        with open(name, "w", encoding="utf-8") as f:
            f.write(text)
            if b.num_rows:
                f.write("\n")
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    # consume: one .nt file per block, written inside the tasks
    lines.map_batches(write_block, batch_format="pyarrow",
                      batch_size=None).materialize()
