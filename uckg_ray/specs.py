"""Declarative extractor specs — the user-extension surface.

The reference's plugin shape is "new triples = edit a declarative RML
.ttl mapping; no Python change" (SURVEY.md §2.10, the ``rr:TriplesMap``
grammar of ``mapping/*/*_rml.ttl``). The Ray-native equivalent: an
``ExtractorSpec`` is data — a subject template, a predicate IRI and an
object source — compiled into one vectorized ``map_batches`` function.
Users register specs; no engine code changes.

Template grammar: ``{col}`` substitutes a transcript column
(conv_id, turn_idx, role, text, tool); object sources are either a
column reference, a constant IRI, or a literal constant.

Example::

    spec = ExtractorSpec(
        name="turn-role",
        subject_template="http://example.com/ucoex#TURN-{conv_id}-{turn_idx}",
        predicate="http://example.com/ucoex#hasRole",
        object_column="role", object_is_literal=True,
        object_datatype="xsd:string")
    ds = apply_specs(turns, [spec])
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

from ray.data import Dataset

from uckg_ray.schema import EDGE_SCHEMA

_FIELD_RX = re.compile(r"\{(\w+)\}")


@dataclass(frozen=True)
class ExtractorSpec:
    name: str
    subject_template: str
    predicate: str
    object_column: str | None = None      # column ref …
    object_constant: str | None = None    # … or a constant
    object_is_literal: bool = True
    object_datatype: str = "xsd:string"
    # optional row filter: (column, required value) equality gate, like
    # the reference's predicate-filtered iterators (attack_rml.ttl:253+)
    where_col: str | None = None
    where_val: str | None = None


def _render_template(template: str, batch: pa.Table) -> list[str]:
    """Vectorized-enough template render: one pass building per-row
    strings from the referenced columns only."""
    fields = _FIELD_RX.findall(template)
    cols = {f: batch.column(f).to_pylist() for f in fields}
    parts = _FIELD_RX.split(template)  # [lit0, f1, lit1, f2, ...]
    n = batch.num_rows
    out = []
    for i in range(n):
        s = []
        for j, p in enumerate(parts):
            if j % 2 == 0:
                s.append(p)
            else:
                s.append(str(cols[p][i]))
        out.append("".join(s))
    return out


def compile_specs(specs: list[ExtractorSpec]):
    """Specs → one map_batches function emitting edge rows."""

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        S, P, O, LIT, DT, C, T = [], [], [], [], [], [], []
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        for spec in specs:
            b = batch
            cv, tn = conv, turn
            if spec.where_col is not None:
                mask = pc.equal(b.column(spec.where_col), spec.where_val)
                b = b.filter(mask)
                cv = b.column("conv_id").to_pylist()
                tn = b.column("turn_idx").to_pylist()
            # drop rows where any referenced column is null — stringifying
            # nulls would mint literal 'None' IRIs/values
            import pyarrow.compute as pc2
            needed = set(_FIELD_RX.findall(spec.subject_template))
            if spec.object_column is not None:
                needed.add(spec.object_column)
            mask = None
            for col in needed:
                v = pc2.is_valid(b.column(col))
                mask = v if mask is None else pc2.and_(mask, v)
            if mask is not None:
                b = b.filter(mask)
                cv = b.column("conv_id").to_pylist()
                tn = b.column("turn_idx").to_pylist()
            subs = _render_template(spec.subject_template, b)
            if spec.object_column is not None:
                objs = [str(x) for x in b.column(spec.object_column).to_pylist()]
            else:
                objs = [spec.object_constant] * b.num_rows
            S.extend(subs)
            P.extend([spec.predicate] * b.num_rows)
            O.extend(objs)
            LIT.extend([spec.object_is_literal] * b.num_rows)
            DT.extend([spec.object_datatype if spec.object_is_literal else ""]
                      * b.num_rows)
            C.extend(cv)
            T.extend(tn)
        return pa.Table.from_pydict(
            {"subj": S, "pred": P, "obj": O,
             "obj_is_literal": pa.array(LIT, pa.bool_()),
             "obj_datatype": DT, "conv_id": C,
             "turn_idx": pa.array(T, pa.int32())},
            schema=EDGE_SCHEMA,
        )

    return emit


def apply_specs(turns: Dataset, specs: list[ExtractorSpec]) -> Dataset:
    return turns.map_batches(compile_specs(specs), batch_format="pyarrow")
