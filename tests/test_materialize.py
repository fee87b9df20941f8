"""node_props edge cases surfaced by review: literal-free blocks
(schema stability) and cross-block value merges."""

import pandas as pd
import pytest


def _edges_ds(ray, rows, parts):
    import ray.data
    df = pd.DataFrame(rows, columns=["subj", "pred", "obj",
                                     "obj_is_literal", "obj_datatype"])
    return ray.data.from_pandas(df).repartition(parts)


def test_props_with_literal_free_block(ray_session):
    from uckg_ray.stages.materialize import node_props
    rows = [("s1", "p", "v1", True, "xsd:string")]
    # many IRI-only rows → some blocks have zero literal rows
    rows += [("s2", "rdf:type", f"C{i}", False, "") for i in range(40)]
    out = node_props(_edges_ds(ray_session, rows, 8)).take_all()
    assert out == [{"subj": "s1", "pred": "p", "vals": "v1"}]


def test_props_cross_block_merge(ray_session):
    from uckg_ray.stages.materialize import node_props
    # same (subj,pred) key with values scattered over 6 blocks, with dups
    rows = [("s", "p", f"v{i % 4}", True, "xsd:string") for i in range(12)]
    rows += [("t", "q", "only", True, "xsd:string")]
    out = {(r["subj"], r["pred"]): r["vals"]
           for r in node_props(_edges_ds(ray_session, rows, 6)).take_all()}
    assert out[("s", "p")] == "v0;;v1;;v2;;v3"
    assert out[("t", "q")] == "only"


def test_distinct_edges_rejects_null_key_fields(ray_session):
    """Null key fields would encode to null sort keys and silently
    collapse distinct rows — both encoders must raise instead."""
    import ray.data

    from uckg_ray.stages.materialize import distinct_edges

    df = pd.DataFrame({
        "subj": ["a", "b"], "pred": ["p", "p"], "obj": ["x", "y"],
        "obj_is_literal": [False, False],
        "obj_datatype": ["", None],      # one null field
    })
    for sort in (True, False):
        with pytest.raises(Exception, match="null"):
            distinct_edges(ray.data.from_pandas(df), sort=sort).materialize()


def test_export_sinks_roundtrip(ray_session, tmp_path):
    """JSONL/CSV exports round-trip; N-Triples renders IRIs, plain and
    typed literals with correct escaping."""
    import glob

    import pyarrow as pa
    import ray.data

    from uckg_ray.sinks import export_dataset, export_edges_ntriples

    edges = pa.table({
        "subj": ["http://x/s1", "http://x/s2", "http://x/s3"],
        "pred": ["http://x/p"] * 3,
        "obj": ["http://x/o1", 'he said "hi"\nok', "2024-01-01T00:00:00"],
        "obj_is_literal": [False, True, True],
        "obj_datatype": ["", "xsd:string", "xsd:dateTime"]})
    ds = ray.data.from_arrow(edges)

    export_dataset(ds, str(tmp_path / "j"), fmt="jsonl")
    back = ray.data.read_json(str(tmp_path / "j")).to_pandas()
    assert sorted(back["subj"]) == sorted(edges.column("subj").to_pylist())

    export_dataset(ds.drop_columns(["obj_is_literal"]),
                   str(tmp_path / "c"), fmt="csv")
    backc = ray.data.read_csv(str(tmp_path / "c")).to_pandas()
    assert len(backc) == 3

    export_edges_ntriples(ds, str(tmp_path / "nt"))
    text = "".join(open(f).read()
                   for f in glob.glob(str(tmp_path / "nt" / "*.nt")))
    lines = sorted(l for l in text.splitlines() if l)
    assert "<http://x/s1> <http://x/p> <http://x/o1> ." in lines
    assert ('<http://x/s2> <http://x/p> "he said \\"hi\\"\\nok" .'
            in lines)
    assert ("<http://x/s3> <http://x/p> \"2024-01-01T00:00:00\""
            "^^<http://www.w3.org/2001/XMLSchema#dateTime> ." in lines)


def test_triple_support_provenance(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.materialize import triple_support

    def row(s, p, o, conv, turn):
        return {"subj": s, "pred": p, "obj": o, "obj_is_literal": False,
                "obj_datatype": "", "conv_id": conv, "turn_idx": turn}

    rows = [
        # triple A: 3 turn witnesses over 2 convs (one conv repeats)
        row("a", "p", "b", "conv-b", 2),
        row("a", "p", "b", "conv-a", 5),
        row("a", "p", "b", "conv-a", 1),
        # triple B: single witness
        row("x", "q", "y", "conv-c", 0),
        # dictionary-side emission: excluded
        row("d", "r", "e", "", -1),
    ]
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    t = t.set_column(t.schema.get_field_index("turn_idx"), "turn_idx",
                     t.column("turn_idx").cast(pa.int32()))
    got = {(r["subj"], r["pred"], r["obj"]): r
           for r in triple_support(
               ray.data.from_arrow(t).repartition(3)).take_all()}
    a = got[("a", "p", "b")]
    assert a["n_turns"] == 3 and a["n_convs"] == 2
    assert (a["first_conv"], a["first_turn"]) == ("conv-a", 1)
    b = got[("x", "q", "y")]
    assert b["n_turns"] == 1 and b["n_convs"] == 1
    assert ("d", "r", "e") not in got


def test_keep_witnesses_preserves_multiplicity(ray_session, sf_small_fixtures):
    import os

    import pyarrow as pa

    from uckg_ray.stages.extract import TripleEmitter

    args = (os.path.join(sf_small_fixtures, "cwe_dict.parquet"),
            os.path.join(sf_small_fixtures, "cpe_dict.parquet"),
            os.path.join(sf_small_fixtures, "alias_dict.parquet"))
    batch = pa.table({
        "conv_id": ["c1", "c1", "c2"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": ["user"] * 3,
        # the same CVE mentioned in three turns (twice in one turn)
        "text": ["see CVE-2021-0001 and CVE-2021-0001",
                 "again CVE-2021-0001", "also CVE-2021-0001"],
        "tool": [""] * 3,
        "ts": pa.array([0, 1, 2], pa.timestamp("us")),
    })
    collapsed = TripleEmitter(*args)(batch)
    kept = TripleEmitter(*args, False, True)(batch)

    def wit(t):
        m = pa.compute.equal(t.column("pred"),
                             "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
        f = t.filter(m)
        f = f.filter(pa.compute.equal(
            f.column("subj"),
            "http://purl.org/cyber/uco#VULN-CVE-2021-0001"))
        return sorted(zip(f.column("conv_id").to_pylist(),
                          f.column("turn_idx").to_pylist()))

    assert wit(collapsed) == [("c1", 0)]          # min witness only
    assert wit(kept) == [("c1", 0), ("c1", 1), ("c2", 0)]  # per-turn distinct


def test_kg_version_diff_add_del(ray_session):
    import pyarrow as pa
    import ray.data

    from uckg_ray.stages.materialize import kg_version_diff

    def row(s, conv):
        return {"subj": s, "pred": "p", "obj": "o",
                "obj_is_literal": False, "obj_datatype": "",
                "conv_id": conv, "turn_idx": 0}

    rows = [
        row("both", "conv-0"), row("both", "conv-1"),   # in A and B
        row("only_a", "conv-2"),                        # del
        row("only_b", "conv-3"),                        # add
        row("side", ""),                                # dict-side: excluded
    ]
    t = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    t = t.set_column(t.schema.get_field_index("turn_idx"), "turn_idx",
                     t.column("turn_idx").cast(pa.int32()))
    got = {r["subj"]: r["status"] for r in
           kg_version_diff(ray.data.from_arrow(t).repartition(3))
           .take_all()}
    assert got == {"only_a": "del", "only_b": "add"}
