"""Entity-linking stages.

- ``CpeLinkStage``: the reference's CPE dictionary point-lookup join J1
  (``data_collection/cve_collection.py:399-420``) as an actor-pool
  map_batches: dictionary loaded once per actor, left-outer semantics
  with found/miss stub rows.

- ``AliasLinker``: the graft's alias-based entity linker. Surface forms
  are single tokens (FIXTURES.md §2.3); blocking key = the lowercased
  token; candidates = all dictionary rows sharing the block key; the
  link score is the dictionary prior; best candidate = (max prior, then
  min entity_id). Fully vectorized: pandas explode + isin + dict map.

At 100 TB the alias dictionary is the small side: it is loaded once per
actor from Parquet (shardable by block-key hash if it outgrows worker
RAM — SURVEY.md §2.5 T2), never shipped per batch.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from uckg_ray.functions.scalars import titles_to_json, truncate_long_fraction
from uckg_ray.patterns import CPE_COMPILED


class CpeLinkStage:
    """Turn batches → one row per distinct (turn, CPE mention) with the
    dictionary lookup result (or a dictionary_found=false stub)."""

    def __init__(self, cpe_dict_path: str):
        cpe = pq.read_table(cpe_dict_path)
        self.lookup = {}
        for name, nid, lm, titles in zip(
            cpe.column("cpeName").to_pylist(), cpe.column("cpeNameId").to_pylist(),
            cpe.column("lastModified").to_pylist(), cpe.column("titles").to_pylist(),
        ):
            self.lookup[name] = (nid, truncate_long_fraction(lm),
                                 titles_to_json(titles))

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        turn = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        C, T, NAME, NID, LM, TI, FOUND = [], [], [], [], [], [], []
        for c, t, txt in zip(conv, turn, texts):
            seen = set()
            for m in CPE_COMPILED.finditer(txt or ""):
                if m.group() in seen:
                    continue
                seen.add(m.group())
                name = m.group()
                hit = self.lookup.get(name)
                C.append(c); T.append(t); NAME.append(name)
                if hit is not None:
                    NID.append(hit[0]); LM.append(hit[1]); TI.append(hit[2])
                    FOUND.append(True)
                else:
                    NID.append(None); LM.append(None); TI.append(None)
                    FOUND.append(False)
        return pa.Table.from_pydict(
            {"conv_id": C, "turn_idx": pa.array(T, pa.int32()), "cpeName": NAME,
             "cpeNameId": pa.array(NID, pa.string()),
             "lastModified": pa.array(LM, pa.string()),
             "titles": pa.array(TI, pa.string()),
             "dictionary_found": pa.array(FOUND, pa.bool_())},
        )


def load_alias_table(alias_dict_path: str) -> pd.DataFrame:
    return pq.read_table(alias_dict_path).to_pandas()


def best_candidates(alias_df: pd.DataFrame) -> dict[str, tuple[str, str]]:
    """block_key → (entity_id, entity_type) of the best-scoring candidate
    (max prior, ties broken by min entity_id)."""
    d = alias_df.sort_values(["block_key", "prior", "entity_id"],
                             ascending=[True, False, True])
    first = d.drop_duplicates("block_key", keep="first")
    return {r.block_key: (r.entity_id, r.entity_type) for r in first.itertuples()}


class AliasLinker:
    """Turn batches → distinct (turn, alias) link rows with the best entity.

    Tokenization is a plain split on single spaces, mirrored exactly by
    ``string_split(lower(text), ' ')`` in the DuckDB oracle.
    """

    def __init__(self, alias_dict_path: str):
        df = load_alias_table(alias_dict_path)
        self.best = best_candidates(df)
        self.keys = frozenset(self.best)

    def __call__(self, batch: pa.Table) -> pa.Table:
        df = batch.select(["conv_id", "turn_idx", "text"]).to_pandas()
        df["word"] = df["text"].str.lower().str.split(" ")
        ex = df[["conv_id", "turn_idx", "word"]].explode("word")
        ex = ex[ex["word"].isin(self.keys)]
        ex = ex.drop_duplicates(["conv_id", "turn_idx", "word"])
        ent = ex["word"].map(self.best)
        ex = ex.assign(
            alias=ex["word"],
            entity_id=[e[0] for e in ent],
            entity_type=[e[1] for e in ent],
        ).drop(columns=["word"])
        return pa.Table.from_pydict(
            {
                "conv_id": ex["conv_id"].tolist(),
                "turn_idx": pa.array(ex["turn_idx"].tolist(), pa.int32()),
                "alias": ex["alias"].tolist(),
                "entity_id": ex["entity_id"].tolist(),
                "entity_type": ex["entity_type"].tolist(),
            }
        )
