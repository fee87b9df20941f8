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


def entity_support(mentions, *, num_partitions=None) -> "ray.data.Dataset":
    """Per-entity link-support provenance over the mention stream: for
    every ``(ent_type, ent_id)`` the number of supporting mentions, the
    number of distinct conversations that mention it, and the first /
    last witness ``(conv_id, turn_idx)`` under stable turn ordering —
    the confidence signal an entity-linking stage feeds into
    canonicalization (frequent multi-conversation entities are
    high-confidence link targets; single-witness entities are noise
    candidates). The reference keeps an implicit analogue in its
    count-comparison audits (``data_collection/cve_collection.py``
    record counts); here it is a first-class per-entity provenance
    table.

    ONE pass, ONE exchange: block partials pre-fold to
    (entity, conv_id) rows (mention count + min/max packed witness),
    explicit hash-partition by the entity key, per-partition vectorized
    fold to the final row (the repo's measured-faster alternative to
    chained string-keyed sort aggregates — the first union-of-streams
    version measured 107 s at sf0.1/32 CPUs; this shape ~20×). A hot
    entity's partition load is bounded by the conversation count. The
    witness is packed ``conv_id + '#' + zfill6(turn_idx)`` so a single
    string min/max is the pair ordering (mention conv ids never
    contain characters below ``'#'``)."""
    import polars as pl

    from uckg_ray.config import default_num_partitions

    n_parts = num_partitions or default_num_partitions()

    _PC = pa.schema([("ent", pa.string()), ("conv_id", pa.string()),
                     ("n_mentions", pa.int64()), ("first_w", pa.string()),
                     ("last_w", pa.string()), ("p", pa.int32())])

    def pair_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _PC.empty_table()
        g = (pl.from_arrow(b.select(["ent_type", "ent_id", "conv_id",
                                     "turn_idx"]))
             .with_columns(
                 ent=pl.col("ent_type") + "\x1f" + pl.col("ent_id"),
                 wk=pl.col("conv_id") + "#"
                 + pl.col("turn_idx").cast(pl.Utf8).str.zfill(6))
             .group_by(["ent", "conv_id"])
             .agg(pl.len().cast(pl.Int64).alias("n_mentions"),
                  pl.col("wk").min().alias("first_w"),
                  pl.col("wk").max().alias("last_w"))
             .with_columns(p=(pl.col("ent").hash(seed=0) % n_parts)
                           .cast(pl.Int32)))
        return g.select(["ent", "conv_id", "n_mentions", "first_w",
                         "last_w", "p"]).to_arrow().cast(_PC)

    _FIN = pa.schema(
        [("ent_type", pa.string()), ("ent_id", pa.string()),
         ("n_mentions", pa.int64()), ("n_convs", pa.int64()),
         ("first_conv", pa.string()), ("first_turn", pa.int32()),
         ("last_conv", pa.string()), ("last_turn", pa.int32())])

    def fold_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _FIN.empty_table()
        g = (pl.from_arrow(part.select(["ent", "conv_id", "n_mentions",
                                        "first_w", "last_w"]))
             .group_by(["ent", "conv_id"])
             .agg(pl.col("n_mentions").sum(), pl.col("first_w").min(),
                  pl.col("last_w").max())
             .group_by("ent")
             .agg(pl.col("n_mentions").sum(),
                  pl.len().cast(pl.Int64).alias("n_convs"),
                  pl.col("first_w").min(), pl.col("last_w").max()))
        out = (g.with_columns(
                   pl.col("ent").str.split_exact("\x1f", 1)
                   .struct.rename_fields(["ent_type", "ent_id"])
                   .alias("_e"))
               .select(
                   pl.col("_e").struct.field("ent_type"),
                   pl.col("_e").struct.field("ent_id"),
                   "n_mentions", "n_convs",
                   # witness suffix is fixed-width: '#' + 6 digits
                   pl.col("first_w").str.head(-7).alias("first_conv"),
                   pl.col("first_w").str.tail(6).cast(pl.Int32)
                   .alias("first_turn"),
                   pl.col("last_w").str.head(-7).alias("last_conv"),
                   pl.col("last_w").str.tail(6).cast(pl.Int32)
                   .alias("last_turn")))
        return out.to_arrow().cast(_FIN)

    return (mentions
            .map_batches(pair_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("p")
            .map_groups(lambda t: fold_partition(t.drop_columns(["p"])),
                        batch_format="pyarrow"))


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


def gate_dropped_mentions(mentions, cwe_dict_path: str,
                          ent_type: str = "cwe") -> "ray.data.Dataset":
    """Dictionary-gate audit: mentions of ``ent_type`` whose id is NOT
    in the dictionary — the rows the reference's membership gate
    (``data_collection/cve_collection.py:384-389``) silently drops
    from the KG. Reported with mention and conversation support so a
    curator can triage dictionary gaps. The dictionary is the small
    side: loaded once on the driver, shipped as a frozenset closure
    (ray.put semantics via task capture); the fold is the
    vocabulary-bounded (id, conv) partial + Sum shape."""
    import polars as pl
    from ray.data.aggregate import Sum

    ids = sorted(set(
        pq.read_table(cwe_dict_path, columns=["id_value"])
        .column("id_value").to_pylist()))

    _P = pa.schema([("ent_id", pa.string()), ("conv_id", pa.string()),
                    ("n_mentions", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _P.empty_table()
        df = (pl.from_arrow(b.select(["ent_type", "ent_id", "conv_id"]))
              .filter((pl.col("ent_type") == ent_type)
                      & ~pl.col("ent_id").is_in(ids)))
        if df.height == 0:
            return _P.empty_table()
        g = (df.group_by(["ent_id", "conv_id"])
             .agg(pl.len().cast(pl.Int64).alias("n_mentions")))
        return g.select(["ent_id", "conv_id", "n_mentions"]) \
            .to_arrow().cast(_P)

    def conv_fold(b: pa.Table) -> pa.Table:
        out = pa.schema([("ent_id", pa.string()),
                         ("n_mentions", pa.int64()),
                         ("n_convs", pa.int64())])
        if b.num_rows == 0 or "conv_id" not in b.column_names:
            return out.empty_table()
        g = (pl.from_arrow(b.select(["ent_id", "n_mentions"]))
             .group_by("ent_id")
             .agg(pl.col("n_mentions").sum(),
                  pl.len().cast(pl.Int64).alias("n_convs")))
        return g.select(["ent_id", "n_mentions", "n_convs"]) \
            .to_arrow().cast(out)

    return (mentions
            .map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby(["ent_id", "conv_id"])
            .aggregate(Sum("n_mentions", alias_name="n_mentions"))
            .map_batches(conv_fold, batch_format="pyarrow",
                         batch_size=None)
            .groupby("ent_id")
            .aggregate(Sum("n_mentions", alias_name="n_mentions"),
                       Sum("n_convs", alias_name="n_convs")))


def trending_entities(turns, *, k: int = 5) -> "ray.data.Dataset":
    """Windowed heavy-hitters over the mention stream: the top-``k``
    mentioned entities per UTC day with exact counts — the "trending
    CVEs this week" feed a SOC dashboard draws from the transcript
    stream. Deterministic ties: (count DESC, ent_type, ent_id).

    One scan folds (day, entity) count partials in-block (Rust regex
    scan shared with ``extract_mentions``), then ONE day-hash exchange:
    a day's rows all co-locate (bounded by the entity vocabulary), so
    each partition merges counts AND ranks its days in one vectorized
    pass — no multi-column Ray sort aggregate (that shape measured
    70-80 s at sf0.1's 25k-day span; this one ~8 s)."""
    import polars as pl

    from uckg_ray.config import default_num_partitions
    from uckg_ray.partitioning import key_partition_ids
    from uckg_ray.stages.extract import scan_mentions_flat

    n_parts = default_num_partitions()

    DAY_US = 86_400_000_000
    _P = pa.schema([("day", pa.int64()), ("ent_type", pa.string()),
                    ("ent_id", pa.string()), ("n", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _P.empty_table()
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        days = ts // DAY_US
        flat = scan_mentions_flat(
            b.column("text").combine_chunks()
            if isinstance(b.column("text"), pa.ChunkedArray)
            else b.column("text"))
        frames = []
        for name, (idx, ids) in flat.items():
            if len(idx) == 0:
                continue
            frames.append(pl.DataFrame({
                "day": days[idx], "ent_id": pl.Series(ids, dtype=pl.String)
            }).with_columns(ent_type=pl.lit(name)))
        if not frames:
            return _P.empty_table()
        g = (pl.concat(frames)
             .group_by(["day", "ent_type", "ent_id"])
             .agg(pl.len().cast(pl.Int64).alias("n")))
        t = g.select(["day", "ent_type", "ent_id", "n"]) \
            .to_arrow().cast(_P)
        return t.append_column(
            "p", pa.array(key_partition_ids(
                t.column("day").to_numpy(zero_copy_only=False),
                n_parts), pa.int32()))

    _OUT = pa.schema([("day", pa.int64()), ("ent_type", pa.string()),
                      ("ent_id", pa.string()), ("n", pa.int64()),
                      ("rank", pa.int64())])

    def topk_day(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _OUT.empty_table()
        df = (pl.from_arrow(part)
              .group_by(["day", "ent_type", "ent_id"])
              .agg(pl.col("n").sum())
              .sort(["day", "n", "ent_type", "ent_id"],
                    descending=[False, True, False, False])
              .with_columns(rank=pl.int_range(pl.len()).over("day") + 1)
              .filter(pl.col("rank") <= k))
        return df.select(["day", "ent_type", "ent_id", "n", "rank"]) \
            .to_arrow().cast(_OUT)

    return (turns.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("p")
            .map_groups(lambda t: topk_day(t.drop_columns(["p"])),
                        batch_format="pyarrow"))


def entity_discovery_curve(turns) -> "ray.data.Dataset":
    """KG growth curve: how many NEW entities (never mentioned on any
    earlier day) each UTC day contributes — ``(day, n_new_entities)``,
    the discovery-rate series that tells a KG operator whether the
    entity vocabulary is saturating or still growing with ingest.

    Block partials fold (entity → min day) in-block; one
    vocabulary-bounded Min groupby pins each entity's first day; a
    ≤ days-sized Sum groupby counts the curve. Nothing day- or
    mention-scaled ever leaves the combiners."""
    import polars as pl
    from ray.data.aggregate import Min, Sum

    from uckg_ray.stages.extract import scan_mentions_flat

    DAY_US = 86_400_000_000
    _P = pa.schema([("ent", pa.string()), ("day", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _P.empty_table()
        ts = (b.column("ts").cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        days = ts // DAY_US
        flat = scan_mentions_flat(
            b.column("text").combine_chunks()
            if isinstance(b.column("text"), pa.ChunkedArray)
            else b.column("text"))
        frames = []
        for name, (idx, ids) in flat.items():
            if len(idx) == 0:
                continue
            frames.append(pl.DataFrame({
                "day": days[idx],
                "ent_id": pl.Series(ids, dtype=pl.String)
            }).with_columns(ent=pl.lit(name) + "\x1f" + pl.col("ent_id")))
        if not frames:
            return _P.empty_table()
        g = (pl.concat(frames).group_by("ent")
             .agg(pl.col("day").min()))
        return g.select(["ent", "day"]).to_arrow().cast(_P)

    def day_partial(b: pa.Table) -> pa.Table:
        out = pa.schema([("day", pa.int64()),
                         ("n_new_entities", pa.int64())])
        if b.num_rows == 0:
            return out.empty_table()
        g = (pl.from_arrow(b.select(["day"]))
             .group_by("day")
             .agg(pl.len().cast(pl.Int64).alias("n_new_entities")))
        return g.to_arrow().cast(out)

    return (turns.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
            .groupby("ent").aggregate(Min("day", alias_name="day"))
            .map_batches(day_partial, batch_format="pyarrow",
                         batch_size=None)
            .groupby("day")
            .aggregate(Sum("n_new_entities", alias_name="n_new_entities")))
