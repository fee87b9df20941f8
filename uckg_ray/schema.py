"""Arrow schemas for every table that crosses a stage boundary."""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# The triple stream — the engine's true IR, like the reference's out.ttl
# (process/shared_functions.py:82-119). conv_id/turn_idx are per-row
# lineage; side-table triples carry conv_id="" / turn_idx=-1.
EDGE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_literal", pa.bool_()),
        ("obj_datatype", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
    ]
)

EDGE_KEY_COLS = ["subj", "pred", "obj", "obj_is_literal", "obj_datatype"]

MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("ent_type", pa.string()),
        ("ent_id", pa.string()),
    ]
)

NODE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("classes", pa.string()),   # '|'-joined sorted distinct class IRIs
        ("n_edges", pa.int64()),
        ("n_literals", pa.int64()),
    ]
)
