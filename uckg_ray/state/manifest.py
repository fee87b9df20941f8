"""Per-partition lineage manifests for resumable runs.

Mirrors the reference's checkpoint state (SQLite ``cve_meta`` offset row,
``data_collection/cve_collection.py:311-336,462-475``) at a distributed
granularity: each shard group writes its outputs plus a manifest JSON
recording the input fingerprint, row counts, wall time and throughput;
a rerun skips groups whose manifest matches the current inputs.
"""

from __future__ import annotations

import hashlib
import json
import os


def shard_fingerprint(files: list[str]) -> str:
    """Content-identity fingerprint of a group of input files (name+size),
    the analogue of the reference's SHA-256 snapshot compare
    (``process/shared_functions.py:58-64``)."""
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f.encode())
        h.update(str(st.st_size).encode())
        h.update(str(st.st_mtime_ns).encode())  # same-size rewrites invalidate
    return h.hexdigest()


def manifest_path(group_dir: str) -> str:
    return os.path.join(group_dir, "manifest.json")


def group_is_complete(group_dir: str, files: list[str],
                      flags: str = "") -> bool:
    """A group output is reusable only if BOTH the input fingerprint and
    the pipeline flags (e.g. whether alias markers were emitted) match —
    resuming a --no-canonicalize run into a canonicalizing one must
    re-extract, not silently produce zero rewrites."""
    mp = manifest_path(group_dir)
    if not os.path.exists(mp):
        return False
    try:
        with open(mp) as fh:
            m = json.load(fh)
    except (json.JSONDecodeError, OSError):
        return False
    return (m.get("fingerprint") == shard_fingerprint(files)
            and m.get("flags", "") == flags
            and m.get("complete", False))


def write_group_manifest(group_dir: str, files: list[str], *, rows_in: int,
                         edges_out: int, wall_sec: float,
                         flags: str = "") -> dict:
    m = {
        "fingerprint": shard_fingerprint(files),
        "flags": flags,
        "input_files": sorted(os.path.basename(f) for f in files),
        "rows_in": rows_in,
        "edges_out": edges_out,
        "wall_sec": round(wall_sec, 4),
        "edges_per_sec": round(edges_out / wall_sec, 2) if wall_sec > 0 else None,
        "complete": True,
    }
    tmp = manifest_path(group_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh, indent=1)
    os.replace(tmp, manifest_path(group_dir))
    return m


def build_status(out_dir: str) -> dict:
    """Status probe over a build output dir — the analogue of the
    reference's ``check_status`` gates (``entry.py:29-71``,
    ``shared_functions.py:121-174``): never-started / incomplete /
    complete, with per-group progress and throughput from the lineage
    manifests."""
    shards_root = os.path.join(out_dir, "shards")
    global_mf = os.path.join(out_dir, "MANIFEST.json")
    groups = []
    if os.path.isdir(shards_root):
        for d in sorted(os.listdir(shards_root)):
            mp = os.path.join(shards_root, d, "manifest.json")
            if not d.startswith("group-"):
                continue
            try:
                with open(mp) as fh:
                    m = json.load(fh)
                groups.append({"group": d, "complete": m.get("complete", False),
                               "rows_in": m.get("rows_in"),
                               "edges_out": m.get("edges_out"),
                               "edges_per_sec": m.get("edges_per_sec")})
            except (OSError, json.JSONDecodeError):
                groups.append({"group": d, "complete": False})
    state = "never_started"
    if groups:
        state = "incomplete"
    final = None
    if os.path.exists(global_mf):
        try:
            with open(global_mf) as fh:
                final = json.load(fh)
            # a stale global manifest does not trump incomplete groups
            # from a newer run into the same out_dir
            if not groups or all(g.get("complete") for g in groups):
                state = "complete"
        except (OSError, json.JSONDecodeError):
            pass
    return {"state": state,
            "groups_complete": sum(1 for g in groups if g.get("complete")),
            "groups_total": len(groups), "groups": groups, "final": final}


def write_global_manifest(out_dir: str, payload: dict) -> None:
    tmp = os.path.join(out_dir, "MANIFEST.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(payload, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "MANIFEST.json"))
