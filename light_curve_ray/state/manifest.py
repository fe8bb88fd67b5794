"""Per-partition lineage + checkpoint manifests (SURVEY §2b-O11).

Ray Data retries tasks within a run but has no cross-run job resume, so
resume is an explicit engine design: each completed output partition commits
a small JSON manifest AFTER its parquet files are fully written (write to a
temp path, rename — rename is atomic on POSIX so a crash never leaves a
manifest pointing at partial data).  On restart the planner lists manifests,
drops already-done input fragments from the read, and appends the rest.
Partition identity is a deterministic function of the input fragment list, so
re-running the same job is idempotent.

Manifest fields (lineage + metrics, NS "per-partition lineage + metrics"):
    partition_id, input_fragments, row_count, content_hash, wall_time_s,
    extra metrics dict.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class Manifest:
    partition_id: str
    input_fragments: list
    row_count: int
    content_hash: str
    wall_time_s: float
    metrics: dict = field(default_factory=dict)


def _manifest_path(manifest_dir: str, partition_id: str) -> str:
    return os.path.join(manifest_dir, f"{partition_id}.manifest.json")


def partition_id_for(fragments: list) -> str:
    """Deterministic partition id from its input fragment names."""
    h = hashlib.sha256("\n".join(sorted(fragments)).encode()).hexdigest()[:16]
    return f"part-{h}"


def partition_done(manifest_dir: str, partition_id: str) -> bool:
    return os.path.exists(_manifest_path(manifest_dir, partition_id))


def write_manifest(manifest_dir: str, m: Manifest) -> str:
    """Atomic commit: write temp, fsync, rename."""
    os.makedirs(manifest_dir, exist_ok=True)
    path = _manifest_path(manifest_dir, m.partition_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
    return path


def read_manifests(manifest_dir: str) -> list:
    out = []
    if not os.path.isdir(manifest_dir):
        return out
    for name in sorted(os.listdir(manifest_dir)):
        if name.endswith(".manifest.json"):
            with open(os.path.join(manifest_dir, name)) as f:
                out.append(Manifest(**json.load(f)))
    return out


def pending_fragments(manifest_dir: str, all_fragments: list) -> list:
    """Input fragments not yet covered by any committed manifest."""
    done = set()
    for m in read_manifests(manifest_dir):
        done.update(m.input_fragments)
    return [f for f in all_fragments if f not in done]
