"""Per-partition lineage records → resumable restarts.

Output layout (north rule: "resumable from checkpoint with
per-partition lineage + metrics"):

    out/
      shard=0000/part-*.parquet     # one directory per input shard
      shard=0001/...
      _lineage/shard-0000.json      # written AFTER the shard's data

A lineage record is written only after its shard's output is complete,
so on restart every shard either has a record (skip) or is re-run from
scratch after its partial output directory is removed — idempotent
because a shard always maps to the same input files
(``input_fingerprint`` guards against the input changing between runs).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass
from typing import Dict, List, Optional


@dataclass
class LineageRecord:
    shard_id: int
    input_files: List[str]
    input_fingerprint: str
    row_count: int
    doc_count: int
    latency_s: float
    doc_id_range: Optional[List[str]] = None   # [min, max] doc_id in the shard
    extra: Optional[Dict] = None


def shard_input_files(files: List[str], num_shards: int) -> List[List[str]]:
    """Deterministic round-robin of sorted input files into shards."""
    files = sorted(files)
    num_shards = max(1, min(num_shards, len(files)))
    shards: List[List[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(files):
        shards[i % num_shards].append(f)
    return shards


def fingerprint_files(files: List[str]) -> str:
    h = hashlib.sha1()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{f}|{st.st_size}".encode())
    return h.hexdigest()


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def shard_dir(out_dir: str, shard_id: int) -> str:
    return os.path.join(out_dir, f"shard={shard_id:04d}")


def record_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(_lineage_dir(out_dir), f"shard-{shard_id:04d}.json")


def load_record(out_dir: str, shard_id: int) -> Optional[LineageRecord]:
    p = record_path(out_dir, shard_id)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return LineageRecord(**json.load(fh))


def write_record(out_dir: str, rec: LineageRecord) -> None:
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    p = record_path(out_dir, rec.shard_id)
    tmp = p + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(asdict(rec), fh)
    os.replace(tmp, p)  # atomic publish


def shard_is_done(out_dir: str, shard_id: int, files: List[str]) -> bool:
    rec = load_record(out_dir, shard_id)
    return rec is not None and rec.input_fingerprint == fingerprint_files(files)


def reset_shard(out_dir: str, shard_id: int) -> None:
    """Remove a shard's partial output (and stale record) before re-run."""
    p = record_path(out_dir, shard_id)
    if os.path.exists(p):
        os.remove(p)
    d = shard_dir(out_dir, shard_id)
    if os.path.isdir(d):
        shutil.rmtree(d)


class ShardTimer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.latency_s = time.perf_counter() - self.t0
        return False
