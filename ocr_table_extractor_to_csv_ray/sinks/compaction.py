"""Small-file compaction for partitioned Parquet output (beyond-
reference; the ops counterpart of the resumable partitioned sink —
SURVEY.md §2.13).

A resumable 100 TB run writes one directory per shard; stragglers and
retries leave long tails of kilobyte files that later readers pay for
in per-file open/footer costs. Compaction here is FILE-level, not
row-level: files are bin-packed by on-disk size into groups of
≲ ``target_bytes`` (first-fit decreasing — deterministic: size desc,
name asc), and each group is rewritten as ONE output file by ONE Ray
task that streams row-group-at-a-time through a ``ParquetWriter`` (a
group never sits fully in memory). Groups run in parallel; a group is
the unit of retry (rerunning a failed group cannot duplicate rows in
other outputs).

Raw ``ray.remote`` tasks are the right tool (not ``Dataset``): the
semantics are per-FILE-GROUP manifest handling — which files fuse into
which output, names stable for resume — something a row-streaming
Dataset deliberately abstracts away.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import pyarrow as pa
import pyarrow.parquet as pq


def plan_groups(files: Sequence[Tuple[str, int]],
                target_bytes: int) -> List[List[str]]:
    """First-fit-decreasing bin packing of (path, size) into groups of
    total size ≲ target_bytes. A single file larger than the target
    gets its own group (never split — file-level compaction only).
    Deterministic: sorted by (size desc, path asc), bins probed in
    creation order."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be > 0, got {target_bytes}")
    order = sorted(files, key=lambda f: (-f[1], f[0]))
    bins: List[List[str]] = []
    room: List[int] = []
    for path, size in order:
        for i, r in enumerate(room):
            if size <= r:
                bins[i].append(path)
                room[i] -= size
                break
        else:
            bins.append([path])
            # may go negative for an oversized file — that CLOSES the
            # bin (even a zero-byte file must not join it, or the
            # "over target ⇒ singleton" retry invariant breaks)
            room.append(target_bytes - size)
    return bins


def _compact_group(paths: Sequence[str], out_path: str) -> Tuple[int, int]:
    """Stream every row group of every input file into one output file.
    Returns (rows, files_read). Memory high-water is one row group."""
    writer = None
    rows = 0
    try:
        for p in sorted(paths):              # stable row order per group
            f = pq.ParquetFile(p)
            for i in range(f.num_row_groups):
                rg = f.read_row_group(i)
                if writer is None:
                    writer = pq.ParquetWriter(out_path, rg.schema)
                rows += rg.num_rows
                writer.write_table(rg)
            if writer is None and f.schema_arrow is not None:
                # 0-row input: still emit the schema so readers see it
                writer = pq.ParquetWriter(out_path, f.schema_arrow)
    finally:
        if writer is not None:
            writer.close()
    return rows, len(paths)


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_bytes: int = 256 << 20,
                        max_parallel_groups: int = 16) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` (non-recursive) into
    ``out_dir/compact-<i>.parquet`` files of ≲ ``target_bytes`` input
    each. Returns a manifest dict: rows in/out, file counts, and the
    group plan (for resume bookkeeping). Inputs are not modified."""
    import ray

    files = [(e.path, e.stat().st_size)
             for e in os.scandir(in_dir)
             if e.is_file() and e.name.endswith(".parquet")]
    if not files:
        raise ValueError(f"compact_parquet_dir: no parquet files in {in_dir}")
    os.makedirs(out_dir, exist_ok=True)
    groups = plan_groups(files, target_bytes)

    task = ray.remote(num_cpus=1)(_compact_group)
    results = []
    pending = []
    for i, g in enumerate(groups):
        out_path = os.path.join(out_dir, f"compact-{i:05d}.parquet")
        pending.append(task.remote(g, out_path))
        if len(pending) >= max_parallel_groups:   # bounded in-flight set
            done, pending = ray.wait(pending, num_returns=1)
            results.extend(ray.get(done))
    results.extend(ray.get(pending))

    rows = sum(r for r, _ in results)
    return {
        "files_in": len(files),
        "files_out": len(groups),
        "rows": rows,
        "groups": [sorted(g) for g in groups],
    }
