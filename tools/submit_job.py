"""Launch the flagship resumable extraction as a Ray job (the north
rule's deployment mode: ``ray job submit`` on a fixed-size multi-node
cluster).

Cluster mode — a real deployment with a reachable job server::

    python tools/submit_job.py --address http://head:8265 IN OUT \
        --layout dynamic --num-shards 64 --wait

packages this repo as the job's ``working_dir`` and submits the SAME
entrypoint the CLI exposes::

    python -m ocr_table_extractor_to_csv_ray extract IN OUT \
        --resumable --num-shards 64 --layout dynamic

Re-submitting after a failure is the resume path: shards whose lineage
record matches their input fingerprint are skipped
(``pipelines/extract.py::run_extraction_resumable``).

Local mode — this sandbox has no dashboard/job server, so
``--local`` runs the IDENTICAL entrypoint as a subprocess with
``RAY_ADDRESS=local``: the exact driver code path a cluster job
executes, minus the HTTP submission hop. The end-to-end test
(``tests/test_job_submit.py``) drives this mode and verifies the
lineage records.
"""
from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# large/irrelevant paths excluded from the packaged working_dir — the
# job needs the package + entry modules only
WORKING_DIR_EXCLUDES = [
    ".git", "oracle_expected", "tests", "tools", "*.md", "*.json",
]


def build_entrypoint(input_dir: str, out_dir: str, layout: str = "dynamic",
                     num_shards: int = 8) -> str:
    """The job's driver command — byte-identical between cluster
    submission and the local subprocess fallback."""
    return (f"python -m ocr_table_extractor_to_csv_ray extract "
            f"{shlex.quote(input_dir)} {shlex.quote(out_dir)} "
            f"--resumable --num-shards {int(num_shards)} "
            f"--layout {shlex.quote(layout)}")


def submit_cluster(address: str, entrypoint: str, wait: bool = True,
                   poll_s: float = 5.0) -> str:
    """Submit via the Ray Jobs API; returns the job id. ``wait`` tails
    the job status until a terminal state and raises on failure."""
    from ray.job_submission import JobStatus, JobSubmissionClient

    client = JobSubmissionClient(address)
    job_id = client.submit_job(
        entrypoint=entrypoint,
        runtime_env={"working_dir": REPO_ROOT,
                     "excludes": WORKING_DIR_EXCLUDES},
    )
    print(json.dumps({"job_id": job_id, "entrypoint": entrypoint}))
    if wait:
        terminal = {JobStatus.SUCCEEDED, JobStatus.FAILED, JobStatus.STOPPED}
        while True:
            status = client.get_job_status(job_id)
            if status in terminal:
                break
            time.sleep(poll_s)
        print(client.get_job_logs(job_id), file=sys.stderr)
        if status != JobStatus.SUCCEEDED:
            raise RuntimeError(f"job {job_id} ended {status}")
    return job_id


def run_local(entrypoint: str, num_cpus: int | None = None) -> int:
    """Run the entrypoint as a local subprocess (no job server). The
    subprocess owns its own `ray.init(address='local')` session — same
    isolation a cluster job driver gets."""
    env = dict(os.environ, RAY_ADDRESS="local")
    if num_cpus:
        env["RAY_GRAFT_CPUS"] = str(num_cpus)
    proc = subprocess.run(shlex.split(entrypoint), cwd=REPO_ROOT, env=env)
    return proc.returncode


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="submit_job")
    p.add_argument("input"), p.add_argument("output")
    p.add_argument("--layout", default="dynamic")
    p.add_argument("--num-shards", type=int, default=8)
    p.add_argument("--address", default=None,
                   help="Ray dashboard address (http://head:8265); "
                        "omit with --local")
    p.add_argument("--local", action="store_true",
                   help="run the entrypoint as a local subprocess "
                        "(sandbox fallback — no job server)")
    p.add_argument("--no-wait", action="store_true")
    args = p.parse_args(argv)
    entrypoint = build_entrypoint(args.input, args.output, args.layout,
                                  args.num_shards)
    if args.local or not args.address:
        return run_local(entrypoint)
    submit_cluster(args.address, entrypoint, wait=not args.no_wait)
    return 0


if __name__ == "__main__":
    sys.exit(main())
