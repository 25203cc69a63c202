"""End-to-end `ray job submit` path (north rule deployment mode).

The sandbox has no dashboard/job server, so the test drives
``tools/submit_job.py --local``: the IDENTICAL driver entrypoint a
cluster job would run (``python -m ocr_table_extractor_to_csv_ray
extract IN OUT --resumable``) executed as a subprocess that owns its
own Ray session — then verifies the sharded output and per-shard
lineage records, and that a re-submission resumes (skips every
finished shard)."""
import glob
import json
import os
import shlex
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _write_corpus(path, n=120, files=3):
    from ocr_table_extractor_to_csv_ray.sources.synthetic import corpus_table
    os.makedirs(path, exist_ok=True)
    t = corpus_table(n)
    per = (t.num_rows + files - 1) // files
    for i in range(files):
        pq.write_table(t.slice(i * per, per), os.path.join(path, f"p{i}.parquet"))
    return t.num_rows


def test_job_submit_local_end_to_end(tmp_path):
    import submit_job

    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    n_docs = _write_corpus(inp)

    ep = submit_job.build_entrypoint(inp, out, layout="dynamic", num_shards=2)
    # the cluster entrypoint is the same string JobSubmissionClient gets
    assert "--resumable" in ep and "-m ocr_table_extractor_to_csv_ray" in ep

    rc = submit_job.run_local(ep)
    assert rc == 0

    # sharded partitioned output, one row per input doc
    data = pq.ParquetDataset(
        glob.glob(os.path.join(out, "shard=*", "*.parquet"))).read()
    assert data.num_rows == n_docs

    # per-shard lineage records: fingerprint + metrics checkpointed
    recs = sorted(glob.glob(os.path.join(out, "_lineage", "shard-*.json")))
    assert len(recs) == 2
    for r in recs:
        rec = json.load(open(r))
        assert rec["doc_count"] > 0 and rec["input_fingerprint"]
        assert rec["latency_s"] > 0 and rec["doc_id_range"]

    # resubmit == resume: all shards skipped, output unchanged
    proc = subprocess.run(
        shlex.split(ep), cwd=submit_job.REPO_ROOT, capture_output=True,
        text=True, env=dict(os.environ, RAY_ADDRESS="local"))
    assert proc.returncode == 0
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["shards_ran"] == [] and sorted(info["shards_skipped"]) == [0, 1]


def test_submit_cluster_entrypoint_packaging(monkeypatch):
    """Cluster mode wiring (no job server in-sandbox): the submission
    must package the repo as working_dir and pass the entrypoint
    through unchanged."""
    import submit_job

    calls = {}

    class FakeClient:
        def __init__(self, address):
            calls["address"] = address

        def submit_job(self, *, entrypoint, runtime_env):
            calls["entrypoint"] = entrypoint
            calls["runtime_env"] = runtime_env
            return "raysubmit_TEST"

    import types
    fake_mod = types.SimpleNamespace(JobSubmissionClient=FakeClient,
                                     JobStatus=None)
    monkeypatch.setitem(sys.modules, "ray.job_submission", fake_mod)
    ep = submit_job.build_entrypoint("/data/in", "/data/out", "generic", 64)
    job_id = submit_job.submit_cluster("http://head:8265", ep, wait=False)
    assert job_id == "raysubmit_TEST"
    assert calls["address"] == "http://head:8265"
    assert calls["entrypoint"] == ep
    assert calls["runtime_env"]["working_dir"] == submit_job.REPO_ROOT
    assert ".git" in calls["runtime_env"]["excludes"]
