"""Quiet-window A/B for revenue_by_segment (VERDICT r4 "What's wrong" #3).

Round 4 measured revenue_by_segment at 14.42 s vs round 3's 10.18 s
(1.42x) while the CPU probe moved only ~9%; BASELINE.md attributed the
swing to first-touch page-provisioning noise. This script settles it:
interleaved min-of-4 of revenue_by_segment against three envelope
comparators from the round-3 suite, with cpu/mem probes around every
pass, in ONE fresh Ray session at sf0.1/32 CPUs.

Usage: python tools/ab_revenue.py [sf_dir]  (prints one JSON line)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["revenue_by_segment", "star_join_region_revenue",
           "events_hourly", "dedup_lines"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E
    import bench

    q = E.queries()
    times = {k: [] for k in QUERIES}
    probes = []
    # one untimed provisioning pass (the bench harness's warm rule)
    for name in QUERIES:
        _consume(q[name](sf_dir))
    for rnd in range(4):
        probes.append({"cpu": round(bench._cpu_probe(), 1),
                       "mem": round(bench._mem_probe(), 1)})
        for name in QUERIES:            # interleaved, not back-to-back
            t0 = time.perf_counter()
            _consume(q[name](sf_dir))
            times[name].append(round(time.perf_counter() - t0, 3))
    probes.append({"cpu": round(bench._cpu_probe(), 1),
                   "mem": round(bench._mem_probe(), 1)})
    ray.shutdown()
    print(json.dumps({
        "min": {k: min(v) for k, v in times.items()},
        "all": times,
        "probes": probes,
        "sf_dir": sf_dir,
    }))


def _consume(res):
    import pandas as pd
    if isinstance(res, pd.DataFrame):
        return len(res)
    try:
        return res.count()
    except AttributeError:
        return res.num_rows


if __name__ == "__main__":
    main()
