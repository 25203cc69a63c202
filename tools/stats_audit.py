"""Per-stage Ray Data stats for any queries() entry — the
measure-don't-guess loop.

Usage: python tools/stats_audit.py <query> [sf_dir]

Runs the named pipeline, consumes it, and prints ``ds.stats()`` — the
per-operator wall/UDF/blocked times the tuning workflow reads to decide
whether a stage is compute-bound (good) or scheduling/exchange-bound
(fix the plan). Driver-side results (pandas) have no stats and say so.
"""
import os
import sys


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E
    qs = E.queries()
    if name not in qs:
        raise SystemExit(f"unknown query {name!r}; one of {sorted(qs)}")
    res = qs[name](sf)
    if hasattr(res, "stats"):
        res = res.materialize()
        print(res.stats())
    else:
        print(f"{name} returns a driver-side result "
              f"({type(res).__name__}) — no per-stage stats")
    ray.shutdown()


if __name__ == "__main__":
    main()
