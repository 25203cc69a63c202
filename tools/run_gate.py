"""Simulate the driver's correctness gate: run each queries() entry and
its oracle_sql() side-by-side at the given sf dir, compare row count,
schema (sorted column names) and values (rows sorted, floats rounded).

Usage: python tools/run_gate.py /root/testdata/sf0.01 [query ...]
"""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, osql = E.queries(), E.oracle_sql()
    results = {}
    for name in qs:
        if only and name not in only:
            continue
        if name not in osql:
            results[name] = "no_oracle"
            continue
        try:
            res = qs[name](sf)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
            elif not isinstance(res, pd.DataFrame):
                res = pd.DataFrame(res)
            exp = con.execute(osql[name]).df()
            a, b = canon(res), canon(exp)
            rows = len(a) == len(b)
            schema = list(a.columns) == list(b.columns)
            vals = rows and schema and a.equals(b)
            if not vals and rows and schema:
                # numeric tolerance fallback
                try:
                    pd.testing.assert_frame_equal(a, b, rtol=1e-6, atol=1e-9,
                                                  check_dtype=False)
                    vals = True
                except AssertionError:
                    pass
            results[name] = ("PASS" if (rows and schema and vals) else
                             f"FAIL rows={len(a)}/{len(b)} schema={schema} vals={vals}")
            print(f"{name}: {results[name]}", flush=True)
        except Exception as ex:  # noqa: BLE001
            results[name] = f"ERROR {type(ex).__name__}: {ex}"
            print(f"{name}: {results[name]}", flush=True)
    ray.shutdown()
    bad = {k: v for k, v in results.items()
           if v not in ("PASS", "no_oracle")}
    print(json.dumps({"pass": sum(1 for v in results.values() if v == 'PASS'),
                      "no_oracle": sum(1 for v in results.values() if v == 'no_oracle'),
                      "bad": bad}))


if __name__ == "__main__":
    main()
