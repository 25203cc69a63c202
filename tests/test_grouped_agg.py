"""Bucketed vectorized grouped aggregation (functions/agg.py).

The operator replaces Ray's per-row sort-aggregate combine for
high-cardinality key spaces; these tests pin its results to a pandas
oracle across key shapes (single/multi, int/string, with NaN groups)
and assert the Arrow-block output contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_table_extractor_to_csv_ray.functions.agg import grouped_agg, grouped_sum


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True)


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def test_grouped_sum_matches_pandas(ray_session, rng):
    import ray.data as rd

    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 3_000, n).astype("int64"),
        "v": rng.integers(-50, 50, n).astype("int64"),
        "w": rng.normal(size=n),
    })
    ds = rd.from_pandas([df.iloc[i::7].reset_index(drop=True)
                         for i in range(7)])
    got = grouped_sum(ds, "k", {"v": "sv", "w": "sw"},
                      num_buckets=16, count="n").to_pandas()
    want = df.groupby("k", as_index=False).agg(
        sv=("v", "sum"), sw=("w", "sum"), n=("v", "size"))
    want["n"] = want["n"].astype("int64")
    g, w = _canon(got), _canon(want)
    assert g["k"].tolist() == w["k"].tolist()
    assert g["sv"].tolist() == w["sv"].tolist()
    assert g["n"].tolist() == w["n"].tolist()
    np.testing.assert_allclose(g["sw"].to_numpy(), w["sw"].to_numpy(),
                               rtol=1e-12)
    # dtype contract: int sums stay int64
    assert got["sv"].dtype == np.dtype("int64")
    assert got["n"].dtype == np.dtype("int64")


def test_grouped_agg_min_max_multikey_strings(ray_session, rng):
    import ray.data as rd

    n = 5_000
    df = pd.DataFrame({
        "a": rng.choice(list("xyz"), n),
        "b": rng.integers(0, 40, n).astype("int64"),
        "v": rng.integers(0, 10_000, n).astype("int64"),
    })
    ds = rd.from_pandas([df.iloc[:2500], df.iloc[2500:].reset_index(drop=True)])
    got = grouped_agg(ds, ["a", "b"],
                      {"lo": ("v", "min"), "hi": ("v", "max"),
                       "s": ("v", "sum")}, num_buckets=8).to_pandas()
    want = df.groupby(["a", "b"], as_index=False).agg(
        lo=("v", "min"), hi=("v", "max"), s=("v", "sum"))
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_grouped_agg_count_only_is_group_count(ray_session, rng):
    """DISTINCT-style use: no agg columns, just the count."""
    import ray.data as rd

    keys = rng.integers(0, 500, 8_000).astype("int64")
    ds = rd.from_arrow([pa.table({"k": keys[i::4]}) for i in range(4)])
    got = grouped_agg(ds, "k", {}, num_buckets=16, count="n").to_pandas()
    want = pd.Series(keys).value_counts().sort_index()
    got = got.sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.tolist()


def test_grouped_agg_output_blocks_are_arrow(ray_session, rng):
    import ray
    import ray.data as rd

    df = pd.DataFrame({"k": rng.integers(0, 50, 1000).astype("int64"),
                       "v": np.ones(1000, dtype="int64")})
    out = grouped_sum(rd.from_pandas([df]), "k", ["v"],
                      num_buckets=4).materialize()
    types = set()
    for bundle in out.iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            blk = ray.get(ref)
            if len(blk):               # sort may emit empty pandas blocks
                types.add(type(blk).__name__)
    assert types == {"Table"}


def test_grouped_agg_rejects_non_associative(ray_session):
    import ray.data as rd

    ds = rd.from_pandas([pd.DataFrame({"k": [1], "v": [1.0]})])
    with pytest.raises(ValueError, match="sum.*min.*max|supports"):
        grouped_agg(ds, "k", {"m": ("v", "mean")})


def test_grouped_agg_downstream_of_hash_join(ray_session, rng):
    """The motivating composition: a join (whose empty buckets emit
    pandas blocks that would poison a native aggregate) feeding a
    high-cardinality grouped count."""
    import ray.data as rd
    from ocr_table_extractor_to_csv_ray.functions.join import hash_join

    n = 4_000
    lhs = pd.DataFrame({"k": rng.integers(0, 300, n).astype("int64"),
                        "x": rng.integers(0, 9, n).astype("int64")})
    rhs = pd.DataFrame({"k": rng.integers(0, 300, n).astype("int64"),
                        "y": rng.integers(0, 9, n).astype("int64")})
    joined = hash_join(rd.from_pandas([lhs]), rd.from_pandas([rhs]),
                       key="k", num_buckets=8)
    got = grouped_sum(joined, ["x", "y"], {}, num_buckets=16,
                      count="n").to_pandas()
    want = (lhs.merge(rhs, on="k").groupby(["x", "y"], as_index=False)
            .size().rename(columns={"size": "n"}))
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
