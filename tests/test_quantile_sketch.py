"""t-digest sketch quantiles: rank-error bound on continuous data,
merge correctness, and the grouped Ray pipeline."""
import numpy as np
import pyarrow as pa
import pytest

from ocr_table_extractor_to_csv_ray.functions.quantiles import (
    TDigest, grouped_sketch_quantiles)


def _rank_error(data_sorted, est, q):
    n = len(data_sorted)
    rank = np.searchsorted(data_sorted, est, side="right")
    return abs(rank / n - q)


@pytest.mark.parametrize("dist", ["lognormal", "uniform", "bimodal"])
def test_tdigest_rank_error_bound(dist):
    rng = np.random.default_rng(7)
    n = 50_000
    if dist == "lognormal":
        data = rng.lognormal(0.0, 1.5, n)
    elif dist == "uniform":
        data = rng.uniform(-5, 5, n)
    else:
        data = np.concatenate([rng.normal(-10, 1, n // 2),
                               rng.normal(10, 0.1, n - n // 2)])
    td = TDigest(delta=200)
    for chunk in np.array_split(data, 23):          # streaming updates
        td.update(chunk)
    s = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.95, 0.99):
        err = _rank_error(s, td.quantile(q), q)
        # arcsine scale: interior error well under 1/delta·const;
        # assert the documented engineering bound
        assert err <= 0.01, (dist, q, err)


def test_tdigest_merge_matches_single():
    """Merging per-chunk digests estimates the same quantiles (within
    the rank bound) as one digest over all data — the mergeability
    contract the grouped pipeline relies on."""
    rng = np.random.default_rng(11)
    data = rng.gamma(2.0, 3.0, 40_000)
    whole = TDigest(200)
    whole.update(data)
    merged = TDigest(200)
    for chunk in np.array_split(data, 17):
        part = TDigest(200)
        part.update(chunk)
        merged.merge(part)
    s = np.sort(data)
    for q in (0.05, 0.5, 0.95):
        assert _rank_error(s, merged.quantile(q), q) <= 0.01, q
        assert _rank_error(s, whole.quantile(q), q) <= 0.01, q


def test_tdigest_memory_bounded():
    td = TDigest(100)
    td.update(np.random.default_rng(3).standard_normal(100_000))
    td._compress()
    assert len(td.means) <= 2 * 100       # O(delta) centroids


def test_tdigest_edge_cases():
    td = TDigest(50)
    assert np.isnan(td.quantile(0.5))
    td.update(np.array([42.0]))
    assert td.quantile(0.0) == td.quantile(1.0) == 42.0
    td2 = TDigest(50)
    td2.update(np.array([1.0, np.nan, 3.0]))    # NaNs dropped
    assert 1.0 <= td2.quantile(0.5) <= 3.0


def test_grouped_sketch_quantiles_pipeline(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(5)
    n = 30_000
    groups = rng.choice(["A", "B", "C"], n)
    vals = np.where(groups == "A", rng.lognormal(0, 1, n),
                    np.where(groups == "B", rng.uniform(0, 100, n),
                             rng.normal(50, 5, n)))
    t = pa.table({"g": pa.array(groups), "v": pa.array(vals)})
    out = (grouped_sketch_quantiles(rd.from_arrow(t).repartition(9),
                                    "g", "v", qs=(0.5, 0.95))
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert list(out.columns) == ["g", "p50_est", "p95_est"]
    assert len(out) == 3
    for gname in "ABC":
        sub = np.sort(vals[groups == gname])
        row = out[out["g"] == gname].iloc[0]
        assert _rank_error(sub, row["p50_est"], 0.5) <= 0.015
        assert _rank_error(sub, row["p95_est"], 0.95) <= 0.015
