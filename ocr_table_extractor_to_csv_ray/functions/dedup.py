"""Corpus deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shuffle discipline (the point at 100 TB):

- **exact**: content hash added in a vectorized ``map_batches`` (cheap,
  streaming), then ONE ``groupby(hash)`` keeping the min ``doc_id`` per
  group — the only all-to-all, and it moves (hash, doc_id) pairs, not
  document text (generalizes the reference's path-pair dedup set,
  ``dataset_cli.py:189-195``).
- **MinHash-LSH**: signatures per batch (no shuffle) → explode to
  ``(band, band_key, doc_id)`` rows, ~rows × n_bands small ints → ONE
  ``groupby(band, band_key)`` emitting candidate pairs → pairs verified
  by signature-estimated (or exact n-gram) Jaccard → union-find over
  the (tiny) surviving pair set on the driver → broadcast cluster map.
- **SimHash**: 64-bit fingerprints per batch → band buckets (4×16 bit)
  → same candidate/verify/cluster path with Hamming distance.
- **embedding near-dup**: random-hyperplane LSH buckets per batch →
  within-bucket pairwise cosine ≥ τ → union-find.

The union-find runs on candidate PAIRS, never on documents: with sane
thresholds pairs ≪ corpus. At 100 TB replace the driver union-find
with a few rounds of min-label propagation (groupby on component id);
the pair-generation stages are unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Iterable, List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import shingle_hashes

# ---------------------------------------------------------------------------
# exact dedup

def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Add ``content_hash`` = sha1 hex of the raw column value."""
    vals = batch[column].to_pylist()
    h = pa.array(
        [hashlib.sha1((v or "").encode("utf-8")).hexdigest() for v in vals],
        pa.string(),
    )
    out = batch
    if "content_hash" in out.column_names:
        out = out.drop_columns(["content_hash"])
    return out.append_column("content_hash", h)


def exact_dedup(ds, id_column: str = "doc_id", column: str = "text"):
    """Keep the smallest ``id_column`` per distinct column value.

    Returns a Dataset of ``(content_hash, doc_id)`` — survivors.
    sha1 collisions are treated as equality (2^-80 at any real scale).
    """
    import functools
    from ray.data.aggregate import Min

    hashed = ds.select_columns([id_column, column]).map_batches(
        functools.partial(content_hash_batch, column=column),
        batch_format="pyarrow",
    ).select_columns([id_column, "content_hash"])
    return hashed.groupby("content_hash").aggregate(
        Min(id_column, alias_name=id_column)
    )


# ---------------------------------------------------------------------------
# MinHash signatures

_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``sig[i] = min over shingles of (a_i * s + b_i) mod 2^61-1``.

    Vectorized: (n_shingles × n_perm) product in uint64 with the
    standard Mersenne fold so the mod never overflows.
    """
    if len(shingles) == 0:
        return np.full(len(a), np.uint64(_MERSENNE))
    s = (shingles & np.uint64(_MERSENNE))[:, None]
    with np.errstate(over="ignore"):
        lo = s * a[None, :]  # wraps mod 2^64; fold below corrects to mod p
        x = (lo & np.uint64(_MERSENNE)) + (lo >> np.uint64(61)) + b[None, :]
        x = (x & np.uint64(_MERSENNE)) + (x >> np.uint64(61))
    x = np.where(x >= _MERSENNE, x - _MERSENNE, x)
    return x.min(axis=0).astype(np.uint64)


class MinHashStage:
    """Actor-pool stage: permutation params built once per actor."""

    def __init__(self, n_perm: int = 128, k: int = 3, seed: int = 7) -> None:
        self.a, self.b = _perm_params(n_perm, seed)
        self.k = k
        self.n_perm = n_perm

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        cache: Dict[str, int] = {}
        sigs = np.empty((len(texts), self.n_perm), np.uint64)
        n_sh = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            sh = shingle_hashes(t, self.k, cache)
            n_sh[i] = len(sh)
            sigs[i] = minhash_signature(sh, self.a, self.b)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).astype(np.int64)), self.n_perm
        )
        out = batch.drop_columns(
            [c for c in ("minhash", "n_shingles") if c in batch.column_names])
        out = out.append_column("minhash", col)
        return out.append_column("n_shingles", pa.array(n_sh))


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


# ---------------------------------------------------------------------------
# LSH banding → candidate pairs → clusters

def band_keys(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_docs, n_bands) uint64 band keys: mix each band's rows."""
    n_docs, n_perm = sigs.shape
    r = n_perm // n_bands
    mix = np.uint64(0x9E3779B97F4A7C15)
    keys = np.zeros((n_docs, n_bands), np.uint64)
    with np.errstate(over="ignore"):
        # band b covers sigs[:, b*r:(b+1)*r]
        for b in range(n_bands):
            block = sigs[:, b * r : (b + 1) * r]
            k = np.zeros(n_docs, np.uint64)
            for j in range(r):
                k = k * mix + block[:, j]
            keys[:, b] = k
    return keys


def explode_bands_batch(batch: pa.Table, n_bands: int = 16) -> pa.Table:
    """``(doc_id, minhash)`` rows → ``(band, band_key, doc_id)`` rows.

    Shingle-less documents (empty/one-token text) are NOT banded: they
    all share the sentinel signature and would form one giant O(n²)
    candidate clique at corpus scale. Exact dedup owns the empty-text
    case."""
    if "n_shingles" in batch.column_names:
        batch = batch.filter(pc.greater(batch["n_shingles"], pa.scalar(0)))
    mh = batch["minhash"].combine_chunks() if isinstance(batch["minhash"], pa.ChunkedArray) else batch["minhash"]
    n_docs = len(mh)
    if n_docs == 0:
        return pa.table({
            "band": pa.array([], pa.int32()),
            "band_key": pa.array([], pa.int64()),
            "doc_id": pa.array([], batch["doc_id"].type),
        })
    n_perm = mh.type.list_size
    sigs = np.asarray(mh.values.to_numpy(zero_copy_only=False)).astype(np.uint64).reshape(n_docs, n_perm)
    keys = band_keys(sigs, n_bands)
    doc_ids = batch["doc_id"].combine_chunks() if isinstance(batch["doc_id"], pa.ChunkedArray) else batch["doc_id"]
    band = np.tile(np.arange(n_bands, dtype=np.int32), n_docs)
    idx = pa.array(np.repeat(np.arange(n_docs, dtype=np.int64), n_bands))
    return pa.table({
        "band": pa.array(band),
        "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
        "doc_id": doc_ids.take(idx),
    })


def _pairs_from_group(g: pd.DataFrame) -> pd.DataFrame:
    """All intra-bucket candidate pairs (buckets are tiny by design)."""
    ids = np.sort(g["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"left": [], "right": []}, dtype=ids.dtype)
    iu, ju = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"left": ids[iu], "right": ids[ju]})


def _collect_pairs(pairs_ds) -> pd.DataFrame:
    """Materialize the (small) candidate-pair set; normalize the empty
    case (an empty grouped dataset has no columns at all)."""
    df = pairs_ds.to_pandas()
    if len(df) == 0 or "left" not in df.columns:
        return pd.DataFrame({"left": [], "right": []})
    return df.drop_duplicates()


def _dup_bucket_rows(banded, key_cols: List[str]) -> pd.DataFrame:
    """Rows of ``banded`` that share a bucket with at least one other row.

    Two cheap passes instead of a per-bucket ``map_groups`` (which costs
    one Python task per bucket — with mostly-singleton buckets that is
    O(corpus) tiny tasks):
      1. Arrow-native ``groupby.count()`` → the (small) set of buckets
         with ≥ 2 members;
      2. broadcast that key set, vectorized filter of ``banded``.
    The surviving rows (≪ corpus for any sane threshold) come to the
    driver for pairing/verification.
    """
    import ray

    counts = banded.groupby(key_cols).count()
    cnt_col = [c for c in counts.schema().names if c not in key_cols][0]
    dup_keys = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t[cnt_col], pa.scalar(2))),
        batch_format="pyarrow").to_pandas()
    if len(dup_keys) == 0:
        return pd.DataFrame()
    keyset = set(zip(*(dup_keys[c] for c in key_cols)))
    key_ref = ray.put(keyset)

    def _filter(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        cols = [t[c].to_pylist() for c in key_cols]
        mask = [tup in ks for tup in zip(*cols)]
        return t.filter(pa.array(mask))

    return banded.map_batches(_filter, batch_format="pyarrow").to_pandas()


def _pairs_from_dup_rows(rows: pd.DataFrame, key_cols: List[str]) -> pd.DataFrame:
    """Driver-side pairing over the (small) duplicate-bucket rows."""
    if len(rows) == 0:
        return pd.DataFrame({"left": [], "right": []})
    out = [_pairs_from_group(g) for _, g in rows.groupby(key_cols)]
    pairs = pd.concat(out, ignore_index=True) if out else pd.DataFrame({"left": [], "right": []})
    return pairs.drop_duplicates()


class UnionFind:
    def __init__(self) -> None:
        self.parent: Dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller id wins → cluster id == min member id
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def clusters_from_pairs(pairs: Iterable[Tuple]) -> Dict:
    """Union-find over verified pairs → {doc_id: cluster_id(min id)}."""
    uf = UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    return {x: uf.find(x) for x in list(uf.parent)}


def minhash_lsh_dedup(ds, n_perm: int = 128, n_bands: int = 16, k: int = 3,
                      threshold: float = 0.8, seed: int = 7,
                      concurrency: int = 4):
    """Full near-dup pipeline; returns ``(survivors_ds, cluster_map)``.

    survivors_ds = input rows minus non-canonical near-dup members
    (canonical = min doc_id of each cluster). cluster_map is the small
    driver-side {doc_id: cluster_id} dict for the verified duplicates.
    """
    import functools

    # materialized: the signature set is consumed three times (banding,
    # bucket counting, candidate verify) and re-deriving it means
    # re-shingling the whole corpus each time. ~1 KB/doc (n_perm × 8 B);
    # at a scale where that outgrows the object store, checkpoint to
    # parquet instead — the pipeline shape is unchanged.
    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow",
        fn_constructor_kwargs={"n_perm": n_perm, "k": k, "seed": seed},
        concurrency=concurrency,
    ).materialize()
    banded = sigs.select_columns(["doc_id", "minhash", "n_shingles"]).map_batches(
        functools.partial(explode_bands_batch, n_bands=n_bands),
        batch_format="pyarrow",
    )
    dup_rows = _dup_bucket_rows(banded.select_columns(["band", "band_key", "doc_id"]),
                                ["band", "band_key"])
    pairs = _pairs_from_dup_rows(dup_rows, ["band", "band_key"])

    # verify candidates by signature-estimated Jaccard (broadcast sigs of
    # candidate docs only)
    cand_ids = set(pairs["left"]).union(pairs["right"]) if len(pairs) else set()
    verified: List[Tuple] = []
    if cand_ids:
        import ray
        id_arr = pa.array(sorted(cand_ids))
        sig_tbl = (
            sigs.map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"], value_set=id_arr)),
                batch_format="pyarrow",
            )
            .select_columns(["doc_id", "minhash"])
            .to_pandas()
        )
        sig_map = {
            r.doc_id: np.asarray(r.minhash, dtype=np.uint64)
            for r in sig_tbl.itertuples()
        }
        for left, right in zip(pairs["left"], pairs["right"]):
            if estimated_jaccard(sig_map[left], sig_map[right]) >= threshold:
                verified.append((left, right))
    cluster = clusters_from_pairs(verified)
    drop = {d for d, c in cluster.items() if d != c}
    if drop:
        import ray
        drop_ref = ray.put(drop)

        def _filter(t: pa.Table) -> pa.Table:
            import ray as _ray
            dset = _ray.get(drop_ref)
            mask = [d not in dset for d in t["doc_id"].to_pylist()]
            return t.filter(pa.array(mask))

        survivors = ds.map_batches(_filter, batch_format="pyarrow")
    else:
        survivors = ds
    return survivors, cluster


# ---------------------------------------------------------------------------
# n-gram Jaccard dedup (exact verification variant)

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingle_hashes(a, k), shingle_hashes(b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def ngram_jaccard_dedup(ds, k: int = 3, threshold: float = 0.7,
                        n_perm: int = 128, n_bands: int = 32, seed: int = 7):
    """MinHash-LSH candidate generation + EXACT n-gram Jaccard verify.

    Wider banding (more bands → lower LSH threshold) so exact
    verification sees enough candidates; returns (survivors, clusters).
    """
    import functools
    import ray

    sigs = ds.select_columns(["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow",
        fn_constructor_kwargs={"n_perm": n_perm, "k": k, "seed": seed},
        concurrency=4,
    ).materialize()
    banded = sigs.select_columns(["doc_id", "minhash", "n_shingles"]).map_batches(
        functools.partial(explode_bands_batch, n_bands=n_bands),
        batch_format="pyarrow",
    )
    dup_rows = _dup_bucket_rows(banded, ["band", "band_key"])
    pairs = _pairs_from_dup_rows(dup_rows, ["band", "band_key"])
    verified: List[Tuple] = []
    if len(pairs):
        cand_ids = sorted(set(pairs["left"]).union(pairs["right"]))
        id_arr = pa.array(cand_ids)
        texts = (
            ds.select_columns(["doc_id", "text"])
            .map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"], value_set=id_arr)),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        text_map = dict(zip(texts["doc_id"], texts["text"]))
        for left, right in zip(pairs["left"], pairs["right"]):
            if ngram_jaccard(text_map[left], text_map[right], k) >= threshold:
                verified.append((left, right))
    cluster = clusters_from_pairs(verified)
    drop = {d for d, c in cluster.items() if d != c}
    if drop:
        def _filter(t: pa.Table) -> pa.Table:
            mask = [d not in drop for d in t["doc_id"].to_pylist()]
            return t.filter(pa.array(mask))
        return ds.map_batches(_filter, batch_format="pyarrow"), cluster
    return ds, cluster


# ---------------------------------------------------------------------------
# SimHash

class SimHashStage:
    """64-bit SimHash per document (token unigrams, count-weighted)."""

    def __init__(self) -> None:
        self._cache: Dict[str, int] = {}

    def simhash(self, text: str) -> int:
        toks = (text or "").lower().split()
        if not toks:
            return 0
        from .textstats import _token_hashes
        th = _token_hashes(toks, self._cache)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        fps = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        out = batch.drop_columns([c for c in ("simhash",) if c in batch.column_names])
        return out.append_column("simhash", pa.array(fps.astype(np.int64)))


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & 0xFFFFFFFFFFFFFFFF).count("1")


def simhash_dedup(ds, max_hamming: int = 3, concurrency: int = 4):
    """SimHash near-dup: 4×16-bit band buckets (pigeonhole: any pair
    within Hamming ≤ 3 of 64 bits shares at least one of 4 bands) →
    intra-bucket pairs → exact Hamming verify → union-find."""
    fps = ds.select_columns(["doc_id", "text"]).map_batches(
        SimHashStage, batch_format="pyarrow", concurrency=concurrency,
    )

    def _bands(t: pa.Table) -> pa.Table:
        sh = np.asarray(t["simhash"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        n = len(sh)
        doc = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), 4))
        band = np.tile(np.arange(4, dtype=np.int32), n)
        key = np.empty(n * 4, np.int64)
        for b in range(4):
            key[b::4] = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "band": pa.array(band), "band_key": pa.array(key),
            "doc_id": doc.take(idx),
            "simhash": (t["simhash"].combine_chunks() if isinstance(t["simhash"], pa.ChunkedArray) else t["simhash"]).take(idx),
        })

    banded = fps.select_columns(["doc_id", "simhash"]).map_batches(_bands, batch_format="pyarrow")

    dup_rows = _dup_bucket_rows(banded, ["band", "band_key"])
    verified = []
    if len(dup_rows):
        for _, g in dup_rows.groupby(["band", "band_key"]):
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            hs = g["simhash"].to_numpy()
            iu, ju = np.triu_indices(len(ids), k=1)
            for i, j in zip(iu, ju):
                if hamming64(hs[i], hs[j]) <= max_hamming:
                    verified.append((ids[i], ids[j]))
    cluster = clusters_from_pairs(set(verified))
    drop = {d for d, c in cluster.items() if d != c}
    if drop:
        def _filter(t: pa.Table) -> pa.Table:
            mask = [d not in drop for d in t["doc_id"].to_pylist()]
            return t.filter(pa.array(mask))
        return ds.map_batches(_filter, batch_format="pyarrow"), cluster
    return ds, cluster


# ---------------------------------------------------------------------------
# embedding-cosine near-dup

def embedding_neardup(ds, threshold: float = 0.97, n_planes: int = 14,
                      seed: int = 11, id_column: str = "vec_id",
                      vec_column: str = "embedding"):
    """Random-hyperplane LSH buckets → within-bucket pairwise cosine ≥
    threshold → union-find clusters. Returns (survivors, cluster_map).

    One bucket per doc (single LSH table): recall is tunable by
    ``n_planes``; a production run uses multiple tables (same stage
    repeated with different seeds, unioned pairs).
    """
    first = ds.take(1)
    dim = len(first[0][vec_column]) if first else 0
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32) if dim else None

    def _bucket(t: pa.Table) -> pa.Table:
        col = t[vec_column].combine_chunks() if isinstance(t[vec_column], pa.ChunkedArray) else t[vec_column]
        n = len(col)
        flat = np.asarray(col.values.to_numpy(zero_copy_only=False), dtype=np.float32)
        mat = flat.reshape(n, -1)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        unit = mat / np.maximum(norms, 1e-12)
        bits = (unit @ planes) > 0
        key = (bits.astype(np.uint64) << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
        out = pa.table({
            id_column: t[id_column].combine_chunks() if isinstance(t[id_column], pa.ChunkedArray) else t[id_column],
            "bucket": pa.array(key.astype(np.int64)),
            "unit": pa.FixedSizeListArray.from_arrays(pa.array(unit.reshape(-1)), mat.shape[1]),
        })
        return out

    bucketed = ds.select_columns([id_column, vec_column]).map_batches(_bucket, batch_format="pyarrow")

    dup_rows = _dup_bucket_rows(bucketed, ["bucket"])
    verified = []
    if len(dup_rows):
        for _, g in dup_rows.groupby("bucket"):
            g = g.sort_values(id_column)
            ids = g[id_column].to_numpy()
            mat = np.stack([np.asarray(u, dtype=np.float32) for u in g["unit"]])
            sim = mat @ mat.T
            iu, ju = np.triu_indices(len(ids), k=1)
            for i, j in zip(iu[sim[iu, ju] >= threshold], ju[sim[iu, ju] >= threshold]):
                verified.append((ids[i], ids[j]))
    cluster = clusters_from_pairs(set(verified))
    drop = {d for d, c in cluster.items() if d != c}
    if drop:
        def _filter(t: pa.Table) -> pa.Table:
            mask = [d not in drop for d in t[id_column].to_pylist()]
            return t.filter(pa.array(mask))
        return ds.map_batches(_filter, batch_format="pyarrow"), cluster
    return ds, cluster
