"""Generate ``oracle_expected/*.parquet`` — REFERENCE-DERIVED expected
results the driver's DuckDB oracle can join against.

The driver can only express oracles as SQL over the testdata views, and
geometry kernels are not SQL-expressible — but they ARE deterministic.
So this tool executes the reference repo's own code (``tests/refimpl``
imports ``/root/reference/src``) over the exact inputs the ``queries()``
entries consume and checkpoints the per-document expected
``(n_rows, n_cols)`` (plus deterministic hash fingerprints / split
labels recomputed from their spec, independent of the engine modules).

Keying: every row carries ``sig`` = ``"{count}-{sum_n_chars}"`` of the
sf tier's documents table (the tiers share neither content nor,
between 0.001 and 0.01, row count — the signature disambiguates), and
corpus-derived files also carry ``n_docs``. The oracle SQL filters on
the signature computed from the live ``documents`` view, so a
mismatched corpus yields 0 rows — a loud failure, never a silent pass.

Run from the repo root (no Ray needed — pure refimpl + pyarrow):

    python tools/gen_oracle_expected.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.refimpl import ref_extract  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "oracle_expected")
SF_DIRS = {
    "/root/testdata/sf0.001": 0.001,
    "/root/testdata/sf0.01": 0.01,
    "/root/testdata/sf0.1": 0.1,
}
LAYOUTS = ("generic", "dynamic", "financial", "professional")


def doc_sig(sf_dir: str) -> str:
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["n_chars"])
    import pyarrow.compute as pc
    return f"{t.num_rows}-{pc.sum(t['n_chars']).as_py()}"


def corpus_n(sf: float) -> int:
    return max(500, int(100_000 * sf))


def build_corpus(n: int):
    """Replicates pipelines.extract.generate_corpus content (same
    corpus_table blocks, seed 42, 1000 docs/block) without Ray."""
    from ocr_table_extractor_to_csv_ray.sources.synthetic import corpus_table
    tables = []
    for s in range(0, n, 1000):
        tables.append(corpus_table(min(1000, n - s), 42, start=s))
    return pa.concat_tables(tables).select(["doc_id", "spans"])


def grid_shape(header, rows) -> tuple:
    widths = [len(r) for r in rows] + ([len(header)] if header else [])
    return len(rows), (max(widths) if widths else 0)


# ---------------------------------------------------------------------------
# corpus-based: the four layouts + the knobs config + the hOCR roundtrip

def expected_extract(corpus, layout: str, **knobs) -> pd.DataFrame:
    out = []
    spans_rows = corpus["spans"].to_pylist()
    ids = corpus["doc_id"].to_pylist()
    for doc_id, spans in zip(ids, spans_rows):
        header, rows, _num = ref_extract(spans, layout, **knobs)
        n_rows, n_cols = grid_shape(header, rows)
        out.append({"doc_id": str(doc_id), "n_rows": n_rows, "n_cols": n_cols})
    df = pd.DataFrame(out)
    df["n_rows"] = df["n_rows"].astype("int32")
    df["n_cols"] = df["n_cols"].astype("int32")
    return df


def expected_hocr_roundtrip(corpus) -> pd.DataFrame:
    """hocr_parse_extract drops non-word spans and re-parses the rest
    through the hOCR markup roundtrip; expected = reference extraction
    over the roundtripped word tokens."""
    from ocr_table_extractor_to_csv_ray.sources.hocr import (
        parse_hocr_batch, tokens_to_hocr)
    out = []
    spans_rows = corpus["spans"].to_pylist()
    ids = corpus["doc_id"].to_pylist()
    for doc_id, spans in zip(ids, spans_rows):
        toks = []
        for s in spans or []:
            if s["kind"] != "word":
                continue
            ref = s["media_ref"][len("bbox://p"):]
            page_s, coords = ref.split("/", 1)
            parts = coords.split("/", 1)
            x1, y1, x2, y2 = (int(v) for v in parts[0].split(","))
            lid = parts[1] if len(parts) > 1 else None
            toks.append((s["text"], int(page_s), x1, y1, x2, y2, lid))
        rt = parse_hocr_batch(pa.table({
            "doc_id": pa.array([str(doc_id)]),
            "hocr": pa.array([tokens_to_hocr(toks)]),
        }))
        header, rows, _ = ref_extract(rt["spans"].to_pylist()[0], "generic")
        n_rows, n_cols = grid_shape(header, rows)
        out.append({"doc_id": str(doc_id), "n_rows": n_rows, "n_cols": n_cols})
    df = pd.DataFrame(out)
    df["n_rows"] = df["n_rows"].astype("int32")
    df["n_cols"] = df["n_cols"].astype("int32")
    return df


# ---------------------------------------------------------------------------
# documents-based: text render, hash split, rolling fingerprint

def expected_text_render(sf_dir: str) -> pd.DataFrame:
    from ocr_table_extractor_to_csv_ray.sources.render import render_documents_batch
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    rendered = render_documents_batch(docs)
    return expected_extract(rendered, "generic")


def expected_split_hash(sf_dir: str, eval_ratio: float = 0.2,
                        seed: int = 42) -> pd.DataFrame:
    """Spec: crc32(f"{seed}:{doc_id}") % 1e6 < ratio*1e6 → eval."""
    ids = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                        columns=["doc_id"])["doc_id"].to_pylist()
    cut = int(eval_ratio * 1_000_000)
    rows = [{"doc_id": i,
             "split": "eval" if zlib.crc32(f"{seed}:{i}".encode()) % 1_000_000 < cut
             else "train"} for i in ids]
    return pd.DataFrame(rows)


def expected_rolling_fp(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Spec (independent reimplementation — no engine imports):
    token hash = little-endian blake2b-64 of the lowercased token;
    shingle hash = golden-ratio positional mix over k-token windows
    (whole doc if < k tokens); fp_min = min over the unique shingle
    set, viewed as int64."""
    MIX = np.uint64(0x9E3779B97F4A7C15)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (text or "").lower().split()
        th = np.array([int.from_bytes(
            hashlib.blake2b(w.encode("utf-8"), digest_size=8).digest(), "little")
            for w in toks], dtype=np.uint64)
        with np.errstate(over="ignore"):
            if len(th) == 0:
                continue  # list_element(…, 0) has no value — mirror absence
            if len(th) < k:
                sh = np.zeros(1, np.uint64)
                for j in range(len(th)):
                    sh = sh * MIX + th[j]
            else:
                sh = np.zeros(len(th) - k + 1, np.uint64)
                for j in range(k):
                    sh = sh * MIX + th[j: len(th) - k + 1 + j]
        fp_min = int(np.unique(sh)[0].astype(np.int64))
        rows.append({"doc_id": doc_id, "fp_min": fp_min})
    df = pd.DataFrame(rows)
    df["fp_min"] = df["fp_min"].astype("int64")
    return df


KNOBS = dict(expected_n_cols=4, table_bbox=(0, 0, 2000, 2400),
             header_regexes=["concepto", "descripcion"])


# ---------------------------------------------------------------------------
# independent sequential reimplementations of the corpus dedup / sketch
# operators (spec: functions/dedup.py + functions/sketch.py module
# docstrings — MinHash-LSH, SimHash banding, hyperplane LSH, HLL; all
# public textbook algorithms). Nothing here imports the engine's
# dedup/textstats/sketch code: the driver oracle cross-checks the
# distributed Ray orchestration against these single-threaded
# re-derivations of the same published algorithms.

_M61 = (1 << 61) - 1
_GOLD64 = np.uint64(0x9E3779B97F4A7C15)
_STAR = 64      # buckets with >= _STAR members pair as a star to min id


def expected_bpe(sf_dir: str, n_merges: int = 10) -> pd.DataFrame:
    """Sequential BPE merge learning — the independent oracle for
    functions/bpe.py::learn_bpe. Same contract: whitespace words,
    character start symbols (no end-of-word marker), merges applied in
    rank order left-to-right, argmax tie-break (count DESC, lhs ASC,
    rhs ASC)."""
    from collections import Counter

    _, texts = _load_docs(sf_dir)
    # null texts contribute no words (matches learn path's dropna)
    wf = Counter(w for t in texts if t is not None for w in str(t).split())

    def apply(symbols, merges):
        for a, b in merges:
            if len(symbols) < 2:
                break
            out, i, n = [], 0, len(symbols)
            while i < n:
                if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        return symbols

    merges, rows = [], []
    for rank in range(n_merges):
        pc_counts = Counter()
        for w, f in wf.items():
            syms = apply(list(w), merges)
            for i in range(len(syms) - 1):
                pc_counts[(syms[i], syms[i + 1])] += f
        if not pc_counts:
            break
        (lhs, rhs), n = sorted(pc_counts.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((lhs, rhs))
        rows.append({"merge_rank": rank, "lhs": lhs, "rhs": rhs,
                     "pair_count": n})
    return pd.DataFrame(rows, columns=["merge_rank", "lhs", "rhs",
                                       "pair_count"]).astype(
        {"merge_rank": "int64", "lhs": str, "rhs": str,
         "pair_count": "int64"})


def _tok64(tok: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")


def _shingle_set(text: str, k: int = 3) -> np.ndarray:
    toks = (text or "").lower().split()
    th = np.array([_tok64(t) for t in toks], dtype=np.uint64)
    if len(th) == 0:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        if len(th) < k:
            sh = np.zeros(1, np.uint64)
            for j in range(len(th)):
                sh = sh * _GOLD64 + th[j]
            return np.unique(sh)
        sh = np.zeros(len(th) - k + 1, np.uint64)
        for j in range(k):
            sh = sh * _GOLD64 + th[j: len(th) - k + 1 + j]
    return np.unique(sh)


def _minhash_sigs(sh_sets, n_perm: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, size=n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _M61, size=n_perm, dtype=np.int64).astype(np.uint64)
    sigs = np.empty((len(sh_sets), n_perm), np.uint64)
    for i, sh in enumerate(sh_sets):
        if len(sh) == 0:
            sigs[i] = np.uint64(_M61)
            continue
        s = (sh & np.uint64(_M61))[:, None]
        with np.errstate(over="ignore"):
            lo = s * a[None, :]
            x = (lo & np.uint64(_M61)) + (lo >> np.uint64(61)) + b[None, :]
            x = (x & np.uint64(_M61)) + (x >> np.uint64(61))
        x = np.where(x >= _M61, x - _M61, x)
        sigs[i] = x.min(axis=0)
    return sigs


def _lsh_buckets(sigs: np.ndarray, n_bands: int, keep: np.ndarray) -> dict:
    """{(band, band_key): [row indices]} over rows where keep is True."""
    n_perm = sigs.shape[1]
    r = n_perm // n_bands
    buckets: dict = {}
    with np.errstate(over="ignore"):
        for bnd in range(n_bands):
            blk = sigs[:, bnd * r:(bnd + 1) * r]
            key = np.zeros(len(sigs), np.uint64)
            for j in range(r):
                key = key * _GOLD64 + blk[:, j]
            for i in np.nonzero(keep)[0]:
                buckets.setdefault((bnd, int(key[i])), []).append(int(i))
    return buckets


def _bucket_pair_indices(m: int):
    if m < 2:
        return []
    if m <= _STAR:
        return [(i, j) for i in range(m) for j in range(i + 1, m)]
    return [(0, j) for j in range(1, m)]


def _min_cluster_survivors(all_ids, pairs):
    """Union-find (min id = cluster id) → survivor id list."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    drop = {x for x in parent if find(x) != x}
    return [i for i in all_ids if i not in drop]


def _load_docs(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


def expected_dedup_text(sf_dir: str) -> dict:
    """dedup_minhash + dedup_ngram + dedup_simhash survivor sets
    (shingles/signatures computed once, shared — same k/seed/n_perm)."""
    ids, texts = _load_docs(sf_dir)
    sh_sets = [_shingle_set(tx, 3) for tx in texts]
    sigs = _minhash_sigs(sh_sets, n_perm=128, seed=7)
    keep = np.array([len(s) > 0 for s in sh_sets])

    def _sorted_members(members):
        return sorted(members, key=lambda i: ids[i])

    # --- minhash: n_bands=16, estimated-Jaccard >= 0.8 verify
    pairs = set()
    for members in _lsh_buckets(sigs, 16, keep).values():
        mem = _sorted_members(members)
        for ii, jj in _bucket_pair_indices(len(mem)):
            a_i, b_i = mem[ii], mem[jj]
            if (sigs[a_i] == sigs[b_i]).mean() >= 0.8:
                pairs.add((ids[a_i], ids[b_i]))
    minhash_df = pd.DataFrame(
        {"doc_id": _min_cluster_survivors(ids, pairs)})

    # --- ngram: n_bands=32 candidates, EXACT Jaccard >= 0.7 verify
    pairs = set()
    for members in _lsh_buckets(sigs, 32, keep).values():
        mem = _sorted_members(members)
        for ii, jj in _bucket_pair_indices(len(mem)):
            a_i, b_i = mem[ii], mem[jj]
            sa, sb = sh_sets[a_i], sh_sets[b_i]
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac = (inter / union) if union else (
                1.0 if len(sa) == 0 and len(sb) == 0 else 0.0)
            if jac >= 0.7:
                pairs.add((ids[a_i], ids[b_i]))
    ngram_df = pd.DataFrame({"doc_id": _min_cluster_survivors(ids, pairs)})

    # --- simhash: 64-bit count-weighted unigram fingerprint,
    #     4×16-bit bands, Hamming <= 3 verify (all docs banded)
    fps = []
    for tx in texts:
        toks = (tx or "").lower().split()
        if not toks:
            fps.append(0)
            continue
        th = np.array([_tok64(t) for t in toks], np.uint64)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        fps.append(int(((v > 0).astype(np.uint64)
                        << np.arange(64, dtype=np.uint64)).sum()))
    buckets: dict = {}
    for i, fp in enumerate(fps):
        for bnd in range(4):
            buckets.setdefault((bnd, (fp >> (16 * bnd)) & 0xFFFF), []).append(i)
    pairs = set()
    for members in buckets.values():
        mem = _sorted_members(members)
        for ii, jj in _bucket_pair_indices(len(mem)):
            a_i, b_i = mem[ii], mem[jj]
            if bin(fps[a_i] ^ fps[b_i]).count("1") <= 3:
                pairs.add((ids[a_i], ids[b_i]))
    simhash_df = pd.DataFrame({"doc_id": _min_cluster_survivors(ids, pairs)})

    for df in (minhash_df, ngram_df, simhash_df):
        df["doc_id"] = df["doc_id"].astype("int64")
    return {"dedup_minhash": minhash_df, "dedup_ngram": ngram_df,
            "dedup_simhash": simhash_df}


def expected_dedup_embedding(sf_dir: str, threshold: float = 0.97,
                             n_planes: int = 14, seed: int = 11) -> pd.DataFrame:
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    col = t["embedding"].combine_chunks()
    n = len(col)
    flat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                      dtype=np.float32)
    mat = flat.reshape(n, -1)
    unit = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    planes = np.random.default_rng(seed).standard_normal(
        (mat.shape[1], n_planes)).astype(np.float32)
    bits = (unit @ planes) > 0
    key = (bits.astype(np.uint64)
           << np.arange(n_planes, dtype=np.uint64)[None, :]).sum(axis=1)
    buckets: dict = {}
    for i, kv in enumerate(key):
        buckets.setdefault(int(kv), []).append(i)
    pairs = set()
    for members in buckets.values():
        mem = sorted(members, key=lambda i: ids[i])
        for ii, jj in _bucket_pair_indices(len(mem)):
            a_i, b_i = mem[ii], mem[jj]
            if float(np.dot(unit[a_i], unit[b_i])) >= threshold:
                pairs.add((ids[a_i], ids[b_i]))
    df = pd.DataFrame({"vec_id": _min_cluster_survivors(ids, pairs)})
    df["vec_id"] = df["vec_id"].astype("int64")
    return df


def expected_kmeans(sf_dir: str, k: int = 8, n_iters: int = 5) -> pd.DataFrame:
    """k-means oracle: sequential Lloyd loop replaying the engine spec —
    init = k smallest vec_ids, einsum distances (fixed summation order),
    per-row int64 fixed-point vector quantization before the cluster
    sums (order-independent), empty clusters keep their centroid."""
    scale = float(1 << 20)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy())
    col = t["embedding"].combine_chunks()
    mat = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                     np.float64).reshape(len(ids), -1)
    sel = np.argsort(ids, kind="mergesort")[:k]    # k smallest ids, ascending
    centroids = mat[sel].copy()

    def assign(m, c):
        d = (-2.0 * np.einsum("nd,kd->nk", m, c)
             + np.einsum("kd,kd->k", c, c)[None, :])
        return np.argmin(d, axis=1)

    for _ in range(n_iters):
        a = assign(mat, centroids)
        q = np.round(mat * scale).astype(np.int64)
        sums = np.zeros_like(centroids, dtype=np.int64)
        np.add.at(sums, a, q)
        counts = np.bincount(a, minlength=k)
        nz = counts > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz].astype(np.float64) / scale / counts[nz][:, None]
    a = assign(mat, centroids)
    df = pd.DataFrame({"vec_id": ids.astype("int64"),
                       "cluster": a.astype("int64")})
    return df


def _hll_seq_estimate(tokens, p: int = 12) -> int:
    """Sequential HLL (Flajolet et al., standard bias/linear-counting
    corrections) over a token set — the exact expected value of the
    engine's mergeable-sketch pipelines (register-wise max makes merge
    order irrelevant)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    for tok in tokens:
        h = _tok64(tok)
        idx = h >> (64 - p)
        rest = ((h << p) | ((1 << p) - 1)) & ((1 << 64) - 1)
        lz = 0
        while lz <= 64 - p and not (rest >> (63 - lz)) & 1:
            lz += 1
        regs[idx] = max(regs[idx], lz + 1)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)
    return round(float(est))


def expected_vocab_hll(sf_dir: str, p: int = 12) -> pd.DataFrame:
    import re as _re
    _, texts = _load_docs(sf_dir)
    tokens = set()
    for tx in texts:
        tokens.update(_re.split(r"\s+", (tx or "").strip()))
    return pd.DataFrame({"vocab_estimate": pd.array(
        [_hll_seq_estimate(tokens, p)], dtype="int64")})


def expected_bloom_flag(sf_dir: str, m_bits: int = 1 << 20,
                        k: int = 4) -> pd.DataFrame:
    """Independent sequential Bloom filter (double hashing from the two
    md5 halves, h2 forced odd) over even-doc_id texts; every doc probed.
    Bit-exact vs the engine because the hash spec has no RNG — false
    positives included."""
    def positions(tx):
        d = hashlib.md5((tx or "").encode("utf-8")).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        return [(h1 + i * h2) & (m_bits - 1) for i in range(k)]

    ids, texts = _load_docs(sf_dir)
    bits = bytearray(m_bits // 8)
    for i, tx in zip(ids, texts):
        if int(i) % 2 == 0:
            for p in positions(tx):
                bits[p >> 3] |= 1 << (p & 7)
    seen = [all((bits[p >> 3] >> (p & 7)) & 1 for p in positions(tx))
            for tx in texts]
    return pd.DataFrame({"doc_id": pd.array([int(i) for i in ids],
                                            dtype="int64"),
                         "maybe_seen": pd.array(seen, dtype="bool")})


def expected_vocab_hll_by_lang(sf_dir: str, p: int = 12) -> pd.DataFrame:
    """Per-language distinct-token HLL (the grouped-sketch aggregate)."""
    import re as _re
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["lang", "text"])
    per_lang: dict = {}
    for lang, tx in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
        per_lang.setdefault(lang, set()).update(
            _re.split(r"\s+", (tx or "").strip()))
    langs = sorted(per_lang)
    return pd.DataFrame({
        "lang": langs,
        "vocab_estimate": pd.array(
            [_hll_seq_estimate(per_lang[l], p) for l in langs],
            dtype="int64"),
    })


def expected_train(corpus, n_epochs: int = 4, lr: float = 2.0,
                   n_buckets: int = 32) -> pd.DataFrame:
    """A5 trainer oracle: sequential full-batch GD over the reference's
    executed teacher examples, replaying the engine's spec — linear
    softmax on [bias, bbox/1000, w, h, hashed-token one-hot] features,
    per-document int64 fixed-point gradient quantization (scale 2^20).
    Integer gradient sums are order-independent, so this single-threaded
    loop must equal the distributed run bit for bit."""
    from tests.refimpl import ref_build_example
    label2id = {"OTHER": 0}
    for p in ("HEADER", "BODY"):
        for i in range(6):
            label2id[f"{p}_COL_{i}"] = len(label2id)
    C = len(label2id)
    scale = float(1 << 20)
    n_geom = 7
    d = n_geom + n_buckets

    docs = []
    for spans in corpus["spans"].to_pylist():
        ex = ref_build_example(spans)
        if ex is None:
            continue
        n = len(ex["words"])
        X = np.zeros((n, d), np.float64)
        X[:, 0] = 1.0
        bb = np.asarray(ex["bboxes"], np.float64).reshape(n, 4) / 1000.0
        X[:, 1:5] = bb
        X[:, 5] = bb[:, 2] - bb[:, 0]
        X[:, 6] = bb[:, 3] - bb[:, 1]
        for i, w in enumerate(ex["words"]):
            h = int.from_bytes(hashlib.blake2b(
                (w or "").lower().encode("utf-8"), digest_size=8).digest(),
                "little")
            X[i, n_geom + h % n_buckets] = 1.0
        y = np.array([label2id.get(l, 0) for l in ex["labels"]], np.int64)
        docs.append((X, y))

    def softmax(z):
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    W = np.zeros((C, d), np.float64)
    initial_loss = None
    n_tok_total = sum(len(y) for _, y in docs)
    for _ in range(n_epochs):
        gsum = np.zeros(W.size, np.int64)
        loss_q = 0
        for X, y in docs:
            P = softmax(X @ W.T)
            loss = -np.log(np.maximum(P[np.arange(len(y)), y], 1e-300)).sum()
            P[np.arange(len(y)), y] -= 1.0
            gsum += np.round((P.T @ X).reshape(-1) * scale).astype(np.int64)
            loss_q += int(round(loss * scale))
        if n_tok_total == 0:
            break
        if initial_loss is None:
            initial_loss = loss_q / scale / n_tok_total
        W = W - lr * (gsum.astype(np.float64) / scale / n_tok_total).reshape(W.shape)
    correct = 0
    loss_q = 0
    for X, y in docs:
        P = softmax(X @ W.T)
        loss_q += int(round(
            -np.log(np.maximum(P[np.arange(len(y)), y], 1e-300)).sum() * scale))
        correct += int((P.argmax(axis=1) == y).sum())
    return pd.DataFrame({
        "n_examples": pd.array([len(docs)], dtype="int64"),
        "n_tokens": pd.array([n_tok_total], dtype="int64"),
        "initial_loss": pd.array([initial_loss if initial_loss is not None
                                  else 0.0], dtype="float64"),
        "final_loss": pd.array(
            [loss_q / scale / n_tok_total if n_tok_total else 0.0],
            dtype="float64"),
        "token_accuracy": pd.array(
            [correct / n_tok_total if n_tok_total else 0.0], dtype="float64"),
    })


def expected_train_stepsync(corpus, n_epochs: int = 1, lr: float = 0.05,
                            global_batch_size: int = 32,
                            weight_decay: float = 0.0,
                            n_buckets: int = 32) -> pd.DataFrame:
    """Step-synchronous trainer oracle (functions/train.py::
    train_token_classifier_stepsync spec): sequential minibatch AdamW
    over the doc_id-sorted examples — one optimizer step per global
    minibatch, per-document int64 gradient quantization (scale 2^20) so
    the distributed all-reduce must match bit for bit."""
    from tests.refimpl import ref_build_example
    label2id = {"OTHER": 0}
    for p in ("HEADER", "BODY"):
        for i in range(6):
            label2id[f"{p}_COL_{i}"] = len(label2id)
    C = len(label2id)
    scale = float(1 << 20)
    n_geom = 7
    d = n_geom + n_buckets

    docs = []
    for doc_id, spans in zip(corpus["doc_id"].to_pylist(),
                             corpus["spans"].to_pylist()):
        ex = ref_build_example(spans)
        if ex is None:
            continue
        n = len(ex["words"])
        X = np.zeros((n, d), np.float64)
        X[:, 0] = 1.0
        if n:
            bb = np.asarray(ex["bboxes"], np.float64).reshape(n, 4) / 1000.0
            X[:, 1:5] = bb
            X[:, 5] = bb[:, 2] - bb[:, 0]
            X[:, 6] = bb[:, 3] - bb[:, 1]
            for i, w in enumerate(ex["words"]):
                h = int.from_bytes(hashlib.blake2b(
                    (w or "").lower().encode("utf-8"),
                    digest_size=8).digest(), "little")
                X[i, n_geom + h % n_buckets] = 1.0
        y = np.array([label2id.get(l, 0) for l in ex["labels"]], np.int64)
        docs.append((str(doc_id), X, y))
    docs.sort(key=lambda t: t[0])           # the engine's sort("doc_id")

    def softmax(z):
        z = z - z.max(axis=1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(axis=1, keepdims=True)

    def adamw(Wf, m, v, g, t):
        b1, b2, eps = 0.9, 0.999, 1e-8
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * g * g
        mhat = m / (1.0 - b1 ** t)
        vhat = v / (1.0 - b2 ** t)
        Wf = Wf * (1.0 - lr * weight_decay) - lr * mhat / (np.sqrt(vhat) + eps)
        return Wf, m, v

    W = np.zeros((C, d), np.float64)
    m = np.zeros(W.size)
    v = np.zeros(W.size)
    B = max(1, int(global_batch_size))
    n_steps = (len(docs) + B - 1) // B
    t = 0
    initial_loss = None
    for _ in range(max(1, int(n_epochs))):
        for s in range(n_steps):
            gsum = np.zeros(W.size, np.int64)
            loss_q = 0
            n_tok = 0
            for _id, X, y in docs[s * B:(s + 1) * B]:
                if not len(y):
                    continue
                P = softmax(X @ W.T)
                loss = -np.log(np.maximum(
                    P[np.arange(len(y)), y], 1e-300)).sum()
                P[np.arange(len(y)), y] -= 1.0
                gsum += np.round((P.T @ X).reshape(-1) * scale).astype(np.int64)
                loss_q += int(round(loss * scale))
                n_tok += len(y)
            if n_tok == 0:
                continue
            if initial_loss is None:
                initial_loss = loss_q / scale / n_tok
            t += 1
            g = gsum.astype(np.float64) / scale / n_tok
            Wf, m, v = adamw(W.reshape(-1), m, v, g, t)
            W = Wf.reshape(W.shape)

    correct = 0
    loss_q = 0
    n_tok_total = 0
    for _id, X, y in docs:
        if not len(y):
            continue
        P = softmax(X @ W.T)
        loss_q += int(round(
            -np.log(np.maximum(P[np.arange(len(y)), y], 1e-300)).sum() * scale))
        correct += int((P.argmax(axis=1) == y).sum())
        n_tok_total += len(y)
    return pd.DataFrame({
        "n_examples": pd.array([len(docs)], dtype="int64"),
        "n_tokens": pd.array([n_tok_total], dtype="int64"),
        "initial_loss": pd.array([initial_loss if initial_loss is not None
                                  else 0.0], dtype="float64"),
        "final_loss": pd.array(
            [loss_q / scale / n_tok_total if n_tok_total else 0.0],
            dtype="float64"),
        "token_accuracy": pd.array(
            [correct / n_tok_total if n_tok_total else 0.0], dtype="float64"),
    })


def expected_resumable(corpus) -> pd.DataFrame:
    """extract_resumable totals: doc_count = corpus size; row_count =
    Σ output spans per doc under the dynamic layout, where a grid
    serializes as header cells + row_end, then per body row cells +
    row_end (core/spans.py::grid_to_spans contract, reference
    ``exporters.py:7-12`` reading order)."""
    row_count = 0
    for spans in corpus["spans"].to_pylist():
        h, rows, _ = ref_extract(spans, "dynamic")
        row_count += (len(h) + 1 if h else 0) + sum(len(r) + 1 for r in rows)
    return pd.DataFrame({
        "doc_count": pd.array([corpus.num_rows], dtype="int64"),
        "row_count": pd.array([row_count], dtype="int64"),
    })


def expected_eval_generic_vs_dynamic(corpus) -> pd.DataFrame:
    """AG6 corpus metric over the reference's executed extractions:
    generic vs dynamic grids, body-only (header row dropped), padded to
    a common shape with '', cells stripped and exact-compared
    (evaluation.py:86-100 semantics)."""
    matched = total = 0
    for spans in corpus["spans"].to_pylist():
        def body(layout):
            h, rows, _ = ref_extract(spans, layout)
            g = ([list(h)] if h else []) + [list(r) for r in rows]
            return g[1:] if g else g
        A, B = body("generic"), body("dynamic")
        n_rows = max(len(A), len(B))
        n_cols = max((max((len(r) for r in g), default=0)
                      for g in (A, B)), default=0)
        def mat(g):
            out = np.full((n_rows, n_cols), "", dtype=object)
            for i, r in enumerate(g):
                for j, c in enumerate(r):
                    out[i, j] = (c or "").strip()
            return out
        Am, Bm = mat(A), mat(B)
        total += int(Am.size)
        matched += int((Am == Bm).sum())
    return pd.DataFrame({
        "text_accuracy": pd.array([matched / total if total else 0.0],
                                  dtype="float64"),
        "matched_cells": pd.array([matched], dtype="int64"),
        "total_cells": pd.array([total], dtype="int64"),
    })


# ---------------------------------------------------------------------------
# dataset builder / transformers chain (reference-executed)

def expected_dataset_builder(corpus) -> pd.DataFrame:
    """Replays dataset_builder.py:167-265 with the reference's executed
    internals (same steps as tests/refimpl.ref_build_example, plus the
    col_count the query reports)."""
    from tests.refimpl import load_ref, spans_to_ref_tokens
    load_ref()
    from hocr_table_extractor import (columns, dataset_builder as db,
                                      lines as ref_lines)
    out = []
    for doc_id, spans in zip(corpus["doc_id"].to_pylist(),
                             corpus["spans"].to_pylist()):
        row = {"doc_id": str(doc_id), "n_rows": 0, "n_cols": 0,
               "error": "no_tokens_or_columns"}
        tokens = spans_to_ref_tokens(spans)
        if tokens:
            lns = ref_lines.build_lines(tokens)
            if lns:
                ci = columns.estimate_columns(lns)
                if ci:
                    ri = db._compute_row_intervals(lns)
                    l2r = db._assign_lines_to_rows(lns, ri)
                    grid_rows, _rt, _tr = db._aggregate_rows(lns, l2r, ci)
                    _hi, _hr, body = db._detect_header_index(grid_rows, None)
                    row = {"doc_id": str(doc_id), "n_rows": len(body),
                           "n_cols": len(ci), "error": ""}
        out.append(row)
    df = pd.DataFrame(out)
    df["n_rows"] = df["n_rows"].astype("int64")
    df["n_cols"] = df["n_cols"].astype("int64")
    return df


def expected_token_accuracy(corpus) -> pd.DataFrame:
    """AG7 spec over the reference's executed teacher labels
    (ref_build_example): col_id −1 → gold −100; predictions = gold with
    every 7th unmasked token flipped to OTHER(0); accuracy =
    correct/total (train_layoutlm.py:167-183)."""
    from tests.refimpl import ref_build_example
    label2id = {"OTHER": 0}
    for p in ("HEADER", "BODY"):
        for i in range(6):
            label2id[f"{p}_COL_{i}"] = len(label2id)
    correct = total = 0
    for spans in corpus["spans"].to_pylist():
        ex = ref_build_example(spans)
        if ex is None:
            continue
        kept = 0
        for lab, col in zip(ex["labels"], ex["col_ids"]):
            if col == -1:
                continue
            gid = label2id.get(lab, 0)
            pred = 0 if kept % 7 == 0 else gid
            kept += 1
            total += 1
            correct += (pred == gid)
    return pd.DataFrame({
        "token_accuracy": pd.array([correct / total if total else 0.0],
                                   dtype="float64"),
        "n_tokens": pd.array([total], dtype="int64"),
    })


def expected_transformers(corpus) -> pd.DataFrame:
    """extract_transformers chain: media spans through the engine's
    deterministic OCR fake (that part is self-derived — no real OCR in
    this sandbox), then teacher labels + the reference's executed
    3-level fallback compose (ref_transformers_extract)."""
    import pyarrow as _pa
    from tests.refimpl import ref_transformers_extract
    from ocr_table_extractor_to_csv_ray.core.databuild import build_example
    from ocr_table_extractor_to_csv_ray.sources.synthetic import SPAN_TYPE
    from ocr_table_extractor_to_csv_ray.stages.extract import decode_token_batch
    from ocr_table_extractor_to_csv_ray.stages.ocr import OcrStage
    from ocr_table_extractor_to_csv_ray.core.doc import TokenSOA

    ocr = OcrStage()
    out = []
    ids = corpus["doc_id"].to_pylist()
    for i, doc_id in enumerate(ids):
        one = ocr(corpus.slice(i, 1))
        spans = one["spans"].to_pylist()[0]
        word_offsets, toks, has_lid = decode_token_batch(one["spans"])
        sl = slice(word_offsets[0], word_offsets[1])
        doc = TokenSOA(text=toks.text[sl], page=toks.page[sl],
                       x1=toks.x1[sl], y1=toks.y1[sl],
                       x2=toks.x2[sl], y2=toks.y2[sl],
                       line_id=toks.line_id[sl] if has_lid[sl].any() else None)
        ex = build_example(str(doc_id), doc, max_columns=6, compute_boxes=False)
        labels = ["OTHER"] * len(doc)
        if ex is not None:
            for ti, lab in zip(ex.token_order, ex.labels):
                labels[ti] = lab
        header, rows = ref_transformers_extract(spans, labels)
        n_rows, n_cols = grid_shape(header, rows)
        out.append({"doc_id": str(doc_id), "n_rows": n_rows, "n_cols": n_cols})
    df = pd.DataFrame(out)
    df["n_rows"] = df["n_rows"].astype("int32")
    df["n_cols"] = df["n_cols"].astype("int32")
    return df


def expected_ocr_expand(corpus) -> pd.DataFrame:
    """SERIAL run of the OCR span expansion (deterministic fake engine)
    — a distributed-vs-serial plumbing oracle, self-derived by design."""
    from ocr_table_extractor_to_csv_ray.stages.ocr import OcrStage
    ocr = OcrStage()
    t = ocr(corpus)
    import pyarrow.compute as pc
    return pd.DataFrame({
        "doc_id": [str(d) for d in t["doc_id"].to_pylist()],
        "n_spans": pd.array(pc.list_value_length(t["spans"]).to_pylist(),
                            dtype="int64"),
    })


def expected_multimodal(corpus) -> pd.DataFrame:
    """multimodal_features reports (media_id, h, w, c): the id set is
    just the corpus' media refs (independent of the decode stage); the
    dims are the stage's fixed output contract."""
    refs = []
    for spans in corpus["spans"].to_pylist():
        for s in spans or []:
            if s["kind"] == "media":
                refs.append(s["media_ref"])
    return pd.DataFrame({
        "media_id": refs,
        "height": pd.array([32] * len(refs), dtype="int32"),
        "width": pd.array([32] * len(refs), dtype="int32"),
        "channels": pd.array([3] * len(refs), dtype="int32"),
    })


def expected_knn_ivf(sf_dir: str, k: int = 10, n_clusters: int = 16,
                     n_probe: int = 4, sample_size: int = 2000,
                     seed: int = 3) -> pd.DataFrame:
    """Serial numpy replication of functions/similarity.knn_ivf (the
    content-hash centroid sample makes it block-layout-independent)."""
    from ocr_table_extractor_to_csv_ray.functions.similarity import (
        _unit, kmeans_fit)
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_numpy())
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t["embedding"].to_pylist()])
    order = np.argsort(ids)[:3]
    qm = _unit(vecs[order])

    n_total = len(ids)
    frac = min(1.0, 1.25 * sample_size / max(n_total, 1))
    if frac < 1.0:
        thr = np.uint64(int(frac * 2**64))
        h = pd.util.hash_pandas_object(pd.Series(ids), index=False).to_numpy()
        keep = h <= thr
    else:
        keep = np.ones(n_total, bool)
    samp = pd.DataFrame({"vec_id": ids[keep]})
    samp["i"] = np.flatnonzero(keep)
    samp = samp.sort_values("vec_id").head(sample_size)
    cent = kmeans_fit(vecs[samp["i"].to_numpy()], n_clusters, seed=seed)

    probed = np.unique(np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe])
    unit = _unit(vecs)
    cell = np.argmax(unit @ cent.T, axis=1)
    mask = np.isin(cell, probed)
    cand_ids, cand = ids[mask], unit[mask]
    sims = cand @ qm.T
    rows = []
    for qi in range(qm.shape[0]):
        df = pd.DataFrame({"vec_id": cand_ids, "score": sims[:, qi]})
        df = df.sort_values(["score", "vec_id"], ascending=[False, True],
                            kind="mergesort").head(k)
        for r, vid in enumerate(df["vec_id"], start=1):
            rows.append({"query_id": qi, "vec_id": vid, "rank": r})
    df = pd.DataFrame(rows)
    df["query_id"] = df["query_id"].astype("int64")
    df["rank"] = df["rank"].astype("int64")
    return df


def main() -> None:
    # optional positional args restrict regeneration to the named
    # queries (other expected parquets on disk are left untouched)
    only = {a for a in sys.argv[1:] if not a.startswith("-")}
    want = lambda name: not only or name in only
    os.makedirs(OUT_DIR, exist_ok=True)
    per_query: dict = {}

    corpus_based = ({f"extract_{l}" for l in LAYOUTS}
                    | {"extract_knobs", "hocr_parse_extract",
                       "dataset_builder", "token_accuracy",
                       "eval_generic_vs_dynamic", "extract_resumable",
                       "train_classifier", "finetune_stepsync",
                       "extract_transformers",
                       "ocr_expand", "multimodal_features"})

    for sf_dir, sf in SF_DIRS.items():
        sig = doc_sig(sf_dir)
        n = corpus_n(sf)
        print(f"{sf_dir}: sig={sig} corpus_n={n}", flush=True)
        corpus = build_corpus(n) if (not only or only & corpus_based) else None

        for layout in LAYOUTS:
            if not want(f"extract_{layout}"):
                continue
            df = expected_extract(corpus, layout)
            df.insert(0, "sig", sig)
            df.insert(1, "layout", layout)
            per_query.setdefault(f"extract_{layout}", []).append(df)
            print(f"  extract_{layout}: {len(df)} rows", flush=True)
        if want("extract_knobs"):
            df = expected_extract(corpus, "generic", **KNOBS)
            df.insert(0, "sig", sig)
            per_query.setdefault("extract_knobs", []).append(df)
        if want("hocr_parse_extract"):
            df = expected_hocr_roundtrip(corpus)
            df.insert(0, "sig", sig)
            per_query.setdefault("hocr_parse_extract", []).append(df)

        for name, fn in (("dataset_builder", expected_dataset_builder),
                         ("token_accuracy", expected_token_accuracy),
                         ("eval_generic_vs_dynamic", expected_eval_generic_vs_dynamic),
                         ("extract_resumable", expected_resumable),
                         ("train_classifier", expected_train),
                         ("finetune_stepsync", expected_train_stepsync),
                         ("extract_transformers", expected_transformers),
                         ("ocr_expand", expected_ocr_expand),
                         ("multimodal_features", expected_multimodal)):
            if not want(name):
                continue
            df = fn(corpus)
            df.insert(0, "sig", sig)
            per_query.setdefault(name, []).append(df)
            print(f"  {name}: {len(df)} rows", flush=True)

        for name, fn in (("extract_text_render", expected_text_render),
                         ("split_hash", expected_split_hash),
                         ("bpe_learn", expected_bpe),
                         ("fingerprint_rolling", expected_rolling_fp),
                         ("knn_ivf", expected_knn_ivf),
                         ("dedup_embedding", expected_dedup_embedding),
                         ("kmeans_embeddings", expected_kmeans),
                         ("vocab_hll", expected_vocab_hll),
                         ("vocab_hll_by_lang", expected_vocab_hll_by_lang),
                         ("bloom_flag", expected_bloom_flag)):
            if not want(name):
                continue
            df = fn(sf_dir)
            df.insert(0, "sig", sig)
            per_query.setdefault(name, []).append(df)
            print(f"  {name}: {len(df)} rows", flush=True)

        dedup_names = {"dedup_minhash", "dedup_ngram", "dedup_simhash"}
        dedup = (expected_dedup_text(sf_dir)
                 if (not only or only & dedup_names) else {})
        for name, df in dedup.items():
            if not want(name):
                continue
            df.insert(0, "sig", sig)
            per_query.setdefault(name, []).append(df)
            print(f"  {name}: {len(df)} rows", flush=True)

    for name, dfs in per_query.items():
        path = os.path.join(OUT_DIR, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(pd.concat(dfs, ignore_index=True),
                                            preserve_index=False), path)
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
