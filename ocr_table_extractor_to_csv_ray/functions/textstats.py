"""Text analysis over a document corpus.

Operators: token counting (whitespace + BPE-ish regex), language ID
(stopword n-gram heuristic), quality scoring (length / punctuation /
stopword ratios), document fingerprinting (md5 + rolling-hash shingle
sketch).

Ray mapping: every operator is a stateless vectorized batch kernel or a
compiled-state actor class; none shuffles. Designed for the
``documents`` table ``(doc_id, text, lang, source, n_chars)``.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# token counting

# GPT2-ish pre-tokenizer without \p classes (stdlib re): contractions,
# letter runs, digit runs, other-symbol runs, trailing spaces.
BPE_ISH = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ɏ]+| ?\d+| ?[^\sA-Za-zÀ-ɏ\d]+|\s+(?!\S)|\s+")

WS = re.compile(r"\s+")


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """Add ``n_chars``/``n_tokens_ws``/``n_tokens_bpe`` columns.

    ``n_tokens_ws`` matches DuckDB
    ``array_length(regexp_split_to_array(trim(text), '\\s+'))`` exactly
    (empty string → 1, the single empty piece).
    """
    text = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    trimmed = pc.utf8_trim_whitespace(text)
    n_ws = pc.cast(pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")), pa.int64())
    py = trimmed.to_pylist()
    n_bpe = pa.array(
        [len(BPE_ISH.findall(t)) if t is not None else 0 for t in py], pa.int64()
    )
    out = batch
    for name, col in (("n_chars", n_chars), ("n_tokens_ws", n_ws), ("n_tokens_bpe", n_bpe)):
        if name in out.column_names:
            out = out.drop_columns([name])
        out = out.append_column(name, col)
    return out


# ---------------------------------------------------------------------------
# language ID — stopword-hit heuristic (public-knowledge approach: top
# function words per language; argmax of hit counts, ties broken by a
# fixed language priority order)

STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the of and to a in is it you that he was for on are as with his they at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if".split()),
    "es": frozenset("de la que el en y a los del se las por un para con no una su al lo como mas pero sus le ya o este si porque esta entre cuando muy sin sobre tambien me hasta hay donde quien desde todo nos".split()),
    "fr": frozenset("de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont la aux avec son une etre cette tout mais nous comme ou si leur bien elle y deux ses".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf fur ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem uber einen so".split()),
    "it": frozenset("di e il la che in a per un e sono della le con non si da come piu anche lo tutto ma ha su questo gli al dei nel una alla sua o se io mi ci molto".split()),
}
LANG_PRIORITY = ("en", "es", "fr", "de", "it")
WORD_RE = re.compile(r"[a-zA-ZÀ-ɏ']+")


class LangIdStage:
    """Actor-style callable: stopword tables built once per actor
    (``__init__``), vectorized-ish scoring per batch (``__call__``)."""

    def __init__(self) -> None:
        self.word_re = WORD_RE
        self.tables = [(lang, STOPWORDS[lang]) for lang in LANG_PRIORITY]

    def score(self, text: str) -> str:
        words = self.word_re.findall(text.lower())
        if not words:
            return "und"
        best_lang, best = "und", 0
        for lang, table in self.tables:
            hits = sum(1 for w in words if w in table)
            if hits > best:
                best, best_lang = hits, lang
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        pred = pa.array([self.score(t or "") for t in texts], pa.string())
        out = batch
        if "lang_pred" in out.column_names:
            out = out.drop_columns(["lang_pred"])
        return out.append_column("lang_pred", pred)


# ---------------------------------------------------------------------------
# quality scoring

PUNCT_RE = re.compile(r"[^\w\s]")


class QualityStage:
    """Heuristic quality features + composite score per document.

    Features (all deterministic): n_chars, n_tokens, mean token length,
    punctuation ratio, stopword ratio (en table), repetition ratio
    (1 - unique/total tokens). Score = product of soft gates in [0,1].
    """

    def __init__(self) -> None:
        self.word_re = WORD_RE
        self.punct_re = PUNCT_RE
        self.stop = STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        n_tokens = np.zeros(n, np.int64)
        mean_len = np.zeros(n, np.float64)
        punct_ratio = np.zeros(n, np.float64)
        stop_ratio = np.zeros(n, np.float64)
        rep_ratio = np.zeros(n, np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            toks = t.split()
            n_tokens[i] = len(toks)
            if toks:
                mean_len[i] = sum(len(w) for w in toks) / len(toks)
                low = [w.lower() for w in toks]
                stop_ratio[i] = sum(1 for w in low if w in self.stop) / len(toks)
                rep_ratio[i] = 1.0 - len(set(low)) / len(toks)
            if t:
                punct_ratio[i] = len(self.punct_re.findall(t)) / len(t)
        # soft gates: enough tokens, sane word length, not punctuation soup
        g_len = np.clip(n_tokens / 20.0, 0.0, 1.0)
        g_word = np.where((mean_len >= 2.0) & (mean_len <= 12.0), 1.0, 0.5)
        g_punct = np.where(punct_ratio <= 0.2, 1.0, 0.3)
        g_rep = 1.0 - 0.5 * rep_ratio
        score = g_len * g_word * g_punct * g_rep
        cols = {
            "n_tokens": n_tokens, "mean_token_len": mean_len,
            "punct_ratio": punct_ratio, "stopword_ratio": stop_ratio,
            "repetition_ratio": rep_ratio, "quality_score": score,
        }
        out = batch
        for name, arr in cols.items():
            if name in out.column_names:
                out = out.drop_columns([name])
            out = out.append_column(name, pa.array(arr))
        return out


# ---------------------------------------------------------------------------
# fingerprinting

def md5_fingerprint_batch(batch: pa.Table) -> pa.Table:
    """``fp = md5(lower(trim(text)))`` — matches DuckDB's
    ``md5(lower(trim(text)))`` for the SQL oracle."""
    texts = pc.utf8_lower(pc.utf8_trim_whitespace(batch["text"])).to_pylist()
    fp = pa.array(
        [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts],
        pa.string(),
    )
    out = batch
    if "fp" in out.column_names:
        out = out.drop_columns(["fp"])
    return out.append_column("fp", fp)


def token_hash64(tok: str) -> int:
    """Deterministic 64-bit token hash (blake2b; no PYTHONHASHSEED)."""
    return int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")


def _token_hashes(tokens: List[str], _cache: Dict[str, int] | None = None) -> np.ndarray:
    """64-bit hash per token; unique tokens hashed once via the cache."""
    cache = _cache if _cache is not None else {}
    out = np.empty(len(tokens), np.uint64)
    for i, tok in enumerate(tokens):
        h = cache.get(tok)
        if h is None:
            h = token_hash64(tok)
            cache[tok] = h
        out[i] = h
    return out


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes(text: str, k: int = 3, _cache: Dict[str, int] | None = None) -> np.ndarray:
    """Rolling 64-bit hashes of word ``k``-grams (unique, sorted).

    Token hashes are combined positionally (golden-ratio mix) so the
    shingle hash is order-sensitive, then deduped — the document's
    shingle *set*.
    """
    toks = (text or "").lower().split()
    th = _token_hashes(toks, _cache)
    if len(th) == 0:
        return np.empty(0, np.uint64)
    with np.errstate(over="ignore"):
        if len(th) < k:
            sh = np.zeros(1, np.uint64)
            for j in range(len(th)):
                sh = sh * _SHINGLE_MIX + th[j]
            return np.unique(sh)
        sh = np.zeros(len(th) - k + 1, np.uint64)
        for j in range(k):
            sh = sh * _SHINGLE_MIX + th[j : len(th) - k + 1 + j]
    return np.unique(sh)


def rolling_fingerprint_batch(batch: pa.Table, k: int = 3, sketch_size: int = 8) -> pa.Table:
    """Winnowing-style sketch: the ``sketch_size`` smallest k-gram
    rolling hashes per document (a compact near-dup fingerprint)."""
    texts = batch["text"].to_pylist()
    sketches = []
    for t in texts:
        sh = shingle_hashes(t, k)
        sk = np.sort(sh)[:sketch_size]
        sketches.append([int(x) for x in sk.astype(np.int64)])  # int64 view for Arrow
    out = batch
    if "fp_sketch" in out.column_names:
        out = out.drop_columns(["fp_sketch"])
    return out.append_column("fp_sketch", pa.array(sketches, pa.list_(pa.int64())))


def doc_freq(ds, column: str = "text", min_df: int = 1, terms=None):
    """Document frequency per whitespace token — the vocabulary-scale
    aggregate behind TF-IDF / BM25 / stopword mining.

    Local combine first: each batch emits one row per DISTINCT
    (token, doc) pair collapsed to per-batch ``(token, df_partial)``
    counts, so the vocabulary shuffle moves per-batch-unique tokens,
    never the token stream. One global ``groupby(token).sum`` finishes.
    Tokenization matches ``token_stats_batch`` (trim + ``\\s+`` split;
    empty doc contributes the single empty token), so the whole thing
    is mirrorable in ANSI SQL for the driver oracle.

    ``terms``: optional term whitelist — the flat token stream is
    filtered BEFORE the distinct/shuffle, so a few-term df lookup
    (BM25's idf) never shuffles the vocabulary.
    """
    from ray.data.aggregate import Sum

    term_arr = pa.array(list(terms)) if terms is not None else None

    def partial(t: pa.Table) -> pa.Table:
        text = t[column].combine_chunks() if isinstance(t[column], pa.ChunkedArray) else t[column]
        toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        n = len(toks)
        lens = pc.fill_null(toks.value_lengths(), 0).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = toks.flatten()
        if term_arr is not None:
            m = pc.is_in(flat, value_set=term_arr).to_numpy(zero_copy_only=False)
            flat = flat.filter(pa.array(m))
            doc_idx = doc_idx[m]
            if len(flat) == 0:
                return pa.table({"token": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64())})
        # distinct (doc, token): encode token to dictionary ints, then a
        # single np.unique over (doc_idx, code) pairs — vectorized
        enc = flat.dictionary_encode()
        vocab = np.int64(len(enc.dictionary))
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False), np.int64)
        pair = doc_idx * (vocab + 1) + codes
        uniq = np.unique(pair)
        u_codes = (uniq % (vocab + 1)).astype(np.int64)
        cnt = np.bincount(u_codes, minlength=int(vocab))
        keep = np.nonzero(cnt)[0]
        return pa.table({
            "token": enc.dictionary.take(pa.array(keep, pa.int64())),
            "df": pa.array(cnt[keep].astype(np.int64)),
        })

    from .agg import grouped_sum
    out = grouped_sum(ds.select_columns([column])
                      .map_batches(partial, batch_format="pyarrow"),
                      "token", ["df"], num_buckets=16)
    if min_df > 1:
        out = out.map_batches(
            lambda t: t.filter(pc.greater_equal(t["df"], pa.scalar(min_df))),
            batch_format="pyarrow")
    return out


def repetition_stats_batch(batch: pa.Table, column: str = "text",
                           id_column: str = "doc_id") -> pa.Table:
    """Gopher-style WITHIN-document repetition features (Rae et al.
    2021's repetition filters, the dup-line/word/bigram subset):

    - ``dup_line_char_frac`` — fraction of line characters belonging to
      a repeat of an earlier identical line in the same doc
    - ``top_word_frac`` — occurrences of the most frequent token / all
      tokens
    - ``top_bigram_frac`` — occurrences of the most frequent bigram /
      all bigrams

    Pure per-row features: a zero-shuffle streaming ``map_batches``
    stage (string-bound Python kernel, the QualityStage precedent).
    All three are float64 with SQL-mirrorable formulas — division
    orders match the DuckDB oracle exactly."""
    from collections import Counter

    texts = batch[column].to_pylist()
    n = len(texts)
    dup_line = np.zeros(n, np.float64)
    top_word = np.zeros(n, np.float64)
    top_bigram = np.zeros(n, np.float64)
    for i, t in enumerate(texts):
        t = t or ""
        lines = t.split("\n")
        seen: set = set()
        dupc = totc = 0
        for ln in lines:
            totc += len(ln)
            if ln in seen:
                dupc += len(ln)
            else:
                seen.add(ln)
        if totc:
            dup_line[i] = dupc * 1.0 / totc
        toks = t.split()
        if toks:
            top_word[i] = max(Counter(toks).values()) * 1.0 / len(toks)
        if len(toks) > 1:
            grams = Counter(zip(toks, toks[1:]))
            top_bigram[i] = max(grams.values()) * 1.0 / (len(toks) - 1)
    return pa.table({
        id_column: batch[id_column],
        "dup_line_char_frac": pa.array(dup_line),
        "top_word_frac": pa.array(top_word),
        "top_bigram_frac": pa.array(top_bigram),
    })
