"""Distributed BPE merge-table learning (tokenizer training).

The corpus never re-shuffles per round. Stage 1 shrinks the corpus to
its WORD-FREQUENCY table (per-batch ``value_counts`` partials → one
bucketed ``grouped_sum`` by word) and materializes that once — the
working set for every subsequent round is vocabulary-sized, not
corpus-sized, exactly like the word-dict driven BPE learners
(Sennrich et al. 2016). Each merge round then:

1. streams the word-freq table through ``map_batches``, applying the
   merges learned so far to each word and emitting frequency-weighted
   adjacent-pair partial counts (the per-word loop is over DISTINCT
   words — vocab-bounded by construction, not a corpus hot path);
2. one bucketed ``grouped_sum`` by (lhs, rhs);
3. a per-block local top-1, so the driver sees ≤ n_blocks candidate
   rows and picks the global argmax with the deterministic
   (count DESC, lhs ASC, rhs ASC) tie-break;
4. the winning pair joins the broadcast merge list for the next round.

R merges cost R vocab-table shuffles; the single corpus-scale shuffle
happens once in stage 1. Merge application is the classic in-order
left-to-right replacement, so any two runs (and the sequential oracle
in ``tools/gen_oracle_expected.py``) produce bit-identical tables.

No end-of-word marker is appended (the merge ranks are over plain
character sequences); downstream consumers that need '</w>' semantics
can add the marker in the stage-1 ``map_batches`` without touching the
round structure.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pandas as pd
import pyarrow as pa

from .agg import grouped_sum


def apply_merges(symbols: List[str],
                 merges: List[Tuple[str, str]]) -> List[str]:
    """Apply learned merges IN RANK ORDER, each left-to-right — the
    deterministic contract shared with the sequential oracle."""
    for a, b in merges:
        if len(symbols) < 2:
            break
        out: List[str] = []
        i = 0
        n = len(symbols)
        while i < n:
            if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def word_frequencies(ds, text_col: str = "text", num_buckets: int = 32):
    """Corpus → word-frequency Dataset (word, freq). The one
    corpus-scale pass: per-batch ``str.split`` + explode +
    ``value_counts`` shrinks each block to its distinct words before
    the single bucketed shuffle."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # dropna BEFORE astype(str): a null payload must contribute no
        # words, not the literal token 'nan'/'None' (explicit null
        # contract shared with the sequential oracle)
        words = b[text_col].dropna().astype(str).str.split().explode().dropna()
        vc = words.value_counts(sort=False)
        return pd.DataFrame({"word": vc.index.astype(str),
                             "freq": vc.to_numpy().astype("int64")})

    return grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                       "word", {"freq": "freq"}, num_buckets=num_buckets)


def _learn_from_word_freq(wf: Dict[str, int],
                          n_merges: int) -> pd.DataFrame:
    """In-process merge rounds over a collected word-frequency dict —
    the SAME update rule and tie-break as the distributed rounds
    (bit-equal by associativity of the pair sums)."""
    merges: List[Tuple[str, str]] = []
    rows: List[dict] = []
    for rank in range(n_merges):
        counts: Dict[Tuple[str, str], int] = {}
        for w, f in wf.items():
            syms = apply_merges(list(w), merges)
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (lhs, rhs), n = sorted(counts.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((lhs, rhs))
        rows.append({"merge_rank": rank, "lhs": lhs, "rhs": rhs,
                     "pair_count": n})
    return pd.DataFrame(rows, columns=["merge_rank", "lhs", "rhs",
                                       "pair_count"]).astype(
        {"merge_rank": "int64", "lhs": str, "rhs": str,
         "pair_count": "int64"})


def learn_bpe(ds, n_merges: int = 8, text_col: str = "text",
              num_buckets: int = 32,
              local_threshold: int = 500_000) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over ``ds[text_col]``.

    Returns a DataFrame (merge_rank int64, lhs str, rhs str,
    pair_count int64), one row per learned merge in rank order. Stops
    early if no adjacent pair remains.

    Size-adaptive rounds (graph.py precedent): the corpus-scale
    word-frequency shuffle always runs distributed, but each merge
    round costs a fixed task-scheduling floor regardless of data size
    — for a vocabulary under ``local_threshold`` distinct words the
    rounds run in-process over the collected (word, freq) dict
    instead, bit-equal by the associativity of the pair sums
    (tier-equivalence tested). The distributed rounds remain the path
    for vocabularies that don't fit one heap.
    """
    vocab = word_frequencies(ds, text_col, num_buckets).materialize()

    if vocab.count() <= local_threshold:
        pdf = vocab.to_pandas()
        wf = dict(zip(pdf["word"].astype(str),
                      pdf["freq"].astype("int64").map(int)))
        return _learn_from_word_freq(wf, n_merges)

    merges: List[Tuple[str, str]] = []
    ranks: List[dict] = []
    for rank in range(n_merges):
        cur = list(merges)  # snapshot: closures must not alias the growing list

        def pair_partial(b: pd.DataFrame, cur=cur) -> pd.DataFrame:
            counts: Dict[Tuple[str, str], int] = {}
            for word, freq in zip(b["word"].astype(str),
                                  b["freq"].astype("int64")):
                syms = apply_merges(list(word), cur)
                f = int(freq)
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    counts[k] = counts.get(k, 0) + f
            if not counts:
                # explicit string dtype: an object-dtype empty frame
                # converts to Arrow type `null` and breaks schema
                # unification with non-empty sibling blocks
                return pd.DataFrame({"lhs": pd.Series([], dtype="string"),
                                     "rhs": pd.Series([], dtype="string"),
                                     "n": pd.Series([], dtype="int64")})
            items = list(counts.items())
            return pd.DataFrame({
                "lhs": [k[0] for k, _ in items],
                "rhs": [k[1] for k, _ in items],
                "n": pd.array([v for _, v in items], dtype="int64"),
            })

        pairs = grouped_sum(vocab.map_batches(pair_partial,
                                              batch_format="pandas"),
                            ["lhs", "rhs"], {"n": "n"},
                            num_buckets=min(num_buckets, 16))

        def local_top1(b: pd.DataFrame) -> pd.DataFrame:
            if not len(b):
                return b
            return (b.sort_values(["n", "lhs", "rhs"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(1))

        cand = pairs.map_batches(local_top1, batch_format="pandas").to_pandas()
        if not len(cand):
            break
        best = (cand.sort_values(["n", "lhs", "rhs"],
                                 ascending=[False, True, True],
                                 kind="mergesort").iloc[0])
        merges.append((str(best["lhs"]), str(best["rhs"])))
        ranks.append({"merge_rank": rank, "lhs": str(best["lhs"]),
                      "rhs": str(best["rhs"]),
                      "pair_count": int(best["n"])})

    return pd.DataFrame(ranks, columns=["merge_rank", "lhs", "rhs",
                                        "pair_count"]).astype(
        {"merge_rank": "int64", "lhs": str, "rhs": str,
         "pair_count": "int64"})
