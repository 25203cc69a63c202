"""Distributed BPE merge learning vs an inline sequential oracle."""
from collections import Counter

import pandas as pd
import pytest

import ray.data as rd

from ocr_table_extractor_to_csv_ray.functions.bpe import (apply_merges,
                                                          learn_bpe)


def _seq_bpe(texts, n_merges):
    wf = Counter(w for t in texts for w in t.split())
    merges, rows = [], []
    for rank in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            syms = apply_merges(list(w), merges)
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (lhs, rhs), n = sorted(pc.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((lhs, rhs))
        rows.append((rank, lhs, rhs, n))
    return rows


def test_learn_bpe_matches_sequential(ray_session):
    texts = ["low lower lowest newest", "wide wider new newer",
             "lowest of the low", "ab ab ab ra abra abracadabra"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    out = learn_bpe(ds, n_merges=8)
    got = list(out.itertuples(index=False, name=None))
    assert got == _seq_bpe(texts, 8)


def test_learn_bpe_early_stop_single_chars(ray_session):
    # every word is one character: no adjacent pair ever exists
    ds = rd.from_pandas(pd.DataFrame({"text": ["a b c", "d e", ""]}))
    out = learn_bpe(ds, n_merges=5)
    assert len(out) == 0
    assert list(out.columns) == ["merge_rank", "lhs", "rhs", "pair_count"]


def test_apply_merges_left_to_right_overlap():
    # "aaaa" with merge (a,a): left-to-right pairing gives (aa)(aa),
    # never the overlapping a(aa)a — and the follow-up (aa,aa) fuses them
    assert apply_merges(list("aaaa"), [("a", "a")]) == ["aa", "aa"]
    assert apply_merges(list("aaaaa"), [("a", "a")]) == ["aa", "aa", "a"]
    assert apply_merges(list("aaaa"), [("a", "a"), ("aa", "aa")]) == ["aaaa"]


def test_learn_bpe_tier_equivalence(ray_session):
    # the driver-local rounds (small vocab) and the distributed rounds
    # must be bit-identical on the same input
    texts = ["low lower lowest newest", "wide wider new newer",
             "banana bandana ban and band", "abra abracadabra cad"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    local = learn_bpe(ds, n_merges=7)                      # local tier
    dist = learn_bpe(ds, n_merges=7, local_threshold=0)    # forced distributed
    pd.testing.assert_frame_equal(local, dist)


def test_learn_bpe_block_layout_invariant(ray_session):
    texts = [f"token{i % 7} shared shard word{i % 3}" for i in range(40)]
    df = pd.DataFrame({"text": texts})
    a = learn_bpe(rd.from_pandas(df).repartition(1), n_merges=6)
    b = learn_bpe(rd.from_pandas(df).repartition(8), n_merges=6)
    pd.testing.assert_frame_equal(a, b)
