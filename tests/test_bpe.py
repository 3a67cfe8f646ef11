"""Distributed BPE merge learning (stages/bpe.py): kernel semantics,
distributed-vs-reference parity, partitioning invariance."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from libfilter_ray.stages.bpe import (
    _apply_merge_flat, _greedy_take, bpe_reference, learn_bpe_merges,
)


def test_greedy_take_run_parity():
    # isolated matches all taken
    assert _greedy_take(np.array([2, 5, 9])).tolist() == [2, 5, 9]
    # runs keep even offsets (greedy left-to-right)
    assert _greedy_take(np.array([3, 4, 5, 6])).tolist() == [3, 5]
    assert _greedy_take(np.array([0, 1, 2, 7, 8, 11])).tolist() \
        == [0, 2, 7, 11]
    assert _greedy_take(np.array([], dtype=np.int64)).tolist() == []


@pytest.mark.parametrize("word,pair,expect", [
    ("aaaa", ("a", "a"), ["aa", "aa"]),
    ("aaaaa", ("a", "a"), ["aa", "aa", "a"]),
    ("abab", ("a", "b"), ["ab", "ab"]),
    ("xaab", ("a", "b"), ["x", "a", "ab"]),
    ("xy", ("a", "b"), ["x", "y"]),
])
def test_apply_merge_single_word(word, pair, expect):
    syms = np.array(list(word), dtype=object)
    word_of = np.zeros(len(syms), dtype=np.int64)
    out, _ = _apply_merge_flat(syms, word_of, *pair)
    assert out.tolist() == expect


def test_apply_merge_never_crosses_words():
    # ...a][b... at a word boundary must NOT merge
    syms = np.array(["x", "a", "b", "y"], dtype=object)
    word_of = np.array([0, 0, 1, 1], dtype=np.int64)
    out, wo = _apply_merge_flat(syms, word_of, "a", "b")
    assert out.tolist() == ["x", "a", "b", "y"]


CORPUS = ["the cat sat on the mat", "the dog and the cat",
          "aaaa aa baab aaa", "la lala lalala", "中文 中文字 字字字",
          "x  y", "", "ababab abc", "zzzz zz z"]


def test_artifact_save_load_roundtrip(tmp_path):
    """merges.txt + vocab.json round-trip: loaded merges segment
    identically, the vocab covers every emitted token with contiguous
    ids (alphabet-first, then merge order)."""
    from libfilter_ray.stages.bpe import (
        BPE_MERGES_HEADER, bpe_reference, load_bpe_artifacts,
        save_bpe_artifacts, segment_words)

    ref = bpe_reference(CORPUS, k=6)
    merges = [(m["left"], m["right"]) for m in ref]
    alpha = sorted({c for t in CORPUS for w in t.split(" ") for c in w})
    mpath, vpath = save_bpe_artifacts(str(tmp_path), merges, alpha)
    assert open(mpath, encoding="utf-8").readline().rstrip("\n") \
        == BPE_MERGES_HEADER
    loaded, vocab = load_bpe_artifacts(str(tmp_path))
    assert loaded == merges
    words = sorted({w for t in CORPUS for w in t.split(" ") if w})
    a = segment_words(words, merges)
    b = segment_words(words, loaded)
    assert a == b
    toks = {s for segs in a for s in segs}
    assert toks <= set(vocab)  # every emitted token is addressable
    assert sorted(vocab.values()) == list(range(len(vocab)))
    assert all(vocab[x] < vocab[m["left"] + m["right"]]
               for x in alpha for m in ref)


def test_artifact_rejects_whitespace_symbols(tmp_path):
    from libfilter_ray.stages.bpe import save_bpe_artifacts

    with pytest.raises(ValueError, match="whitespace"):
        save_bpe_artifacts(str(tmp_path), [("a b", "c")], ["a"])


def test_segment_words_matches_reference_segmentation():
    """segment_words (the flat vectorized apply) == the pure-Python
    greedy reference applied word by word."""
    from libfilter_ray.stages.bpe import bpe_reference, segment_words

    ref = bpe_reference(CORPUS, k=6)
    merges = [(m["left"], m["right"]) for m in ref]
    words = sorted({w for t in CORPUS for w in t.split(" ") if w})

    def ref_segment(w):
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    assert segment_words(words, merges) == [ref_segment(w)
                                            for w in words]


def test_distributed_matches_reference(ray_session):
    import ray.data

    docs = ray.data.from_arrow(pa.table(
        {"text": pa.array(CORPUS)})).repartition(4)
    got = learn_bpe_merges(docs, k=6, num_shards=4)
    ref = bpe_reference(CORPUS, k=6)
    assert got.to_dict("records") == ref


def test_partitioning_invariance(ray_session):
    import ray.data

    docs1 = ray.data.from_arrow(pa.table({"text": pa.array(CORPUS)}))
    docs7 = docs1.repartition(7)
    a = learn_bpe_merges(docs1, k=3, num_shards=2)
    b = learn_bpe_merges(docs7, k=3, num_shards=5)
    assert a.to_dict("records") == b.to_dict("records")


def test_min_count_prunes_tail(ray_session):
    import ray.data

    texts = ["rare", "common common common common"]
    docs = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = learn_bpe_merges(docs, k=1, min_count=2, num_shards=2)
    # with 'rare' pruned, the winning pair comes from 'common' alone
    ref = bpe_reference(["common common common common"], k=1)
    assert got.to_dict("records") == ref


def test_token_stats_matches_reference(ray_session):
    """Apply-path parity: per-group token counts after K merges match a
    word-by-word local segmentation."""
    import ray.data

    from libfilter_ray.stages.bpe import token_stats_after_merges

    texts = CORPUS
    langs = ["en", "en", "aa", "la", "zh", "xy", "xy", "ab", "zz"]
    docs = ray.data.from_arrow(pa.table(
        {"lang": pa.array(langs), "text": pa.array(texts)})).repartition(3)
    merges = [(m["left"], m["right"]) for m in bpe_reference(texts, k=4)]
    got = token_stats_after_merges(docs, merges)

    def seg_len(word):
        syms = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i+1] == b:
                    out.append(a + b); i += 2
                else:
                    out.append(syms[i]); i += 1
            syms = out
        return len(syms)

    import collections
    ref = collections.defaultdict(lambda: [0, 0])
    for lang, text in zip(langs, texts):
        for w in text.split(" "):
            if w:
                ref[lang][0] += 1
                ref[lang][1] += seg_len(w)
    for _, row in got.iterrows():
        assert [row["n_words"], row["n_tokens"]] == ref[row["lang"]], row
    assert set(got["lang"]) == {k for k, v in ref.items() if v[0]} | \
        {l for l, t in zip(langs, texts)}  # empty-text docs still group


def test_learn_never_collects_word_or_pair_tables(ray_session,
                                                  monkeypatch):
    """Scale guard (the house to_pandas spy): per round the trainer may
    collect only the per-block top-1 candidates (≤ blocks rows) — never
    the word table or the pair table."""
    import ray.data

    # corpus with a deliberately wide vocabulary
    texts = [" ".join(f"w{i}x{j}" for j in range(40))
             for i in range(50)]
    docs = ray.data.from_arrow(pa.table(
        {"text": pa.array(texts)})).repartition(4)

    collected = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    got = learn_bpe_merges(docs, k=2, num_shards=4)
    assert len(got) == 2
    assert collected, "spy never fired"
    # vocabulary is 2000 words / >5000 distinct pairs; each collect must
    # stay at per-block-top-1 scale
    assert max(collected) <= 64, collected


def test_apply_merge_hypothesis_parity():
    """Property: the vectorized run-parity merge equals the per-word
    greedy left-to-right reference for random words over a tiny
    alphabet (maximizes overlapping-run cases)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def ref_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    alphabet = st.sampled_from(["a", "b", "ab", "aa"])
    words = st.lists(st.lists(alphabet, min_size=1, max_size=12),
                     min_size=1, max_size=8)

    @settings(max_examples=300, deadline=None)
    @given(words=words, a=alphabet, b=alphabet)
    def check(words, a, b):
        flat = np.array([s for w in words for s in w], dtype=object)
        word_of = np.repeat(np.arange(len(words), dtype=np.int64),
                            [len(w) for w in words])
        got_syms, got_wo = _apply_merge_flat(flat, word_of, a, b)
        exp = [ref_merge(w, a, b) for w in words]
        exp_flat = [s for w in exp for s in w]
        exp_wo = [i for i, w in enumerate(exp) for _ in w]
        assert got_syms.tolist() == exp_flat
        assert got_wo.tolist() == exp_wo

    check()
