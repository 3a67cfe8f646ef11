"""Exact duplicate-passage removal (stages/passages.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_common_spans(texts: dict[int, str], min_len: int):
    """Reference: for every doc, the union of byte spans that also occur
    in an earlier (doc, pos) — O(n^2 * len) substring scan, small inputs
    only. Mirrors the engine's keep rule: smallest (doc, pos) occurrence
    of a maximal duplicated substring keeps; every later copy's span is
    removed."""
    ids = sorted(texts)
    spans = {i: [] for i in ids}
    for bi in ids:
        b = texts[bi].encode()
        covered = np.zeros(len(b), dtype=bool)
        for ai in ids:
            if ai >= bi:
                continue
            a = texts[ai].encode()
            # all maximal common substrings >= min_len: scan all diagonals
            for delta in range(-len(b) + 1, len(a)):
                i0, j0 = max(delta, 0), max(-delta, 0)
                run = 0
                for t in range(min(len(a) - i0, len(b) - j0) + 1):
                    ai_, bj = i0 + t, j0 + t
                    if t < min(len(a) - i0, len(b) - j0) \
                            and a[ai_] == b[bj]:
                        run += 1
                    else:
                        if run >= min_len:
                            covered[bj - run:bj] = True
                        run = 0
        # merge covered mask to spans
        on = np.flatnonzero(np.diff(np.r_[0, covered.view(np.int8), 0]))
        for s, e in zip(on[::2], on[1::2]):
            spans[bi].append((int(s), int(e)))
    return spans


def test_winnow_anchors_content_aligned():
    """Identical substrings must produce anchors at aligned content
    offsets in both copies — the detection guarantee."""
    from libfilter_ray.stages.passages import winnow_anchor_positions

    rng = np.random.default_rng(3)
    passage = "".join(rng.choice(list("abcdefgh"), size=200))
    t1 = "PREFIX-ONE " + passage + " SUFFIX-A"
    t2 = "A MUCH LONGER AND DIFFERENT PREFIX " + passage + " TAIL-B"
    col = pa.array([t1, t2])
    h, row, pos = winnow_anchor_positions(col, k=16, w=16)
    off1, off2 = t1.index(passage), t2.index(passage)
    in1 = {(int(hh), int(p) - off1) for hh, r, p in zip(h, row, pos)
           if r == 0 and off1 + 31 <= p < off1 + len(passage) - 31}
    in2 = {(int(hh), int(p) - off2) for hh, r, p in zip(h, row, pos)
           if r == 1 and off2 + 31 <= p < off2 + len(passage) - 31}
    assert in1 and in1 == in2  # interior anchors align exactly


def test_passage_spans_match_bruteforce(ray_session):
    import ray.data

    from libfilter_ray.stages.passages import duplicate_passage_spans

    rng = np.random.default_rng(11)

    def rnd(n):
        return "".join(rng.choice(list("abcdefghij kl"), size=n))

    shared1 = rnd(120)
    shared2 = rnd(90)
    texts = {
        0: rnd(60) + shared1 + rnd(40),
        1: rnd(30) + shared1 + rnd(80),           # copy of shared1
        2: rnd(200),                               # clean
        3: shared2 + rnd(50) + shared1,            # both passages
        4: rnd(20) + shared2 + rnd(20),            # copy of shared2
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = ray.data.from_pandas(df).repartition(3)
    got = duplicate_passage_spans(ds, "text", "doc_id", min_len=64,
                                  k=16, w=16).to_pandas()
    want = _brute_common_spans(texts, 64)
    got_by_doc = {int(d): sorted(
        (int(s), int(e)) for _, (s, e) in
        got.loc[got["doc"] == d, ["start", "end"]].iterrows())
        for d in got["doc"].unique()}
    for d, spans in want.items():
        assert got_by_doc.get(d, []) == spans, (d, got_by_doc.get(d), spans)
    assert 0 not in got_by_doc or not got_by_doc[0]  # first copies keep
    assert 2 not in got_by_doc


def test_remove_duplicate_passages_end_to_end(ray_session):
    import ray.data

    from libfilter_ray.stages.passages import remove_duplicate_passages

    rng = np.random.default_rng(7)
    passage = "".join(rng.choice(list("xyzw vu"), size=150))
    texts = ["keep me " + passage + " first",
             "second copy here " + passage + " trailing",
             "no duplication at all in this document whatsoever"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                       "text": texts})
    out = remove_duplicate_passages(
        ray.data.from_pandas(df).repartition(2), "text", "doc_id",
        min_len=64).to_pandas().sort_values("doc_id")
    assert out.iloc[0]["text"] == texts[0]          # first copy intact
    assert passage not in out.iloc[1]["text"]       # later copy cut
    # the cut is the MAXIMAL common substring — "e " + passage + " "
    # (boundary bytes shared with doc 0 go too), leaving the fused rest
    assert out.iloc[1]["text"] == "second copy her" + "trailing"
    assert out.iloc[2]["text"] == texts[2]          # clean doc untouched


def test_no_spans_below_min_len(ray_session):
    import ray.data

    from libfilter_ray.stages.passages import duplicate_passage_spans

    rng = np.random.default_rng(9)
    short = "".join(rng.choice(list("mnopqr"), size=50))  # < min_len
    texts = ["A" * 5 + short + "B" * 100, "C" * 90 + short + "D" * 10]
    df = pd.DataFrame({"doc_id": np.arange(2, dtype=np.int64),
                       "text": texts})
    got = duplicate_passage_spans(
        ray.data.from_pandas(df), "text", "doc_id",
        min_len=64).to_pandas()
    assert len(got) == 0 or "doc" not in got.columns or \
        not ((got["end"] - got["start"]) < 64).any()
    # the 50-byte shared chunk itself must NOT be removed
    if len(got) and "doc" in got.columns:
        for _, r in got.iterrows():
            assert not (r["end"] - r["start"] == 50)


def test_min_len_bound_enforced(ray_session):
    import ray.data

    from libfilter_ray.stages.passages import duplicate_passage_spans

    df = pd.DataFrame({"doc_id": [0], "text": ["x"]})
    with pytest.raises(ValueError):
        duplicate_passage_spans(ray.data.from_pandas(df), "text",
                                "doc_id", min_len=16, k=16, w=16)


def test_adjacent_pairing_covers_foreign_min(ray_session):
    """A small doc that shares an anchor k-gram (but not the passage)
    must not shadow the real copies: adjacent pairing still links the
    passage's copies to each other."""
    import ray.data

    from libfilter_ray.stages.passages import (duplicate_passage_spans,
                                               winnow_anchor_positions)

    rng = np.random.default_rng(13)
    passage = "".join(rng.choice(list("abcdefgh"), size=120))
    # doc 0: contains EVERY anchor k-gram of the passage as isolated
    # fragments (separated by junk), but not the passage itself
    h, row, pos = winnow_anchor_positions(pa.array([passage]), k=16, w=16)
    frags = " #JUNK# ".join(passage[int(p):int(p) + 16] for p in pos)
    texts = {0: frags,
             1: "first real copy: " + passage + " tail one",
             2: "second real copy ->" + passage + "<- tail two"}
    df = pd.DataFrame({"doc_id": list(texts),
                       "text": list(texts.values())})
    got = duplicate_passage_spans(
        ray.data.from_pandas(df), "text", "doc_id",
        min_len=64).to_pandas()
    docs = set(got["doc"].astype(int)) if len(got) and \
        "doc" in got.columns else set()
    assert 2 in docs        # the later real copy is still caught
    assert 1 not in docs    # the first real copy keeps
    assert 0 not in docs    # fragments are each < min_len


def test_span_store_path_matches_broadcast(ray_session, tmp_path):
    """Forcing the SpanStore carrier (broadcast_limit=0) must produce the
    byte-identical rebuilt corpus as the plasma-broadcast path."""
    import ray.data

    from libfilter_ray.stages.passages import remove_duplicate_passages

    rng = np.random.default_rng(17)
    passage = "".join(rng.choice(list("stuvwx yz"), size=140))
    texts = []
    for i in range(40):
        body = "".join(rng.choice(list("abcdef gh"), size=100))
        texts.append(body + (passage if i % 5 == 0 else ""))
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    via_bcast = remove_duplicate_passages(
        ds, "text", "doc_id", min_len=64).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    via_store = remove_duplicate_passages(
        ds, "text", "doc_id", min_len=64, broadcast_limit=0,
        store_dir=str(tmp_path / "spans")).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert via_bcast["text"].tolist() == via_store["text"].tolist()
    assert (via_store["text"] != df.sort_values("doc_id")["text"]
            .reset_index(drop=True)).any()  # something was actually cut


def test_join_path_carries_positions(ray_session):
    """The hash-join fallback of the pair-payload attach must carry
    pos_a/pos_b through both joins (the broadcast path keeps them for
    free; a dropped column here crashes the extend stage only at
    production scale)."""
    import ray.data

    from libfilter_ray.stages.dedup import _attach_pair_payloads

    pairs = ray.data.from_pandas(pd.DataFrame({
        "id_a": np.array([1, 1, 2], dtype=np.int64),
        "id_b": np.array([2, 3, 3], dtype=np.int64),
        "pos_a": np.array([10, 20, 30], dtype=np.int64),
        "pos_b": np.array([11, 21, 31], dtype=np.int64)})).materialize()
    cand = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "__txt": ["aaa", "bbb", "ccc"]})).materialize()
    joined = _attach_pair_payloads(
        pairs, cand, "doc_id", "__txt", 4,
        broadcast_limit=0, carry_cols=["pos_a", "pos_b"]).to_pandas()
    assert {"pos_a", "pos_b", "__txt_a", "__txt_b"} <= set(joined.columns)
    assert len(joined) == 3
    row = joined[(joined["id_a"] == 1) & (joined["id_b"] == 3)].iloc[0]
    assert (row["pos_a"], row["pos_b"]) == (20, 21)


def test_same_diagonal_distinct_passages_both_removed(ray_session):
    """Two distinct duplicated passages separated by equal-length junk
    land on ONE diagonal; both must still be detected (the old
    one-rep-per-diagonal dedupe dropped the second)."""
    import ray.data

    from libfilter_ray.stages.passages import duplicate_passage_spans

    rng = np.random.default_rng(23)
    X = "".join(rng.choice(list("abcdefgh"), size=100))
    Y = "".join(rng.choice(list("qrstuvwx"), size=100))
    docA = X + "1" * 50 + Y
    docB = X + "2" * 50 + Y
    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": [docA, docB]})
    got = duplicate_passage_spans(
        ray.data.from_pandas(df), "text", "doc_id",
        min_len=64).to_pandas()
    spans = sorted((int(s), int(e)) for _, (s, e) in
                   got.loc[got["doc"] == 1, ["start", "end"]].iterrows())
    assert spans == [(0, 100), (150, 250)], spans  # X and Y both cut


def test_utf8_boundary_snap(ray_session):
    """Byte extension stopping mid-multibyte-character must not produce
    undecodable output (spans snap inward to char boundaries)."""
    import ray.data

    from libfilter_ray.stages.passages import remove_duplicate_passages

    rng = np.random.default_rng(29)
    passage = "".join(rng.choice(list("abcdefgh"), size=100))
    # shared lead byte 0xC3: é = C3 A9, è = C3 A8 — extension runs into
    # the lead byte and stops between C3 and the continuation
    texts = [passage + "é after one", passage + "è after two"]
    df = pd.DataFrame({"doc_id": np.array([0, 1], dtype=np.int64),
                       "text": texts})
    out = remove_duplicate_passages(
        ray.data.from_pandas(df), "text", "doc_id",
        min_len=64).to_pandas().sort_values("doc_id")
    assert out.iloc[0]["text"] == texts[0]
    cleaned = out.iloc[1]["text"]          # decodes without error
    assert passage not in cleaned
    assert "è" in cleaned                  # the straddled char survives


def test_span_store_multi_file_straddle(ray_session, tmp_path):
    """A doc whose spans straddle several store parts must get ALL of
    them back (the first store lookup only probed one neighbor file)."""
    import ray.data

    from libfilter_ray.stages.passages import SpanStore

    spans = pd.DataFrame({
        "doc": np.array([1] * 40 + [2] * 3, dtype=np.int64),
        "start": np.arange(43, dtype=np.int64) * 100,
        "end": np.arange(43, dtype=np.int64) * 100 + 50})
    ds = ray.data.from_pandas(spans)
    store = SpanStore.write(ds, str(tmp_path / "s"), rows_per_file=8)
    assert len(store.files) >= 4
    d, s, e = store.spans_for(np.array([1], dtype=np.int64))
    assert len(d) == 40 and (d == 1).all()
    assert sorted(s.tolist()) == [i * 100 for i in range(40)]
    d2, s2, e2 = store.spans_for(np.array([2, 99], dtype=np.int64))
    assert len(d2) == 3
    d3, _, _ = store.spans_for(np.array([99], dtype=np.int64))
    assert len(d3) == 0


def test_passage_spans_randomized_trials(ray_session):
    """Randomized corpora (planted shared chunks at random offsets, some
    overlapping/nested) against the brute-force reference. The engine
    pairs only min+adjacent bucket partners (documented), so a span's
    BOUNDARY can land a few bytes inside the all-pairs-union maximum
    when a different partner shares one extra coincidental byte —
    soundness must be exact (every engine span inside a brute span) and
    every brute span must be covered up to a small boundary slack."""
    import ray.data

    from libfilter_ray.stages.passages import duplicate_passage_spans

    SLACK = 8
    for trial in range(3):
        rng = np.random.default_rng(100 + trial)

        def rnd(n):
            return "".join(rng.choice(list("abcdefgh ij"), size=n))

        chunks = [rnd(int(rng.integers(64, 140))) for _ in range(3)]
        texts = {}
        for d in range(6):
            parts = [rnd(int(rng.integers(10, 60)))]
            for c in chunks:
                if rng.random() < 0.5:
                    parts.append(c)
                    parts.append(rnd(int(rng.integers(5, 30))))
            texts[d] = "".join(parts)
        df = pd.DataFrame({"doc_id": list(texts),
                           "text": list(texts.values())})
        got = duplicate_passage_spans(
            ray.data.from_pandas(df).repartition(3), "text", "doc_id",
            min_len=64).to_pandas()
        want = _brute_common_spans(texts, 64)
        got_by_doc = {int(d): sorted(
            (int(s), int(e)) for _, (s, e) in
            got.loc[got["doc"] == d, ["start", "end"]].iterrows())
            for d in got["doc"].unique()} if len(got) and \
            "doc" in got.columns else {}
        for d, spans in want.items():
            mine = got_by_doc.get(d, [])
            assert len(mine) == len(spans), (trial, d, mine, spans)
            for (gs, ge), (ws, we) in zip(mine, spans):
                # soundness: engine span inside the true duplicate region
                assert ws <= gs and ge <= we, (trial, d, mine, spans)
                # coverage: boundaries within the pairing slack
                assert gs - ws <= SLACK and we - ge <= SLACK, \
                    (trial, d, mine, spans)
        for d, mine in got_by_doc.items():
            assert d in want and len(want[d]) == len(mine)
