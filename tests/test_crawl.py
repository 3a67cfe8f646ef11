"""Crawl-curation stages (stages/crawl.py): keep-newest url dedup,
per-domain caps, benchmark decontamination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _pages(n=400, n_urls=120, seed=7):
    """Synthetic captures: `n` rows over `n_urls` urls, some urls captured
    several times with distinct timestamps."""
    rng = np.random.default_rng(seed)
    url_idx = rng.integers(0, n_urls, size=n)
    ts = rng.permutation(n).astype(np.int64) * 1_000_000
    return pd.DataFrame({
        "url": [f"https://d{i % 7}.example.org/p{i}" for i in url_idx],
        "warc_ts": pd.to_datetime(ts, unit="us"),
        "row_id": np.arange(n, dtype=np.int64) * 3 + 1,
        "lang": [("en", "de", "fr")[i % 3] for i in url_idx],
    })


def test_url_dedup_latest_matches_pandas(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import url_dedup_latest

    df = _pages()
    ds = ray.data.from_pandas(df).repartition(8)
    kept = url_dedup_latest(ds, id_col="row_id").to_pandas()

    want = df.sort_values(["url", "warc_ts", "row_id"],
                          ascending=[True, False, True], kind="stable") \
        .drop_duplicates(subset=["url"])
    assert sorted(kept["row_id"]) == sorted(want["row_id"])


def test_url_dedup_latest_tie_keeps_min_id(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import url_dedup_latest

    ts = pd.to_datetime([1000, 1000, 500], unit="us")
    df = pd.DataFrame({"url": ["u", "u", "u"], "warc_ts": ts,
                       "row_id": np.array([9, 4, 1], dtype=np.int64)})
    kept = url_dedup_latest(ray.data.from_pandas(df),
                            id_col="row_id").to_pandas()
    assert kept["row_id"].tolist() == [4]


def test_url_dedup_all_unique_is_noop(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import url_dedup_latest

    df = _pages(n=50, n_urls=5000)  # collisions vanish
    df = df.drop_duplicates(subset=["url"])
    ds = ray.data.from_pandas(df)
    kept = url_dedup_latest(ds, id_col="row_id").to_pandas()
    assert len(kept) == len(df)


def test_domain_cap_exact_selection(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import cap_rank_of, domain_cap

    n = 600
    df = pd.DataFrame({
        "url": [f"https://d{i % 5}.example.org/page/{i}" for i in range(n)],
        "doc_id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(16)
    kept = domain_cap(ds, id_col="doc_id", cap=9).to_pandas()

    ref = df.assign(domain=[u.split("/")[2] for u in df["url"]],
                    rank=cap_rank_of(df["doc_id"].to_numpy()))
    want = ref.sort_values(["domain", "rank", "doc_id"], kind="stable") \
        .groupby("domain").head(9)
    assert sorted(kept["doc_id"]) == sorted(want["doc_id"])
    assert (kept.assign(domain=[u.split("/")[2] for u in kept["url"]])
            .groupby("domain").size() <= 9).all()


def test_domain_cap_under_cap_keeps_all(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import domain_cap

    df = pd.DataFrame({
        "url": [f"https://only.example.org/{i}" for i in range(5)],
        "doc_id": np.arange(5, dtype=np.int64)})
    kept = domain_cap(ray.data.from_pandas(df), id_col="doc_id",
                      cap=40).to_pandas()
    assert len(kept) == 5


def test_per_key_cap_combiner_bounds_shuffle(ray_session):
    """The per-batch combiner must emit at most cap rows per (block, key)
    — the hot-domain skew guard."""
    import ray.data

    from libfilter_ray.stages.crawl import domain_of, per_key_cap_keep_ds

    n = 2000  # one giant domain
    df = pd.DataFrame({
        "url": ["https://hot.example.org/x"] * n,
        "doc_id": np.arange(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(4)
    keep = per_key_cap_keep_ds(
        ds, lambda t: domain_of(t["url"]), "doc_id", cap=7).to_pandas()
    assert len(keep) == 7


def test_decontaminate_flags_match_bruteforce(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import (benchmark_shingle_ref,
                                            contamination_flags)

    rng = np.random.default_rng(3)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet"]

    def mk(n_words):
        return " ".join(rng.choice(words, size=n_words))

    bench_texts = [mk(30) for _ in range(20)]
    corpus_texts = bench_texts[:5] \
        + [mk(30) for _ in range(40)] \
        + ["zz"]  # shorter than k -> 0 shingles, never contaminated
    corpus = pd.DataFrame({
        "doc_id": np.arange(len(corpus_texts), dtype=np.int64),
        "text": corpus_texts})
    bench_ds = ray.data.from_pandas(pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64), "text": bench_texts}))
    corpus_ds = ray.data.from_pandas(corpus).repartition(4)

    k = 8
    ref, exact = benchmark_shingle_ref(bench_ds, "text", k=k)
    assert exact
    flags = corpus_ds.map_batches(
        contamination_flags("text", "doc_id", ref, exact, k=k,
                            threshold=0.5),
        batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # brute force with python sets of character shingles
    bench_sh = set()
    for t in bench_texts:
        bench_sh |= {t[i:i + k] for i in range(len(t) - k + 1)}
    for _, row in flags.iterrows():
        t = corpus_texts[int(row["doc_id"])]
        sh = {t[i:i + k] for i in range(len(t) - k + 1)} \
            if len(t) >= k else set()
        assert row["n_shingles"] == len(sh)
        assert row["n_hits"] == len(sh & bench_sh)
        want_flag = len(sh) > 0 and len(sh & bench_sh) / len(sh) >= 0.5
        assert bool(row["contaminated"]) == want_flag
    # the 5 verbatim benchmark copies must all be flagged
    assert flags.loc[:4, "contaminated"].all()
    assert not flags.iloc[-1]["contaminated"]  # the sub-k row


def test_decontaminate_bloom_path_is_superset(ray_session):
    """Beyond the exact bound the benchmark set rides a BlockBloom; flags
    must be a superset of the exact ones (false hits only ever add)."""
    import ray.data

    from libfilter_ray.stages.crawl import (benchmark_shingle_ref,
                                            contamination_flags)

    rng = np.random.default_rng(5)
    texts = ["".join(rng.choice(list("abcdefgh"), size=40))
             for _ in range(30)]
    bench_ds = ray.data.from_pandas(
        pd.DataFrame({"text": texts[:10]}))
    corpus = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    corpus_ds = ray.data.from_pandas(corpus)

    ref_e, exact_e = benchmark_shingle_ref(bench_ds, "text", k=8)
    ref_b, exact_b = benchmark_shingle_ref(bench_ds, "text", k=8,
                                           exact_limit=1)
    assert exact_e and not exact_b
    fe = corpus_ds.map_batches(
        contamination_flags("text", "doc_id", ref_e, True, k=8),
        batch_format="pyarrow").to_pandas().sort_values("doc_id")
    fb = corpus_ds.map_batches(
        contamination_flags("text", "doc_id", ref_b, False, k=8),
        batch_format="pyarrow").to_pandas().sort_values("doc_id")
    assert (fb["n_hits"].to_numpy() >= fe["n_hits"].to_numpy()).all()
    assert (fb["contaminated"] | ~fe["contaminated"]).all()


def test_decontaminate_removes_only_contaminated(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import decontaminate

    texts = ["the quick brown fox jumps over the lazy dog"] * 3 \
        + ["completely different content with no overlap at all here"]
    corpus = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64), "text": texts})
    bench = pd.DataFrame({"text": [texts[0]]})
    out = decontaminate(ray.data.from_pandas(corpus),
                        ray.data.from_pandas(bench),
                        "text", "doc_id", k=8, threshold=0.5).to_pandas()
    assert out["doc_id"].tolist() == [3]


def test_crawl_delta_classifies(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import crawl_delta

    a = pd.DataFrame({
        "url": [f"https://d.example.org/{i}" for i in range(10)],
        "text": [f"content {i}" for i in range(10)]})
    b = pd.DataFrame({
        "url": [f"https://d.example.org/{i}" for i in range(2, 12)],
        "text": [f"content {i}" if i % 3 else f"content {i} v2"
                 for i in range(2, 12)]})
    out = crawl_delta(ray.data.from_pandas(a).repartition(3),
                      ray.data.from_pandas(b).repartition(3)) \
        .to_pandas().set_index("url")["status"]
    for i in range(12):
        u = f"https://d.example.org/{i}"
        if i < 2:
            assert out[u] == "removed"
        elif i >= 10:
            assert out[u] == "added"
        elif i % 3 == 0:
            assert out[u] == "changed"
        else:
            assert out[u] == "unchanged"


def test_domain_of_malformed_urls_sentinel(ray_session):
    import pyarrow.compute as pc

    from libfilter_ray.stages.crawl import domain_of

    col = pa.array(["https://d.example.org/x", "example.com/no-scheme",
                    "mailto:a@b", None, "ftp://h2/p"])
    got = domain_of(col).to_pylist()
    assert got == ["d.example.org", "", "", "", "h2"]


def test_domain_cap_survives_malformed_urls(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import domain_cap

    df = pd.DataFrame({
        "url": ["https://d.example.org/1", "garbage", None,
                "https://d.example.org/2"],
        "doc_id": np.arange(4, dtype=np.int64)})
    kept = domain_cap(ray.data.from_pandas(df), id_col="doc_id",
                      cap=10).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 2, 3]  # nothing lost


def test_contamination_null_and_empty_rows(ray_session):
    import ray.data

    from libfilter_ray.stages.crawl import (benchmark_shingle_ref,
                                            contamination_flags)

    bench_ds = ray.data.from_pandas(pd.DataFrame({
        "text": ["the quick brown fox jumps", None, ""]}))
    corpus = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": pd.array(["the quick brown fox jumps", None, "", "zz"],
                         dtype="string")})
    ref, exact = benchmark_shingle_ref(bench_ds, "text", k=8)
    flags = ray.data.from_pandas(corpus).map_batches(
        contamination_flags("text", "doc_id", ref, exact, k=8),
        batch_format="pyarrow").to_pandas().sort_values("doc_id")
    assert bool(flags.iloc[0]["contaminated"])          # verbatim copy
    assert not flags.iloc[1:]["contaminated"].any()     # null/empty/short
    assert (flags.iloc[1:]["n_shingles"] == 0).all()


def test_crawl_ops_never_collect_payloads(ray_session, monkeypatch):
    """Scale guard, same spy as the dedup family: the crawl curation ops
    may collect only bounded control tables (multi-capture hashes, keep
    sets, drop ids, status counts) — never a frame carrying the text/url
    payload columns of the corpus."""
    import ray.data

    from libfilter_ray.stages.crawl import (crawl_delta, domain_cap,
                                            url_dedup_latest)

    n = 300
    df = pd.DataFrame({
        "url": [f"https://d{i % 9}.example.org/p{i % 100}"
                for i in range(n)],
        "warc_ts": pd.to_datetime(
            np.arange(n, dtype=np.int64) * 1_000_000, unit="us"),
        "text": [f"content {i}" for i in range(n)],
        "row_id": np.arange(n, dtype=np.int64),
    })
    ds = ray.data.from_pandas(df).repartition(5)

    collected: list[tuple[list, int]] = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        collected.append((list(out.columns), len(out)))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    url_dedup_latest(ds, id_col="row_id").materialize()
    domain_cap(ds, id_col="row_id", cap=5).materialize()
    crawl_delta(ds, ds).materialize()

    banned = {"text", "warc_ts", "html"}
    for cols, rows in collected:
        assert not banned & set(cols), \
            f"payload columns collected to driver: {cols} ({rows} rows)"


def test_crawl_delta_randomized(ray_session):
    """Randomized snapshot pairs vs a pandas outer-merge reference."""
    import ray.data

    from libfilter_ray.stages.crawl import crawl_delta

    for trial in range(3):
        rng = np.random.default_rng(50 + trial)
        urls = [f"https://d{i % 4}.example.org/p{i}" for i in range(60)]
        a_idx = rng.choice(60, size=40, replace=False)
        b_idx = rng.choice(60, size=40, replace=False)
        a = pd.DataFrame({
            "url": [urls[i] for i in a_idx],
            "text": [f"v{rng.integers(0, 2)} of {i}" for i in a_idx]})
        b = pd.DataFrame({
            "url": [urls[i] for i in b_idx],
            "text": [f"v{rng.integers(0, 2)} of {i}" for i in b_idx]})
        got = crawl_delta(ray.data.from_pandas(a).repartition(3),
                          ray.data.from_pandas(b).repartition(3)) \
            .to_pandas().set_index("url")["status"].to_dict()
        m = a.merge(b, on="url", how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        for _, r in m.iterrows():
            want = ("added" if r["_merge"] == "right_only" else
                    "removed" if r["_merge"] == "left_only" else
                    "unchanged" if r["text_a"] == r["text_b"]
                    else "changed")
            assert got[r["url"]] == want, (trial, r["url"])


def test_blocked_url_mask_suffix_semantics(ray_session):
    import pyarrow as pa

    from libfilter_ray.stages.crawl import (blocked_domains_ref,
                                            blocked_url_mask)

    ref = blocked_domains_ref(["example.org", "ads.tracker.net"])
    urls = pa.array([
        "https://example.org/x",            # exact host
        "https://sub.example.org/x",        # subdomain
        "https://a.b.c.example.org/x",      # deep subdomain
        "https://badexample.org/x",         # suffix but NOT at a dot
        "https://example.org.evil.com/x",   # blocked name as PREFIX
        "https://ads.tracker.net/x",        # second entry, exact
        "https://tracker.net/x",            # parent of a blocked sub
        "not-a-url",                        # malformed -> "" host
        "https://EXAMPLE.org/x",            # case-sensitive (no match)
    ])
    got = blocked_url_mask(urls, ref).tolist()
    assert got == [True, True, True, False, False, True, False,
                   False, False]


def test_blocklist_filter_drops_rows(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from libfilter_ray.stages.crawl import (blocked_domains_ref,
                                            blocklist_filter)

    df = pd.DataFrame({
        "url": [f"https://{h}/p" for h in
                ["keep.org", "bad.org", "x.bad.org", "fine.net"] * 25],
        "row_id": np.arange(100, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(3)
    out = blocklist_filter(ds, "url",
                           blocked_domains_ref(["bad.org"])).to_pandas()
    assert len(out) == 50
    assert not out["url"].str.contains("bad.org").any()
