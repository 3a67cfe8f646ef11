"""Link-graph stage (stages/graph.py): edge synthesis invariants,
distributed connected components vs a local union-find, and
integer-exact PageRank vs a local numpy reference."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from conftest import SF_DIR

from libfilter_ray.stages.graph import (
    PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_TELEPORT,
    _edges_of, _outdeg_of, component_size_histogram, pagerank_topk,
    synth_link_edges,
)

N = 500  # documents at sf0.001 (contiguous doc_id 0..N-1)


def _local_edges(n):
    return _edges_of(np.arange(n, dtype=np.int64), n)


def _local_components(n):
    """Union-find ground truth over the undirected synthesized graph."""
    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    src, dst = _local_edges(n)
    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def _local_pagerank(n, iters, dangling="drop"):
    src, dst = _local_edges(n)
    outdeg = _outdeg_of(np.arange(n, dtype=np.int64), n)
    r = np.full(n, PR_BASE, dtype=np.int64)
    for _ in range(iters):
        extra = int(r[outdeg == 0].sum()) // n \
            if dangling == "redistribute" else 0
        share = r // np.maximum(outdeg, 1)
        s = np.bincount(dst, weights=share[src].astype(np.float64),
                        minlength=n).astype(np.int64)
        # bincount goes through float64; the sums here are < 2^53 so the
        # round-trip is exact for the test sizes
        r = PR_TELEPORT + (PR_DAMP_NUM * (s + extra)) // PR_DAMP_DEN
    return r


def test_edge_synthesis_invariants():
    src, dst = _local_edges(N)
    assert (src != dst).all(), "self-loops must be dropped"
    assert (dst >= 0).all() and (dst < N).all()
    # outdeg formula must agree with the materialized edge multiset
    counted = np.bincount(src, minlength=N)
    assert (counted == _outdeg_of(np.arange(N), N)).all()
    # anchors: every u%7!=0 points at its block anchor
    a = src[: (np.arange(N) % 7 != 0).sum()]
    assert ((a - a % 7) == dst[: len(a)]).all()


def test_component_histogram_matches_union_find(ray_session):
    import ray.data

    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id"])
    hist = component_size_histogram(docs, N)
    roots = _local_components(N)
    _, counts = np.unique(roots, return_counts=True)
    sizes, n_comp = np.unique(counts, return_counts=True)
    assert hist["size"].tolist() == sizes.tolist()
    assert hist["n_components"].tolist() == n_comp.tolist()
    assert int((hist["size"] * hist["n_components"]).sum()) == N


def test_pagerank_matches_local_reference(ray_session):
    import ray.data

    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id"])
    top = pagerank_topk(docs, N, k=10, iters=3)
    ref = _local_pagerank(N, iters=3)
    order = np.lexsort((np.arange(N), -ref))[:10]
    assert top["doc_id"].tolist() == order.tolist()
    assert top["pr_micro"].tolist() == ref[order].tolist()


def test_pagerank_partitioning_invariance(ray_session):
    """Same exact integers regardless of how the node table is split —
    the shuffle-correctness property a 256-node run depends on."""
    import ray.data

    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(N, dtype=np.int64))}))
    a = pagerank_topk(docs, N, k=10, iters=2)
    b = pagerank_topk(docs.repartition(7), N, k=10, iters=2)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["pr_micro"].tolist() == b["pr_micro"].tolist()


def test_edge_table_pagerank_matches_formula_path(ray_session):
    """The real-edge-table face (join-based) must produce the exact same
    integers as the formula-scatter face on the same graph."""
    import ray.data

    from libfilter_ray.stages.graph import (
        integer_pagerank, integer_pagerank_edges)

    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(N, dtype=np.int64))}))
    a = integer_pagerank(docs, N, iters=2).to_pandas() \
        .sort_values("v").reset_index(drop=True)
    edges = synth_link_edges(docs, N)
    b = integer_pagerank_edges(
        edges, docs, iters=2, node_col="doc_id",
        num_shards=8).to_pandas().sort_values("v").reset_index(drop=True)
    assert a["v"].tolist() == b["v"].tolist()
    assert a["pr_micro"].tolist() == b["pr_micro"].tolist()


def test_pagerank_redistribute_matches_local_reference(ray_session):
    """Dangling-mass redistribution (the standard formulation): both
    faces produce the same exact integers as the local reference, and
    differ from drop mode (the graph HAS dangling nodes, so the modes
    must diverge — a silent no-op redistribute would pass equality)."""
    import ray.data

    from libfilter_ray.stages.graph import (
        integer_pagerank, integer_pagerank_edges)

    assert (_outdeg_of(np.arange(N, dtype=np.int64), N) == 0).any()
    ref = _local_pagerank(N, iters=3, dangling="redistribute")
    assert ref.tolist() != _local_pagerank(N, iters=3).tolist()

    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(N, dtype=np.int64))}))
    a = integer_pagerank(docs, N, iters=3, dangling="redistribute") \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert a["pr_micro"].tolist() == ref.tolist()

    edges = synth_link_edges(docs, N)
    b = integer_pagerank_edges(
        edges, docs, iters=3, node_col="doc_id", num_shards=8,
        dangling="redistribute").to_pandas() \
        .sort_values("v").reset_index(drop=True)
    assert b["pr_micro"].tolist() == ref.tolist()
    assert list(b.columns) == ["v", "pr_micro"]


def test_pagerank_rejects_unknown_dangling_mode(ray_session):
    import ray.data

    from libfilter_ray.stages.graph import integer_pagerank

    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(np.arange(10, dtype=np.int64))}))
    with pytest.raises(ValueError, match="dangling"):
        integer_pagerank(docs, 10, dangling="teleport")


def _uf_components(n_nodes, src, dst):
    parent = np.arange(n_nodes, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n_nodes)], dtype=np.int64)


def test_random_graph_components_property(ray_session):
    """General-edge CC vs union-find on random graphs — hardens the
    path beyond the formula fixture (self-loops, parallel edges,
    isolated nodes, a dense clump)."""
    import ray.data

    from libfilter_ray.stages.graph import component_size_histogram_edges

    rng = np.random.default_rng(0xBADD)
    for trial in range(4):
        n = int(rng.integers(20, 120))
        m = int(rng.integers(0, 3 * n))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        keep = src != dst  # CC contract: pair tables carry no self-pairs
        src, dst = src[keep], dst[keep]
        nodes = ray.data.from_arrow(pa.table(
            {"node": pa.array(np.arange(n, dtype=np.int64))}))
        edges = ray.data.from_arrow(pa.table(
            {"src": pa.array(src), "dst": pa.array(dst)}))
        hist = component_size_histogram_edges(edges, nodes)
        roots = _uf_components(n, src, dst)
        _, counts = np.unique(roots, return_counts=True)
        sizes, n_comp = np.unique(counts, return_counts=True)
        assert hist["size"].tolist() == sizes.tolist(), f"trial {trial}"
        assert hist["n_components"].tolist() == n_comp.tolist()


def test_random_graph_pagerank_property(ray_session):
    """Edge-table PageRank vs the local integer recurrence on random
    multigraphs (parallel edges count once per occurrence in both)."""
    import ray.data

    from libfilter_ray.stages.graph import integer_pagerank_edges

    rng = np.random.default_rng(0xF00D)
    for trial in range(3):
        n = int(rng.integers(15, 80))
        m = int(rng.integers(1, 4 * n))
        src = rng.integers(0, n, m).astype(np.int64)
        dst = rng.integers(0, n, m).astype(np.int64)
        nodes = ray.data.from_arrow(pa.table(
            {"node": pa.array(np.arange(n, dtype=np.int64))}))
        edges = ray.data.from_arrow(pa.table(
            {"src": pa.array(src), "dst": pa.array(dst)}))
        got = integer_pagerank_edges(edges, nodes, iters=2,
                                     num_shards=4).to_pandas() \
            .sort_values("v").reset_index(drop=True)
        outdeg = np.bincount(src, minlength=n).astype(np.int64)
        r = np.full(n, PR_BASE, dtype=np.int64)
        for _ in range(2):
            share = r // np.maximum(outdeg, 1)
            s = np.bincount(dst, weights=share[src].astype(np.float64),
                            minlength=n).astype(np.int64)
            r = PR_TELEPORT + (PR_DAMP_NUM * s) // PR_DAMP_DEN
        assert got["v"].tolist() == list(range(n)), f"trial {trial}"
        assert got["pr_micro"].tolist() == r.tolist(), f"trial {trial}"


def test_synth_edges_streaming_shape(ray_session):
    import ray.data

    docs = ray.data.range(64).map_batches(
        lambda b: pa.table({"doc_id": pa.array(
            np.asarray(b["id"], dtype=np.int64))}),
        batch_format="pyarrow")
    edges = synth_link_edges(docs, 64).to_pandas()
    src, dst = _edges_of(np.arange(64, dtype=np.int64), 64)
    got = sorted(zip(edges["src"], edges["dst"]))
    assert got == sorted(zip(src, dst))


def test_edge_table_pagerank_rejects_duplicate_nodes(ray_session):
    import ray.data

    from libfilter_ray.stages.graph import integer_pagerank_edges

    edges = ray.data.from_arrow(pa.table(
        {"src": pa.array([0, 1], type=pa.int64()),
         "dst": pa.array([1, 2], type=pa.int64())}))
    nodes = ray.data.from_arrow(pa.table(
        {"node": pa.array([0, 1, 2, 2], type=pa.int64())}))
    with pytest.raises(ValueError, match="duplicate"):
        integer_pagerank_edges(edges, nodes, iters=1, num_shards=2)


def test_links_to_pagerank_composition(ray_session):
    """End-to-end crawl-to-graph bridge: pages with planted anchors ->
    links_stage edge extraction -> integer_pagerank_edges == pagerank
    over the directly-constructed edge table."""
    import ray.data

    from libfilter_ray.stages.extract import links_stage
    from libfilter_ray.stages.graph import integer_pagerank_edges

    n = 120
    ids = np.arange(n, dtype=np.int64)
    html, src_l, dst_l = [], [], []
    for i in ids:
        anchors = ""
        for k in range(1, 2 + int(i) % 3):
            j = (int(i) * 7 + k) % n
            anchors += f'<a href="doc://{j}">x</a>'
            src_l.append(int(i))
            dst_l.append(j)
        html.append(f"<html><body>text {i}{anchors}</body></html>")
    pages = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "html": pa.array(html)})).repartition(4)
    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))

    def to_int(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dst = pc.cast(pc.replace_substring(t["dst"], "doc://", ""),
                      pa.int64())
        return pa.table({"src": t["src"], "dst": dst})

    extracted = pages.map_batches(
        links_stage(html_col="html", src_col="doc_id"),
        batch_format="pyarrow").map_batches(to_int,
                                            batch_format="pyarrow")
    direct = ray.data.from_arrow(pa.table({
        "src": pa.array(src_l, type=pa.int64()),
        "dst": pa.array(dst_l, type=pa.int64())}))
    a = integer_pagerank_edges(extracted, docs, iters=2,
                               node_col="doc_id", num_shards=8) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    b = integer_pagerank_edges(direct, docs, iters=2,
                               node_col="doc_id", num_shards=8) \
        .to_pandas().sort_values("v").reset_index(drop=True)
    assert a["v"].tolist() == b["v"].tolist()
    assert a["pr_micro"].tolist() == b["pr_micro"].tolist()
    assert a["pr_micro"].nunique() > 1  # ranks genuinely differ
