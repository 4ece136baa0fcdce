"""Function-library tests over the driver testdata (sf0.001)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return ray.data.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_table():
    return pq.read_table(f"{SF}/documents.parquet")


def test_transformers_chain(docs):
    from datax_ray.functions.transformers import apply_transformers

    out = apply_transformers(
        docs,
        [
            {"name": "dx_substr", "column": "text", "startIndex": 0, "length": 10},
            {"name": "dx_pad", "column": "lang", "length": 5, "padString": "_"},
            {"name": "dx_replace", "column": "source", "pattern": "a", "replacement": "@"},
            {"name": "dx_filter", "column": "n_chars", "op": ">", "value": 10},
        ],
    ).take_all()
    assert out
    assert all(len(r["text"]) <= 10 for r in out)
    assert all(len(r["lang"]) == 5 for r in out)
    assert all("a" not in r["source"] for r in out)


def test_filter_like(docs):
    from datax_ray.functions.transformers import apply_transformers

    out = apply_transformers(
        docs, [{"name": "dx_filter", "column": "lang", "op": "like", "value": "e%"}]
    ).take_all()
    assert out and all(r["lang"].startswith("e") for r in out)


def test_text_signals(docs, docs_table):
    from datax_ray.functions.text import add_quality_signals, add_fingerprint

    out = docs.map_batches(
        lambda t: add_fingerprint(add_quality_signals(t)), batch_format="pyarrow"
    ).take_all()
    assert len(out) == docs_table.num_rows
    r = out[0]
    assert r["n_chars_calc"] == len(r["text"])
    assert r["n_tokens"] == r["text"].count(" ") + 1
    import hashlib

    assert r["fingerprint"] == hashlib.md5(r["text"].encode()).hexdigest()


def test_lang_id(docs):
    from datax_ray.functions.text import LangId

    out = docs.map_batches(LangId, batch_format="pyarrow", concurrency=2).take_all()
    langs = {r["lang_pred"] for r in out}
    assert langs <= {"en", "fr", "de", "es", "unknown"}
    assert len(langs) > 1  # heuristic actually discriminates


def test_exact_dedup(docs, docs_table):
    from datax_ray.functions.dedup import exact_dedup

    out = exact_dedup(docs).take_all()
    n_distinct = len(set(docs_table["text"].to_pylist()))
    assert len(out) == n_distinct


def test_minhash_self_dup(tmp_path):
    # a table with exact dup texts and one near-dup must pair up
    texts = [
        "the quick brown fox jumps over the lazy dog again and again ok",
        "the quick brown fox jumps over the lazy dog again and again ok",  # dup of 0
        "the quick brown fox jumps over the lazy dog again and again now",  # near 0
        "completely different content about ray data pipelines at scale yes",
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()), "text": texts})
    ds = ray.data.from_arrow(t)
    from datax_ray.functions.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(ds, threshold=0.5).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) in got or (1, 2) in got
    assert all((a, b) != (0, 3) and (a, b) != (1, 3) and (a, b) != (2, 3) for a, b in got)


def test_simhash_pairs():
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "unrelated words entirely different domain vocabulary cluster here now",
    ]
    t = pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()), "text": texts})
    from datax_ray.functions.dedup import simhash_pairs

    pairs = simhash_pairs(ray.data.from_arrow(t)).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (10, 11) in got
    assert not any(12 in p for p in got)


def test_ngram_jaccard():
    from datax_ray.functions.dedup import ngram_jaccard

    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0


def test_knn_brute_matches_numpy(tmp_path):
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    from datax_ray.functions.similarity import knn_brute

    mat = np.stack(emb["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    ids = np.asarray(emb["vec_id"].to_pylist())
    q = mat[:2]
    out = knn_brute(ds, q, k=5).take_all()
    # numpy reference
    unit = mat / np.linalg.norm(mat, axis=1)[:, None]
    qu = q / np.linalg.norm(q, axis=1)[:, None]
    cos = qu @ unit.T
    for qi in range(2):
        expect = set(
            ids[np.lexsort((ids, -cos[qi]))][:5].tolist()
        )
        got = {r["vec_id"] for r in out if r["query_id"] == qi}
        assert got == expect


def test_knn_ivf_recall():
    emb = pq.read_table(f"{SF}/embeddings.parquet")
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    from datax_ray.functions.similarity import IVFIndex, knn_brute, knn_ivf

    mat = np.stack(emb["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    q = mat[:3]
    index = IVFIndex.fit(mat, n_lists=8)
    exact = knn_brute(ds, q, k=10).take_all()
    approx = knn_ivf(ds, index, q, k=10, nprobe=4).take_all()
    for qi in range(3):
        e = {r["vec_id"] for r in exact if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx if r["query_id"] == qi}
        assert len(e & a) / 10 >= 0.5  # nprobe=4 of 8 lists: decent recall


def test_embedding_dup_pairs():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 16))
    vecs = np.vstack([base, base[0] + 0.001 * rng.standard_normal(16)])
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(21, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    from datax_ray.functions.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(ray.data.from_arrow(t), threshold=0.99).take_all()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(0, 20)}


def test_sessionize_and_windows():
    events = ray.data.read_parquet(f"{SF}/events.parquet")
    from datax_ray.functions.windows import sessionize, tumbling_window_counts

    sess = sessionize(events).take_all()
    assert sess and all(r["n_events"] >= 1 for r in sess)
    assert all(r["t_end"] >= r["t_start"] for r in sess)

    wins = tumbling_window_counts(events).take_all()
    total = sum(r["n_events"] for r in wins)
    assert total == 1000  # sf0.001 events rows


def test_broadcast_join_and_topk():
    import pyarrow.parquet as pq

    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    cust = pq.read_table(f"{SF}/customer.parquet")
    from datax_ray.functions.relational import broadcast_join, top_k

    # join on o_custkey == c_custkey: align names first
    cust2 = cust.rename_columns(
        ["o_custkey" if n == "c_custkey" else n for n in cust.column_names]
    )
    joined = broadcast_join(orders, cust2, on="o_custkey").take_all()
    assert joined and "c_mktsegment" in joined[0]

    top = top_k(orders, by="o_totalprice", k=5, tie_col="o_orderkey").take_all()
    assert len(top) == 5
    prices = [r["o_totalprice"] for r in top]
    assert prices == sorted(prices, reverse=True)


def test_multimodal_codecs_roundtrip():
    """The pure-numpy codecs are REAL: encode->decode is identity."""
    from datax_ray.functions.multimodal import (
        decode_ppm,
        decode_ppmv,
        decode_wav,
        encode_ppm,
        encode_ppmv,
        encode_wav,
    )

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(23, 41, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    wave = (rng.standard_normal(4000) * 10000).astype(np.int16)
    rate, back = decode_wav(encode_wav(wave, rate=8000))
    assert rate == 8000 and (back == wave).all()
    frames = rng.integers(0, 256, size=(5, 16, 17, 3), dtype=np.uint8)
    fr, ms = decode_ppmv(encode_ppmv(frames, 500))
    assert ms == 500 and (fr == frames).all()


def test_multimodal_features():
    from datax_ray.functions.multimodal import (
        MediaDecoder,
        decode_ppm,
        extract_features,
        synthesize_media_table,
    )

    t = synthesize_media_table(32)
    out = extract_features(ray.data.from_arrow(t), feat_dim=8).take_all()
    assert len(out) == 32
    assert all(len(r["feature"]) == 8 for r in out)
    # deterministic: same payload -> same features
    again = extract_features(ray.data.from_arrow(t), feat_dim=8).take_all()
    f1 = {r["media_id"]: r["feature"] for r in out}
    f2 = {r["media_id"]: r["feature"] for r in again}
    assert f1 == f2
    # the image features really derive from decoded pixels: first three
    # dims are per-channel means / 255
    rows = t.to_pylist()
    img_row = next(r for r in rows if r["kind"] == "image")
    img = decode_ppm(img_row["payload"]).astype(np.float64)
    want = img.mean(axis=(0, 1)) / 255
    got = f1[img_row["media_id"]][:3]
    assert np.allclose(got, want)
    with pytest.raises(ValueError):
        MediaDecoder()._image_features(b"not a ppm")


def test_multimodal_resize_and_frames():
    import ray.data

    from datax_ray.functions.multimodal import (
        FrameSampleStub,
        media_pipeline,
        synthesize_media_table,
    )

    media = synthesize_media_table(64)
    out = media_pipeline(ray.data.from_arrow(media), max_side=24).take_all()
    assert len(out) == 64 and all(len(r["feature"]) == 16 for r in out)

    # resize really shrinks pixels: every resized image payload decodes to
    # dims <= max_side with aspect preserved
    from datax_ray.functions.multimodal import ImageResizer, decode_ppm

    resized = (
        ray.data.from_arrow(media)
        .map_batches(ImageResizer, fn_constructor_kwargs=dict(max_side=24),
                     batch_format="pyarrow", concurrency=(1, 2))
        .take_all()
    )
    for r in resized:
        if r["kind"] != "image":
            continue
        img = decode_ppm(r["payload"])
        assert img.shape[0] <= 24 and img.shape[1] <= 24
        assert img.shape[:2] == (r["height"], r["width"])

    frames = (
        ray.data.from_arrow(media)
        .map_batches(
            FrameSampleStub,
            fn_constructor_kwargs=dict(every_ms=1000, max_frames=4),
            batch_format="pyarrow",
            concurrency=(1, 2),
        )
        .take_all()
    )
    n_videos = sum(1 for r in media.to_pylist() if r["kind"] == "video")
    assert len(frames) >= n_videos  # >= one frame per video
    assert all(0 <= r["frame_idx"] < 4 for r in frames)
    # each emitted frame is a decodable PPM of the video's dims
    dims = {r["media_id"]: (r["height"], r["width"]) for r in media.to_pylist()}
    for r in frames:
        img = decode_ppm(r["frame"])
        assert img.shape[:2] == dims[r["media_id"]]


def test_bucket_count_invariance(docs):
    """Results are invariant to the coarse shuffle bucket count — the sizing
    rule (functions/_buckets.py) may pick any value without changing output.
    Guards the 100 TB path: num_buckets scales with input, correctness
    doesn't depend on it."""
    from datax_ray.functions._buckets import coarse_buckets
    from datax_ray.functions.dedup import exact_dedup, minhash_lsh_pairs
    from datax_ray.functions.windows import sessionize

    assert coarse_buckets(None) == 64
    assert coarse_buckets(10_000) == 64
    assert coarse_buckets(1_000_000_000) == 500
    assert coarse_buckets(16_000_000_000) == 8000

    def key(rows, cols):
        return sorted(tuple(r[c] for c in cols) for r in rows)

    d64 = exact_dedup(docs, num_buckets=64).take_all()
    d512 = exact_dedup(docs, num_buckets=512).take_all()
    assert key(d64, ["doc_id", "text"]) == key(d512, ["doc_id", "text"])

    m64 = minhash_lsh_pairs(docs, threshold=0.5, num_buckets=64).take_all()
    m512 = minhash_lsh_pairs(docs, threshold=0.5, num_buckets=512).take_all()
    assert key(m64, ["doc_a", "doc_b"]) == key(m512, ["doc_a", "doc_b"])

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_id"])
    s64 = sessionize(ev, num_buckets=64).take_all()
    s512 = sessionize(ev, num_buckets=512).take_all()
    cols = ["user_id", "session_id", "n_events", "t_start", "t_end"]
    assert key(s64, cols) == key(s512, cols)


def test_ngram_pairs_distributed_verify_matches_driver_verify(docs):
    """The distributed verify (texts routed to pair-buckets, exact Jaccard
    in map_groups) must produce exactly the rows the naive driver-side
    verify of the same candidate set does."""
    from datax_ray.functions.dedup import (
        _lsh_candidate_pairs,
        ngram_jaccard,
        ngram_jaccard_pairs,
    )

    threshold, k = 0.6, 3
    out = ngram_jaccard_pairs(docs, threshold=threshold, shingle_k=k).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}

    # reference: same candidate generation, naive in-process verify
    cand = _lsh_candidate_pairs(docs, "text", "doc_id", 64, 16, k, 7, 64).take_all()
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ).take_all()
    }
    want = {}
    for r in cand:
        a, b = int(r["doc_a"]), int(r["doc_b"])
        j = ngram_jaccard(texts.get(a) or "", texts.get(b) or "", k=k)
        if j >= threshold:
            want[(a, b)] = j
    assert got == want and len(got) > 0


def test_connected_components_matches_union_find():
    """Distributed min-label CC == sequential union-find on the same edges:
    a path, a triangle merged with a star, singleton-free coverage, and a
    long chain (exercises multi-round propagation past the fused init)."""
    from datax_ray.functions.graph import connected_components

    edges = [
        (1, 2), (2, 3),              # path: {1,2,3}
        (10, 11), (11, 12), (10, 12),  # triangle
        (12, 13),                    # star arm merging into the triangle
        (20, 21),                    # pair
        (30, 31), (31, 32), (32, 33), (33, 34), (34, 35),  # chain, diameter 5
    ]
    pairs = ray.data.from_items([{"doc_a": a, "doc_b": b} for a, b in edges])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, num_buckets=8).take_all()
    }

    # force the distributed label-propagation path (adaptive single-task
    # threshold bypassed) — must agree with the small-graph path
    import datax_ray.functions.graph as graph_mod

    old = graph_mod._SINGLE_TASK_EDGES
    graph_mod._SINGLE_TASK_EDGES = 0
    try:
        got_dist = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs, num_buckets=8).take_all()
        }
    finally:
        graph_mod._SINGLE_TASK_EDGES = old
    assert got_dist == got

    # sequential union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_connected_components_bucket_invariance():
    from datax_ray.functions.graph import connected_components

    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 38)]
    pairs = ray.data.from_items([{"doc_a": a, "doc_b": b} for a, b in edges])
    a = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs, num_buckets=4).take_all()
    )
    b = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs, num_buckets=32).take_all()
    )
    assert a == b


def test_pack_sequences_invariants(docs):
    """Every doc packed exactly once; no bin over budget (except documented
    singleton overflow); bin_fill consistent; deterministic across runs."""
    from datax_ray.functions.packing import pack_sequences
    from datax_ray.functions.text import add_token_count

    counted = docs.map_batches(
        lambda t: add_token_count(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    budget = 64
    rows = pack_sequences(counted, budget=budget, num_buckets=8).take_all()
    n_docs = docs.count()
    assert len(rows) == n_docs
    assert len({r["doc_id"] for r in rows}) == n_docs

    import collections

    fill = collections.defaultdict(int)
    members = collections.defaultdict(list)
    for r in rows:
        fill[r["bin_id"]] += r["n_tokens"]
        members[r["bin_id"]].append(r)
    for b, tot in fill.items():
        assert all(r["bin_fill"] == tot for r in members[b])
        if tot > budget:  # only a singleton oversized doc may overflow
            assert len(members[b]) == 1 and members[b][0]["n_tokens"] > budget

    rows2 = pack_sequences(counted, budget=budget, num_buckets=8).take_all()
    assert sorted((r["doc_id"], r["bin_id"]) for r in rows2) == sorted(
        (r["doc_id"], r["bin_id"]) for r in rows
    )


def test_connected_components_property_random_graphs():
    """Property: on arbitrary random edge lists (self-loops, duplicates,
    multi-component) the distributed CC labels equal sequential union-find."""
    from hypothesis import given, settings, strategies as st

    from datax_ray.functions.graph import connected_components

    @settings(max_examples=8, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 25), st.integers(0, 25)),
            min_size=1,
            max_size=30,
        )
    )
    def check(edges):
        pairs = ray.data.from_items([{"doc_a": a, "doc_b": b} for a, b in edges])
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs, num_buckets=4).take_all()
        }
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in parent}
        assert got == want

    check()


def test_hll_error_bound_vs_exact():
    """HLL estimate within 5% of the exact distinct count (p=12 standard
    error is ~1.6%; 5% is >3 sigma) across two cardinality regimes, incl.
    one small enough to take the linear-counting correction path."""
    from datax_ray.functions.sketch import hll_count_distinct

    rng = np.random.default_rng(11)
    for n_distinct in (300, 20_000):
        vals = rng.choice(
            np.arange(n_distinct, dtype=np.int64), size=3 * n_distinct
        )
        exact = len(np.unique(vals))  # draws may miss some keys
        ds = ray.data.from_arrow(pa.table({"k": vals})).repartition(8)
        est = hll_count_distinct(ds, "k", p=12)["approx_distinct"][0].as_py()
        assert abs(est - exact) / exact < 0.05, (exact, est)


def test_hll_merge_decomposable():
    """Register merge is order/partition independent: 1 block vs 16 blocks
    of the same values give the identical estimate."""
    from datax_ray.functions.sketch import hll_count_distinct

    vals = (np.arange(5000, dtype=np.int64) * 7919) % 4001
    one = ray.data.from_arrow(pa.table({"k": vals})).repartition(1)
    many = ray.data.from_arrow(pa.table({"k": vals})).repartition(16)
    e1 = hll_count_distinct(one, "k")["approx_distinct"][0].as_py()
    e16 = hll_count_distinct(many, "k")["approx_distinct"][0].as_py()
    assert e1 == e16
