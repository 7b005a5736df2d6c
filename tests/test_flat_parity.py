"""Golden-value parity tests against the reference's SQLLogicTests.

Replicates test/sql/faiss.test (20 golden inner-product distances, 1000×8-dim
corpus, 10 queries, k=2), faiss2.test (IDMap custom labels), and
faiss3.test (rank/label/distance triplets) — the reference's numeric parity
targets (SURVEY.md §4).
"""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx

# test/sql/faiss.test:16-38 — k=2 IP distances per query, rank-major.
GOLDEN_FLAT_DISTANCES = [
    2.3337207, 2.2165565,
    3.5882926, 3.336133,
    4.2489142, 4.133893,
    3.3984408, 3.1702023,
    2.8143706, 2.7383637,
    3.7191334, 3.6072645,
    2.866281, 2.8265002,
    4.5306416, 4.3778625,
    4.809322, 4.7254314,
    5.233301, 5.0149097,
]

# test/sql/faiss3.test:22-45 — (rank, label) per query for k=2.
GOLDEN_LABELS = [
    (374, 59), (374, 676), (768, 880), (374, 623), (374, 623),
    (59, 880), (999, 904), (374, 676), (880, 955), (943, 374),
]

# test/sql/faiss3.test:46-68 — faiss_search_filter with column0>100.
GOLDEN_FILTERED = [
    (374, 2.33372), (676, 2.17094),
    (374, 3.58829), (676, 3.33613),
    (768, 4.24891), (880, 4.13389),
    (374, 3.39844), (623, 3.1702),
    (374, 2.81437), (623, 2.73836),
    (880, 3.60726), (374, 3.60568),
    (999, 2.86628), (904, 2.8265),
    (374, 4.53064), (676, 4.37786),
    (880, 4.80932), (955, 4.72543),
    (943, 5.2333), (374, 5.01491),
]


def test_flat_golden_distances(training_data, query_data, catalog):
    """test/sql/faiss.test: Flat create/add/search, default INNER_PRODUCT."""
    _, xb = training_data
    _, xq = query_data
    dfx.faiss_create("flat8", 8, "Flat", catalog=catalog)
    dfx.faiss_add(xb, "flat8", catalog=catalog)
    res = dfx.faiss_search("flat8", 2, xq, catalog=catalog)
    got = res["distance"].reshape(-1)
    np.testing.assert_allclose(got, GOLDEN_FLAT_DISTANCES, rtol=2e-6)
    dfx.faiss_destroy("flat8", catalog=catalog)


def test_idmap_golden_labels(training_data, query_data, catalog):
    """test/sql/faiss2.test + faiss3.test: IDMap,Flat with custom labels."""
    ids, xb = training_data
    _, xq = query_data
    dfx.faiss_create("flat82", 8, "IDMap,Flat", catalog=catalog)
    dfx.faiss_add((ids, xb), "flat82", catalog=catalog)
    res = dfx.faiss_search("flat82", 2, xq, catalog=catalog)
    assert res.shape == (10, 2)
    for q, (l0, l1) in enumerate(GOLDEN_LABELS):
        assert res["label"][q, 0] == l0
        assert res["label"][q, 1] == l1
        assert res["rank"][q, 0] == 0
        assert res["rank"][q, 1] == 1
    np.testing.assert_allclose(res["distance"].reshape(-1),
                               GOLDEN_FLAT_DISTANCES, rtol=2e-6)


def test_filtered_search_golden(training_data, query_data, catalog):
    """test/sql/faiss3.test:46-68 — faiss_search_filter, column0>100."""
    ids, xb = training_data
    _, xq = query_data
    dfx.faiss_create("flat8f", 8, "IDMap,Flat", catalog=catalog)
    dfx.faiss_add((ids, xb), "flat8f", catalog=catalog)

    db = dfx.Database()
    db.register("training", {"column0": ids})
    res = dfx.faiss_search_filter("flat8f", 2, xq, "column0>100", "column0",
                                  "training", catalog=catalog, database=db)
    flat = [(int(l), float(d)) for l, d in
            zip(res["label"].reshape(-1), res["distance"].reshape(-1))]
    for (gl, gd), (l, d) in zip(GOLDEN_FILTERED, flat):
        assert l == gl
        np.testing.assert_allclose(d, gd, rtol=1e-4)


def test_filtered_search_set_matches_bitmap(training_data, query_data, catalog):
    """search_filter_set must agree with search_filter on the same predicate."""
    ids, xb = training_data
    _, xq = query_data
    dfx.faiss_create("flat8s", 8, "IDMap,Flat", catalog=catalog)
    dfx.faiss_add((ids, xb), "flat8s", catalog=catalog)
    db = dfx.Database()
    db.register("training", {"column0": ids})
    a = dfx.faiss_search_filter("flat8s", 5, xq, "column0>100", "column0",
                                "training", catalog=catalog, database=db)
    b = dfx.faiss_search_filter_set("flat8s", 5, xq, "column0>100", "column0",
                                    "training", catalog=catalog, database=db)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["distance"], b["distance"], rtol=1e-6)


def test_destroy_recreate(catalog):
    """test/sql/faiss5.test: destroy then recreate the same name."""
    dfx.faiss_create("demo", 8, "IDMap,Flat", catalog=catalog)
    dfx.faiss_destroy("demo", catalog=catalog)
    dfx.faiss_create("demo", 8, "IDMap,Flat", catalog=catalog)


def test_duplicate_create_errors(catalog):
    dfx.faiss_create("dup", 4, "Flat", catalog=catalog)
    with pytest.raises(dfx.InvalidInputError, match="already exists"):
        dfx.faiss_create("dup", 4, "Flat", catalog=catalog)


def test_add_with_ids_on_plain_flat_errors(training_data, catalog):
    """test/sql/faiss4.test:19-25 — exact reference error message."""
    ids, xb = training_data
    dfx.faiss_create("flat8", 8, "Flat", catalog=catalog)
    with pytest.raises(dfx.InvalidInputError) as exc:
        dfx.faiss_add((ids, xb), "flat8", catalog=catalog)
    assert str(exc.value) == (
        "Unable to add data: This type of index does not support adding with "
        "IDs. Consider prefixing the index string with IDMap when creating "
        "the index.")
    # 1-column add still works afterwards.
    dfx.faiss_add(xb, "flat8", catalog=catalog)


def test_invalid_metric_errors(catalog):
    """test/sql/faiss6.test:7-10 — exact reference error message."""
    with pytest.raises(dfx.InvalidInputError) as exc:
        dfx.faiss_create("flat8", 8, "Flat", metric_type="Invalid",
                         catalog=catalog)
    assert str(exc.value) == "Unknown metric type: Invalid"
    dfx.faiss_create("flat8", 8, "Flat", metric_type="L2", catalog=catalog)


def test_label_mixing_latch(training_data, catalog):
    ids, xb = training_data
    dfx.faiss_create("mix", 8, "IDMap,Flat", catalog=catalog)
    dfx.faiss_add((ids, xb), "mix", catalog=catalog)
    with pytest.raises(dfx.InvalidInputError, match="Cannot mix"):
        dfx.faiss_add(xb, "mix", catalog=catalog)


def test_small_dataset_filter(catalog):
    """test/sql/faiss7.test: dim-2 IDMap,Flat single row, filter over a table
    whose ids don't align with the corpus."""
    dfx.faiss_create("demo_index", 2, "IDMap,Flat", catalog=catalog)
    dfx.faiss_add((np.array([231]), np.array([[0.0040321066, 0.023423655]],
                                             np.float32)),
                  "demo_index", catalog=catalog)
    db = dfx.Database()
    db.register("demo_table", {"id": np.array([231], np.int64)})
    res = dfx.faiss_search_filter(
        "demo_index", 2, np.array([[-0.04529257, 0.024853613]], np.float32),
        "id%2==0", "id", "demo_table", catalog=catalog, database=db)
    assert res.shape == (1, 2)
    # 231 is odd → filtered out → no results.
    assert (res["label"] == -1).all()


def test_batched_search_matches_sequential(training_data, query_data, catalog):
    _, xb = training_data
    _, xq = query_data
    dfx.faiss_create("batched", 8, "Flat", catalog=catalog)
    dfx.faiss_add(xb, "batched", catalog=catalog)
    a = dfx.faiss_search("batched", 2, xq, catalog=catalog)
    b = dfx.faiss_search_batched("batched", 2, xq, batch_size=3,
                                 catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["distance"], b["distance"], rtol=1e-6)


def test_batched_search_k_exceeds_corpus(catalog):
    """The single-fetch batched path pads k_eff<k slots like sync search."""
    xb = np.arange(12, dtype=np.float32).reshape(3, 4) / 10
    dfx.faiss_create("bk", 4, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "bk", catalog=catalog)
    xq = np.tile(xb, (3, 1))
    a = dfx.faiss_search("bk", 7, xq, catalog=catalog)
    b = dfx.faiss_search_batched("bk", 7, xq, batch_size=2, catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["distance"], b["distance"])
    assert (b["label"][:, 3:] == -1).all()


def test_batched_search_with_selector(catalog):
    rng = np.random.default_rng(3)
    xb = rng.standard_normal((200, 8)).astype(np.float32)
    dfx.faiss_create("bsel", 8, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "bsel", catalog=catalog)
    sel = dfx.SetSelector(np.arange(0, 200, 2, dtype=np.int64))
    a = dfx.faiss_search("bsel", 5, xb[:10], catalog=catalog, selector=sel)
    b = dfx.faiss_search_batched("bsel", 5, xb[:10], batch_size=4,
                                 catalog=catalog, selector=sel)
    np.testing.assert_array_equal(a["label"], b["label"])
    assert np.all(b["label"] % 2 == 0)


def test_batched_search_idmap_fast_path(catalog):
    """IDMap,Flat rides the single-fetch batched path with label remap and
    selector translation."""
    rng = np.random.default_rng(4)
    xb = rng.standard_normal((300, 8)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64) * 7 + 2
    dfx.faiss_create("bid", 8, "IDMap,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add((ids, xb), "bid", catalog=catalog)
    a = dfx.faiss_search("bid", 4, xb[:10], catalog=catalog)
    b = dfx.faiss_search_batched("bid", 4, xb[:10], batch_size=3,
                                 catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])
    assert np.all(b["label"] % 7 == 2)
    sel = dfx.SetSelector(ids[::2])
    c = dfx.faiss_search_batched("bid", 4, xb[:10], batch_size=3,
                                 catalog=catalog, selector=sel)
    d = dfx.faiss_search("bid", 4, xb[:10], catalog=catalog, selector=sel)
    np.testing.assert_array_equal(c["label"], d["label"])


def test_batched_search_idmap_ivf(catalog):
    """IDMap over IVF rides the single-fetch path (IVF dispatch + label
    composition) with results identical to sequential searches."""
    rng = np.random.default_rng(5)
    xb = rng.standard_normal((500, 8)).astype(np.float32)
    ids = np.arange(500, dtype=np.int64) + 9
    dfx.faiss_create("biv", 8, "IDMap,IVF4,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add((ids, xb), "biv", catalog=catalog)
    a = dfx.faiss_search("biv", 4, xb[:6], {"nprobe": "4"}, catalog=catalog)
    b = dfx.faiss_search_batched("biv", 4, xb[:6], {"nprobe": "4"},
                                 batch_size=2, catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])


def test_batched_search_pq_sq_pretransform(catalog):
    """PQ / SQ / PreTransform families ride the single-fetch batched path
    with results identical to sequential searches."""
    rng = np.random.default_rng(6)
    xb = rng.standard_normal((600, 16)).astype(np.float32)
    for name, desc in (("bpq", "PQ4"), ("bsq", "SQ8"),
                       ("bpt", "PCA8,Flat"), ("bl2", "L2norm,SQ8")):
        dfx.faiss_create(name, 16, desc, metric_type="L2", catalog=catalog)
        dfx.faiss_add(xb, name, catalog=catalog)
        a = dfx.faiss_search(name, 4, xb[:10], catalog=catalog)
        b = dfx.faiss_search_batched(name, 4, xb[:10], batch_size=3,
                                     catalog=catalog)
        np.testing.assert_array_equal(a["label"], b["label"], err_msg=desc)
        np.testing.assert_allclose(a["distance"], b["distance"],
                                   err_msg=desc)
