"""SQL dispatcher: the reference's statement shapes against the engine."""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.sql.dispatch import connect

RNG = np.random.default_rng(77)


@pytest.fixture
def con():
    c = connect(database=dfx.Database())
    xb = RNG.random((1000, 8), dtype=np.float32)
    c.register("input", {"id": np.arange(1, 1001), "data": xb})
    c.register("queries", {"id": np.arange(1, 11),
                           "data": RNG.random((10, 8), dtype=np.float32)})
    return c


def test_readme_workflow(con):
    """The reference README example flow (README.md:55-71)."""
    con.execute("CALL FAISS_CREATE('name', 8, 'IDMap,HNSW32')")
    con.execute("CALL FAISS_ADD((SELECT id, data FROM input), 'name')")
    rows = con.execute(
        "SELECT id, UNNEST(FAISS_SEARCH('name', 10, data)) FROM queries")
    assert len(rows) == 100
    assert set(rows[0]) == {"id", "rank", "label", "distance"}
    rows_f = con.execute(
        "SELECT id, UNNEST(FAISS_SEARCH_FILTER('name', 10, data, "
        "'id%2==0', 'id', 'input')) FROM queries")
    labels = [r["label"] for r in rows_f if r["label"] >= 0]
    assert labels and all(l % 2 == 0 for l in labels)


def test_create_with_metric_and_params(con):
    con.execute("CALL faiss_create('flat8', 8, 'Flat', metric_type='L2')")
    con.execute("CALL faiss_create_params('hnsw16', 8, 'HNSW16', "
                "map{'efConstruction': 32}, metric_type='INNER_PRODUCT')")
    con.execute("CALL faiss_add((SELECT data FROM input), 'flat8')")
    rows = con.execute("SELECT faiss_search('flat8', 2, data) FROM queries")
    assert len(rows) == 10
    assert rows[0]["result"].shape == (2,)


def test_invalid_metric_via_sql(con):
    with pytest.raises(dfx.InvalidInputError,
                       match="Unknown metric type: Invalid"):
        con.execute(
            "CALL faiss_create('flat8', 8, 'Flat', metric_type='Invalid')")


def test_manual_train_and_destroy(con):
    con.execute("CALL faiss_create('mt', 8, 'IVF4,Flat', metric_type='L2')")
    con.execute("CALL faiss_manual_train((SELECT data FROM input), 'mt')")
    con.execute("CALL faiss_add((SELECT data FROM input), 'mt')")
    rows = con.execute("SELECT UNNEST(faiss_search('mt', 3, data, "
                       "map{'nprobe': 4})) FROM queries")
    assert len(rows) == 30
    con.execute("CALL faiss_destroy('mt')")
    with pytest.raises(dfx.InvalidInputError, match="Could not find"):
        con.execute("SELECT faiss_search('mt', 3, data) FROM queries")


def test_save_load_via_sql(con, tmp_path):
    p = str(tmp_path / "i.dfx")
    con.execute("CALL faiss_create('s', 8, 'Flat', metric_type='L2')")
    con.execute("CALL faiss_add((SELECT data FROM input), 's')")
    con.execute(f"CALL faiss_save('s', '{p}')")
    con.execute(f"CALL faiss_load('s2', '{p}')")
    a = con.execute("SELECT faiss_search('s', 2, data) FROM queries")
    b = con.execute("SELECT faiss_search('s2', 2, data) FROM queries")
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(ra["result"]["label"],
                                      rb["result"]["label"])


def test_filter_set_via_sql(con):
    con.execute("CALL faiss_create('fs', 8, 'IDMap,Flat')")
    con.execute("CALL faiss_add((SELECT id, data FROM input), 'fs')")
    rows = con.execute(
        "SELECT UNNEST(faiss_search_filter_set('fs', 5, data, 'id>500', "
        "'id', 'input')) FROM queries")
    labels = [r["label"] for r in rows if r["label"] >= 0]
    assert labels and all(l > 500 for l in labels)


def test_unparseable_statement(con):
    with pytest.raises(dfx.InvalidInputError, match="Cannot parse"):
        con.execute("DROP TABLE input")


def test_literal_query_vector(con):
    con.execute("CALL faiss_create('lit', 8, 'Flat', metric_type='L2')")
    con.execute("CALL faiss_add((SELECT data FROM input), 'lit')")
    rows = con.execute(
        "SELECT UNNEST(faiss_search('lit', 2, "
        "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8])) FROM queries")
    assert len(rows) == 20  # broadcast over the 10 queries-table rows
    assert all(r["label"] >= 0 for r in rows)


def test_create_mask_call(con):
    import numpy as np

    con.execute("CALL faiss_create('cm', 8, 'IDMap,Flat')")
    con.execute("CALL faiss_add((SELECT id, data FROM input), 'cm')")
    con.register("flags", {"flag": (np.arange(1, 1001) % 2 == 0)
                           .astype(np.uint8),
                           "id": np.arange(1, 1001)})
    con.execute(
        "CALL __faiss_create_mask((SELECT flag, id FROM flags), 'even')")
    sel = con.masks["even"]
    import duckdb_faiss_ext_tpu as dfx2
    from duckdb_faiss_ext_tpu import faiss_search

    q = np.random.default_rng(0).random((2, 8), dtype=np.float32)
    res = faiss_search("cm", 5, q, catalog=con.catalog, selector=sel)
    got = res["label"][res["label"] >= 0]
    assert got.size and (got % 2 == 0).all()


def test_sql_range_search(catalog):
    import numpy as np
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.sql.dispatch import connect

    rng = np.random.default_rng(70)
    xb = rng.standard_normal((300, 8)).astype(np.float32)
    con = connect(catalog)
    con.register("docs", {"emb": xb})
    con.execute("CALL faiss_create('rng_idx', 8, 'Flat', metric_type='L2')")
    con.execute("CALL faiss_add((SELECT emb FROM docs), 'rng_idx')")
    con.register("q", {"emb": xb[:3]})
    rows = con.execute(
        "SELECT faiss_range_search('rng_idx', 4.0, emb) FROM q")
    assert rows, "no matches returned"
    oracle = ((xb[:3, None, :] - xb[None, :, :]) ** 2).sum(-1)
    got = {}
    for r in rows:
        got.setdefault(r["query"], set()).add(r["label"])
        assert abs(oracle[r["query"], r["label"]] - r["distance"]) < 1e-3
    for qi in range(3):
        assert got.get(qi, set()) == \
            set(np.nonzero(oracle[qi] < 4.0)[0].tolist())


def test_filter_selector_cache_invalidation(catalog):
    """Selectors are reused across repeated filtered calls (the device
    mask survives), but RE-REGISTERING the table invalidates the cache —
    results must reflect the new table contents immediately."""
    import duckdb_faiss_ext_tpu as dfx

    rng = np.random.default_rng(4)
    xb = rng.standard_normal((500, 8)).astype(np.float32)
    dfx.faiss_create("selc", 8, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "selc", catalog=catalog)
    dfx.register_table("selc_t", {"id": np.arange(500, dtype=np.int64),
                                  "grp": np.zeros(500, np.int64)})
    # grp==0 everywhere: every row passes
    r1 = dfx.faiss_search_filter("selc", 3, xb[:4], "grp=0", "id",
                                 "selc_t", catalog=catalog)
    assert (r1["label"][:, 0] == np.arange(4)).all()
    # same table, same filter: cached selector path (results identical)
    r2 = dfx.faiss_search_filter("selc", 3, xb[:4], "grp=0", "id",
                                 "selc_t", catalog=catalog)
    np.testing.assert_array_equal(r1["label"], r2["label"])
    # re-register with grp flipped for the first 100 ids: rows 0-99 must
    # now be EXCLUDED despite the earlier cache
    grp = np.zeros(500, np.int64)
    grp[:100] = 1
    dfx.register_table("selc_t", {"id": np.arange(500, dtype=np.int64),
                                  "grp": grp})
    r3 = dfx.faiss_search_filter("selc", 3, xb[:4], "grp=0", "id",
                                 "selc_t", catalog=catalog)
    assert (r3["label"] < 100).sum() == 0
    # set-selector flavour sees the new table too
    r4 = dfx.faiss_search_filter_set("selc", 3, xb[:4], "grp=0", "id",
                                     "selc_t", catalog=catalog)
    np.testing.assert_array_equal(r3["label"], r4["label"])
