"""DuckDB bridge (sql/duckdb_bridge.py).

The UDF bodies are pure pyarrow→pyarrow functions, tested directly here
(the environment has no duckdb package; ``register``/``filtered_search``
run end-to-end in the duckdb-gated test below when it is installed)."""

import json

import numpy as np
import pyarrow as pa
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.sql import duckdb_bridge as bridge


def _cleanup(*names):
    for n in names:
        try:
            dfx.faiss_destroy(n)
        except Exception:
            pass


def _list_array(x: np.ndarray) -> pa.Array:
    return pa.array(list(x), pa.list_(pa.float32()))


def test_udf_bodies_end_to_end():
    """create → manual_train → add_with_ids → search through the arrow UDF
    bodies; results must equal the direct API."""
    rng = np.random.default_rng(2)
    xb = rng.standard_normal((500, 16)).astype(np.float32)
    xq = rng.standard_normal((8, 16)).astype(np.float32)
    ids = np.arange(500, dtype=np.int64) * 3
    try:
        assert bridge.udf_create("bq", 16, "IDMap,IVF4,Flat")
        bridge.udf_manual_train(_list_array(xb[:200]),
                                pa.array(["bq"] * 200))
        bridge.udf_add_with_ids(pa.array(ids), _list_array(xb),
                                pa.array(["bq"] * 500))
        out = bridge.udf_search_params(
            pa.array(["bq"] * 8), pa.array([5] * 8), _list_array(xq),
            pa.array([json.dumps({"nprobe": "4"})] * 8))
        assert len(out) == 8
        ref = dfx.faiss_search("bq", 5, xq, {"nprobe": "4"})
        for qi in range(8):
            rows = out[qi].as_py()
            assert [r["label"] for r in rows] == ref["label"][qi].tolist()
            np.testing.assert_allclose(
                [r["distance"] for r in rows], ref["distance"][qi],
                rtol=1e-6)
            assert [r["rank"] for r in rows] == list(range(5))
    finally:
        _cleanup("bq")


def test_udf_unlabeled_add_and_save_load(tmp_path):
    rng = np.random.default_rng(4)
    xb = rng.standard_normal((100, 8)).astype(np.float32)
    try:
        bridge.udf_create("bf", 8, "Flat")
        bridge.udf_add(_list_array(xb), pa.array(["bf"] * 100))
        out = bridge.udf_search(pa.array(["bf"]), pa.array([3]),
                                _list_array(xb[:1]))
        assert out[0].as_py()[0]["label"] == 0         # self-hit
        p = str(tmp_path / "bf.dfx")
        assert bridge.udf_save("bf", p)
        assert bridge.udf_load("bf2", p)
        out2 = bridge.udf_search(pa.array(["bf2"]), pa.array([3]),
                                 _list_array(xb[:1]))
        assert out2[0].as_py() == out[0].as_py()
        assert bridge.udf_destroy("bf2")
    finally:
        _cleanup("bf", "bf2")


def test_udf_create_params_metric():
    try:
        bridge.udf_create_params("bm", 8, "HNSW16,Flat",
                                 json.dumps({"metric_type": "L2",
                                             "efConstruction": "32"}))
        from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG

        idx = GLOBAL_CATALOG.get("bm").index
        assert idx.metric.name == "L2"
    finally:
        _cleanup("bm")


def test_vectors_from_arrow_validation():
    ragged = pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="equal length"):
        bridge._vectors_from_arrow(ragged)
    empty = pa.array([], pa.list_(pa.float32()))
    assert bridge._vectors_from_arrow(empty).shape == (0, 0)
    chunked = pa.chunked_array([_list_array(np.ones((2, 3), np.float32))])
    assert bridge._vectors_from_arrow(chunked).shape == (2, 3)


def test_duckdb_end_to_end():
    """The reference's client pattern through a real duckdb.connect()
    (runs wherever the optional duckdb package is installed)."""
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(6)
    xb = rng.standard_normal((300, 12)).astype(np.float32)
    con = duckdb.connect()
    try:
        dfx.sql.register_duckdb(con)
        con.execute("CREATE TABLE t AS SELECT * FROM (SELECT "
                    "row_number() OVER () - 1 AS id, emb FROM "
                    "(SELECT unnest(?) AS emb))", [list(map(list, xb))])
        assert con.execute(
            "SELECT faiss_create('dk', 12, 'IDMap,Flat')").fetchone()[0]
        con.execute("SELECT faiss_add_with_ids(id, emb, 'dk') FROM t")
        rows = con.execute(
            "SELECT UNNEST(faiss_search('dk', 3, emb)).label FROM t "
            "LIMIT 3").fetchall()
        assert rows[0][0] == 0                         # self-hit
        res = bridge.filtered_search(con, "dk", 3, xb[:4], "id % 2 = 0",
                                     "id", "t")
        assert np.all(res["label"][res["label"] >= 0] % 2 == 0)
    finally:
        _cleanup("dk")
        con.close()
