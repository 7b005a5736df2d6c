"""Run the reference's own SQLLogicTest files (test/sql/faiss*.test)
through sql/logictest.py — golden distances, error messages, filtered
search, and lifecycle semantics on the reference's verbatim artifacts.

Skipped when the reference checkout is absent (the runner is also
exposed as tools/run_reference_tests.py)."""

import glob
import os

import pytest

REF_SQL = "/root/reference/test/sql"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SQL),
    reason="reference checkout not available")


@pytest.mark.parametrize("path", sorted(glob.glob(f"{REF_SQL}/*.test")),
                         ids=lambda p: os.path.basename(p))
def test_reference_sqllogic_file(path):
    from duckdb_faiss_ext_tpu.sql.logictest import run_file

    results = run_file(path, REF_SQL)
    failures = [(line, kind, fail) for line, kind, fail in results if fail]
    assert not failures, failures
