# Build/test/benchmark entry points (the analogue of the reference's
# Makefile targets: release/test/benchmark/run_msmarco_queries).

PYTHON ?= python

.PHONY: all native test test-fast benchmark bench shell clean

all: native

# Native host-side components (bitmap builder + top-k merger).
native:
	$(PYTHON) -c "from duckdb_faiss_ext_tpu.native import load_native; \
	  lib = load_native(); \
	  print('native library:', 'built' if lib else 'UNAVAILABLE (numpy fallback)')"

test:
	$(PYTHON) -m pytest tests/ -q

test-fast:
	$(PYTHON) -m pytest tests/ -q -x

# Headline benchmark (one JSON line on stdout, detail on stderr).
benchmark bench:
	$(PYTHON) bench.py

# Filtered-search strategy benchmark (post/sel/set, binomial k'),
# the analogue of the reference's `make benchmark` Go suite.
benchmark-filtered:
	$(PYTHON) -c "import numpy as np; import duckdb_faiss_ext_tpu as dfx; \
	  from duckdb_faiss_ext_tpu.harness import run_filtered_bench, synthetic_dataset; \
	  xb, xq = synthetic_dataset(n=100_000, d=64, nq=48); \
	  ids = np.arange(xb.shape[0]); \
	  dfx.faiss_create('bench', 64, 'IDMap,Flat', metric_type='L2'); \
	  dfx.faiss_add((ids, xb), 'bench'); \
	  dfx.register_table('t', {'id': ids}); \
	  [print(r) for r in run_filtered_bench('bench', xq, 't', 'id')]"

shell:
	$(PYTHON) -m duckdb_faiss_ext_tpu

clean:
	rm -f duckdb_faiss_ext_tpu/native/_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
