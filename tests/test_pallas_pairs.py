"""Pair-tile MXU-batched IVF scan vs the per-query DMA kernel (interpret
mode): identical semantics — every (query, list) pair scored once, exact
rerank — so labels must agree with the existing kernel and with brute
force over the decoded corpus."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from duckdb_faiss_ext_tpu.ops.pallas_ivf_pairs import (  # noqa: E402
    QG, build_pair_tiles, pairs_t_max, pallas_ivf_sq_pairs_search)


def test_build_pair_tiles_covers_every_pair():
    rng = np.random.default_rng(0)
    nq, nprobe, nlist = 33, 5, 16
    probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                      for _ in range(nq)]).astype(np.int32)
    t_max = pairs_t_max(nq, nprobe, nlist)
    tl, tq, ps, n_tiles = (np.asarray(a) for a in build_pair_tiles(
        jnp.asarray(probe), nlist=nlist, t_max=t_max))
    # real tiles are exactly the prefix counted by n_tiles
    assert 0 < n_tiles <= t_max
    assert (tq[int(n_tiles):] == -1).all()
    # every pair maps to a unique (tile, slot) holding (its query, list)
    seen = set()
    for q in range(nq):
        for j in range(nprobe):
            s = ps[q, j]
            assert s not in seen
            seen.add(s)
            t, sl = divmod(int(s), QG)
            assert tq[t, sl] == q
            assert tl[t] == probe[q, j]
    # no tile mixes lists; empty slots are -1
    used = np.zeros(t_max, bool)
    used[np.asarray(list(seen)) // QG] = True
    assert (tq[~used] == -1).all()


def _sq_state(xb, nlist, lmax, codec, rng, metric):
    """Quantize xb into a padded (nlist, lmax, w) SQ layout via the
    library's own encode, with round-robin list assignment."""
    from duckdb_faiss_ext_tpu.ops.sq import (SQ_LEVELS, sq4_pack,
                                             sq_code_width, sq_decode,
                                             sq_quantize, sq_row_norms,
                                             sq_row_sums, sq_train)
    n, d = xb.shape
    vmin, scale = sq_train(jnp.asarray(xb), SQ_LEVELS[codec])
    q = np.asarray(sq_quantize(jnp.asarray(xb), vmin, scale,
                               levels=SQ_LEVELS[codec]))
    if codec == "sq4":
        codes = sq4_pack(q)
    elif codec == "sq6":
        from duckdb_faiss_ext_tpu.ops.sq import sq6_pack
        codes = sq6_pack(q)
    else:
        codes = q
    assign = np.arange(n) % nlist
    w = sq_code_width(d, codec)
    lists = np.zeros((nlist, lmax, w), np.uint8)
    row_pos = np.full((nlist, lmax), -1, np.int32)
    counts = np.zeros(nlist, np.int32)
    for i in range(n):
        li = assign[i]
        lists[li, counts[li]] = codes[i]
        row_pos[li, counts[li]] = i
        counts[li] += 1
    dec = np.asarray(sq_decode(jnp.asarray(codes), vmin, scale, codec))
    rn = np.zeros((nlist, lmax), np.float32)
    rs = np.zeros((nlist, lmax), np.float32)
    rn_all = sq_row_norms(codes, np.asarray(scale), d, codec)
    rs_all = sq_row_sums(codes, d, codec)
    for li in range(nlist):
        sel = row_pos[li][row_pos[li] >= 0]
        rn[li, :len(sel)] = rn_all[sel]
        rs[li, :len(sel)] = rs_all[sel]
    if codec == "sq6":
        # plane-major payload, as models/ivf_layout.py builds it
        lists = np.ascontiguousarray(
            lists.reshape(nlist, lmax, w // 3, 3)
            .transpose(0, 3, 1, 2)).reshape(nlist, 3 * lmax, w // 3)
    return (jnp.asarray(lists), jnp.asarray(rn), jnp.asarray(rs),
            jnp.asarray(counts), row_pos, vmin, scale, dec)


@pytest.mark.parametrize("codec", ["sq8", "sq4", "sq6"])
@pytest.mark.parametrize("metric", ["L2", "INNER_PRODUCT"])
def test_pairs_kernel_matches_bruteforce(codec, metric):
    rng = np.random.default_rng(3)
    n, d, nlist, lmax, nprobe, k = 600, 64, 8, 128, 4, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((20, d)).astype(np.float32)
    (lists, rn, rs, counts, row_pos, vmin, scale,
     dec) = _sq_state(xb, nlist, lmax, codec, rng, metric)

    cents = np.stack([xb[np.arange(n) % nlist == li].mean(0)
                      for li in range(nlist)])
    if metric == "INNER_PRODUCT":
        cs = xq @ cents.T
    else:
        cs = -(((xq[:, None] - cents[None]) ** 2).sum(-1))
    probe = np.argsort(-cs, axis=1)[:, :nprobe].astype(np.int32)

    s, p = pallas_ivf_sq_pairs_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric=metric, codec=codec,
        interpret=True)
    s, p = np.asarray(s), np.asarray(p)

    # Oracle: exact metric over the DECODED corpus, restricted to rows
    # whose list is probed (IVF semantics).
    assign = np.arange(n) % nlist
    for qi in range(len(xq)):
        ok = np.isin(assign, probe[qi])
        if metric == "INNER_PRODUCT":
            sc = dec[ok] @ xq[qi]
        else:
            sc = -((dec[ok] - xq[qi]) ** 2).sum(-1)
        rows = np.flatnonzero(ok)
        top = rows[np.argsort(-sc, kind="stable")[:k]]
        got = p[qi][p[qi] >= 0]
        # exact rerank -> same candidate set up to ties
        exp_s = np.sort(sc)[::-1][:k]
        np.testing.assert_allclose(np.sort(s[qi])[::-1], exp_s,
                                   rtol=2e-5, atol=2e-5)
        assert len(set(got) & set(top)) >= k - 1  # ties may swap the tail


@pytest.mark.parametrize("codec", ["sq8"])
def test_pairs_kernel_matches_per_query_kernel(codec):
    from duckdb_faiss_ext_tpu.ops.pallas_ivf import pallas_ivf_sq_search

    rng = np.random.default_rng(7)
    n, d, nlist, lmax, nprobe, k = 512, 32, 8, 128, 4, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((16, d)).astype(np.float32)
    (lists, rn, rs, counts, row_pos, vmin, scale,
     dec) = _sq_state(xb, nlist, lmax, codec, rng, "L2")
    probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                      for _ in range(16)]).astype(np.int32)

    s1, p1 = pallas_ivf_sq_pairs_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric="L2", codec=codec,
        interpret=True)
    s2, p2 = pallas_ivf_sq_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric="L2", codec=codec,
        interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.95  # ties only


def test_pairs_kernel_mask():
    rng = np.random.default_rng(11)
    n, d, nlist, lmax, nprobe, k = 400, 32, 8, 64, 8, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((8, d)).astype(np.float32)
    (lists, rn, rs, counts, row_pos, vmin, scale,
     dec) = _sq_state(xb, nlist, lmax, "sq8", rng, "L2")
    probe = np.tile(np.arange(nlist, dtype=np.int32), (8, 1))
    keep = rng.random(n) < 0.5
    mask = np.zeros((nlist, lmax), np.int8)
    for li in range(nlist):
        sel = row_pos[li][row_pos[li] >= 0]
        mask[li, :len(sel)] = keep[sel]
    s, p = pallas_ivf_sq_pairs_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), jnp.asarray(mask),
        k=k, k_scan=2 * k, nprobe=nlist, metric="L2", codec="sq8",
        interpret=True)
    p = np.asarray(p)
    assert (keep[p[p >= 0]]).all()


def test_pairs_path_end_to_end(catalog=None):
    """Big-batch IVF,SQ8 search goes through the pair-tile kernel
    (PAIRS_MIN_BATCH) and agrees with the XLA gather scan."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    cat = Catalog()
    rng = np.random.default_rng(21)
    n, d, nq, k = 20000, 32, 256, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = xb[:nq] + 0.01 * rng.standard_normal((nq, d)).astype(np.float32)
    dfx.faiss_create("pp", d, "IVF64,SQ8", metric_type="L2", catalog=cat)
    dfx.faiss_add(xb, "pp", catalog=cat)
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    dfx.set_kernel_mode("pallas")
    saved_work = IVFIndex.PAIRS_MIN_WORK
    IVFIndex.PAIRS_MIN_WORK = 0          # tiny test shape: force the path
    try:
        idx = cat.get("pp").index
        assert idx.PAIRS_MIN_BATCH <= nq
        r1 = dfx.faiss_search("pp", k, xq, {"nprobe": "8"}, catalog=cat)
        dfx.set_kernel_mode("xla")
        r2 = dfx.faiss_search("pp", k, xq, {"nprobe": "8"}, catalog=cat)
    finally:
        dfx.set_kernel_mode("auto")
        IVFIndex.PAIRS_MIN_WORK = saved_work
    agree = (r1["label"] == r2["label"]).mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(np.sort(r1["distance"], 1),
                               np.sort(r2["distance"], 1),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("metric", ["L2", "INNER_PRODUCT"])
def test_pairs_flat_kernel_matches_bruteforce(metric):
    from duckdb_faiss_ext_tpu.ops.pallas_ivf_pairs import \
        pallas_ivf_pairs_search

    rng = np.random.default_rng(13)
    n, d, nlist, lmax, nprobe, k = 600, 64, 8, 128, 4, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((20, d)).astype(np.float32)
    assign = np.arange(n) % nlist
    lists = np.zeros((nlist, lmax, d), np.float32)
    row_pos = np.full((nlist, lmax), -1, np.int32)
    counts = np.zeros(nlist, np.int32)
    for i in range(n):
        li = assign[i]
        lists[li, counts[li]] = xb[i]
        row_pos[li, counts[li]] = i
        counts[li] += 1
    probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                      for _ in range(20)]).astype(np.int32)
    s, p = pallas_ivf_pairs_search(
        jnp.asarray(lists), jnp.asarray(counts), jnp.asarray(row_pos),
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric=metric, interpret=True)
    s, p = np.asarray(s), np.asarray(p)
    for qi in range(len(xq)):
        ok = np.isin(assign, probe[qi])
        sc = (xb[ok] @ xq[qi] if metric == "INNER_PRODUCT"
              else -((xb[ok] - xq[qi]) ** 2).sum(-1))
        rows = np.flatnonzero(ok)
        top = set(rows[np.argsort(-sc, kind="stable")[:k]])
        np.testing.assert_allclose(np.sort(s[qi])[::-1],
                                   np.sort(sc)[::-1][:k],
                                   rtol=2e-5, atol=2e-5)
        assert len(set(p[qi][p[qi] >= 0]) & top) >= k - 1


def test_pairs_flat_path_end_to_end():
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    cat = Catalog()
    rng = np.random.default_rng(23)
    n, d, nq, k = 20000, 32, 256, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = xb[:nq]
    dfx.faiss_create("pf", d, "IVF64,Flat", metric_type="L2", catalog=cat)
    dfx.faiss_add(xb, "pf", catalog=cat)
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    dfx.set_kernel_mode("pallas")
    saved_work = IVFIndex.PAIRS_MIN_WORK
    IVFIndex.PAIRS_MIN_WORK = 0
    try:
        r1 = dfx.faiss_search("pf", k, xq, {"nprobe": "8"}, catalog=cat)
        dfx.set_kernel_mode("xla")
        r2 = dfx.faiss_search("pf", k, xq, {"nprobe": "8"}, catalog=cat)
    finally:
        dfx.set_kernel_mode("auto")
        IVFIndex.PAIRS_MIN_WORK = saved_work
    assert (r1["label"] == r2["label"]).mean() > 0.99


def test_pairs_path_large_k_falls_back():
    """k > the kernel's 128-lane candidate budget (TREC runs k=1000)
    must take the per-query path and stay correct."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    cat = Catalog()
    rng = np.random.default_rng(29)
    n, d, nq = 4000, 16, 256
    xb = rng.standard_normal((n, d)).astype(np.float32)
    dfx.faiss_create("plk", d, "IVF16,SQ8", metric_type="L2", catalog=cat)
    dfx.faiss_add(xb, "plk", catalog=cat)
    dfx.set_kernel_mode("pallas")
    try:
        r = dfx.faiss_search("plk", 300, xb[:nq], {"nprobe": "16"},
                             catalog=cat)
    finally:
        dfx.set_kernel_mode("auto")
    assert r["label"].shape == (nq, 300)
    assert (r["label"][:, 0] == np.arange(nq)).all()


def test_pairs_path_with_spill_merge():
    """Capped layout (spill region) + big batch: pair-tile scores must
    merge with the spill scan and stay exact at nprobe=nlist."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    cat = Catalog()
    rng = np.random.default_rng(31)
    n, d, nlist, nq, k = 20000, 24, 16, 256, 10
    # skewed: one hot cluster so a capped lmax forces a real spill
    centers = rng.standard_normal((nlist, d)).astype(np.float32) * 4
    which = np.where(rng.random(n) < 0.5, 0, rng.integers(0, nlist, n))
    xb = (centers[which]
          + rng.standard_normal((n, d)).astype(np.float32))
    dfx.faiss_create("psp", d, f"IVF{nlist},SQ8", metric_type="L2",
                     catalog=cat)
    dfx.faiss_train_device(xb[:8000], "psp", catalog=cat)
    dfx.faiss_add_device(xb, "psp", lmax=1024, catalog=cat)  # big spill
    idx = cat.get("psp").index
    assert idx._dr.spill_n > 1000
    xq = xb[:nq]
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    dfx.set_kernel_mode("pallas")
    saved_work = IVFIndex.PAIRS_MIN_WORK
    IVFIndex.PAIRS_MIN_WORK = 0
    try:
        r = dfx.faiss_search("psp", k, xq, {"nprobe": str(nlist)},
                             catalog=cat)
    finally:
        dfx.set_kernel_mode("auto")
        IVFIndex.PAIRS_MIN_WORK = saved_work
    assert (r["label"][:, 0] == np.arange(nq)).mean() == 1.0


def test_per_query_sq8_kernel_subtiled_lmax():
    """lmax large enough to force sq8 sub-tiling in the per-query kernel
    (the whole-block xor copy OOMed scoped VMEM at lmax 4096 x d 1536;
    interpret-mode shape regression for the sliced branch)."""
    from duckdb_faiss_ext_tpu.ops.pallas_ivf import pallas_ivf_sq_search

    rng = np.random.default_rng(41)
    # lmax * w chosen so (13<<20) - 2*lmax*w < lmax*w -> utile < lmax
    n, d, nlist, lmax, nprobe, k = 4096, 1536, 2, 4096, 2, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((4, d)).astype(np.float32)
    (lists, rn, rs, counts, row_pos, vmin, scale,
     dec) = _sq_state(xb, nlist, lmax, "sq8", rng, "L2")
    probe = np.tile(np.arange(nlist, dtype=np.int32), (4, 1))
    s, p = pallas_ivf_sq_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric="L2", codec="sq8",
        interpret=True)
    p = np.asarray(p)
    assign = np.arange(n) % nlist
    for qi in range(4):
        sc = -((dec - xq[qi]) ** 2).sum(-1)
        top = set(np.argsort(-sc, kind="stable")[:k])
        assert len(set(p[qi][p[qi] >= 0]) & top) >= k - 1


def test_build_sweep_tiles_covers_every_pair():
    from duckdb_faiss_ext_tpu.ops.pallas_ivf_pairs import build_sweep_tiles

    rng = np.random.default_rng(17)
    nq, nprobe, nlist, qcap = 40, 4, 8, 32
    probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                      for _ in range(nq)]).astype(np.int32)
    tq, ps = (np.asarray(a) for a in build_sweep_tiles(
        jnp.asarray(probe), nlist=nlist, qcap=qcap))
    seen = set()
    for q in range(nq):
        for j in range(nprobe):
            s = int(ps[q, j])
            assert s not in seen
            seen.add(s)
            li, sl = divmod(s, qcap)
            assert li == probe[q, j]
            assert tq[li, sl] == q
    used = np.zeros(nlist * qcap, bool)
    used[list(seen)] = True
    assert (tq.reshape(-1)[~used] == -1).all()


@pytest.mark.parametrize("codec", ["sq8", "sq4", "sq6"])
@pytest.mark.parametrize("metric", ["L2", "INNER_PRODUCT"])
def test_sweep_matches_pairs_kernel(codec, metric):
    """The full-corpus static sweep variant (sweep=True) must reproduce
    the pair-tile kernel exactly (same pairs scored, same rerank)."""
    rng = np.random.default_rng(19)
    n, d, nlist, lmax, nprobe, k = 600, 64, 8, 128, 4, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((24, d)).astype(np.float32)
    (lists, rn, rs, counts, row_pos, vmin, scale,
     dec) = _sq_state(xb, nlist, lmax, codec, rng, metric)
    probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                      for _ in range(24)]).astype(np.int32)
    qcap = int(np.bincount(probe.reshape(-1), minlength=nlist).max())
    qcap = max(8, 1 << (qcap - 1).bit_length())

    s1, p1 = pallas_ivf_sq_pairs_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric=metric, codec=codec,
        interpret=True)
    s2, p2 = pallas_ivf_sq_pairs_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), None,
        k=k, k_scan=2 * k, nprobe=nprobe, metric=metric, codec=codec,
        qg=qcap, ways_opt=1, sweep=True, interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-6, atol=1e-6)
    assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.95  # ties only


def test_sweep_with_mask():
    rng = np.random.default_rng(23)
    n, d, nlist, lmax, k = 400, 32, 8, 64, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((8, d)).astype(np.float32)
    (lists, rn, rs, counts, row_pos, vmin, scale,
     dec) = _sq_state(xb, nlist, lmax, "sq8", rng, "L2")
    probe = np.tile(np.arange(nlist, dtype=np.int32), (8, 1))
    keep = rng.random(n) < 0.5
    mask = np.zeros((nlist, lmax), np.int8)
    for li in range(nlist):
        sel = row_pos[li][row_pos[li] >= 0]
        mask[li, :len(sel)] = keep[sel]
    s, p = pallas_ivf_sq_pairs_search(
        lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
        jnp.asarray(probe), jnp.asarray(xq), jnp.asarray(mask),
        k=k, k_scan=2 * k, nprobe=nlist, metric="L2", codec="sq8",
        qg=8, ways_opt=1, sweep=True, interpret=True)
    p = np.asarray(p)
    assert (keep[p[p >= 0]]).all()


@pytest.mark.parametrize("codec", ["sq8", "sq4", "sq6"])
def test_digit_dtype_bf16_matches_int8(codec):
    """bf16-cast digit dots (MXU lowering) return the same final
    results as the s8xs8 dots: int8 values are exact in bf16 and the
    exact fp32 rerank absorbs any fp32-accumulation ulp, so scores and
    positions must match across both kernels."""
    from duckdb_faiss_ext_tpu.ops.pallas_ivf import pallas_ivf_sq_search

    rng = np.random.default_rng(17)
    n, d, nlist, lmax, nprobe, k = 600, 64, 8, 128, 4, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((12, d)).astype(np.float32)
    for metric in ("L2", "INNER_PRODUCT"):
        (lists, rn, rs, counts, row_pos, vmin, scale,
         dec) = _sq_state(xb, nlist, lmax, codec, rng, metric)
        probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                          for _ in range(12)]).astype(np.int32)
        kw = dict(k=k, k_scan=2 * k, nprobe=nprobe, metric=metric,
                  codec=codec, interpret=True)
        for fn in (pallas_ivf_sq_pairs_search, pallas_ivf_sq_search):
            s8, p8 = fn(lists, rn, rs, counts, jnp.asarray(row_pos),
                        vmin, scale, jnp.asarray(probe), jnp.asarray(xq),
                        None, digit_dtype="int8", **kw)
            sb, pb = fn(lists, rn, rs, counts, jnp.asarray(row_pos),
                        vmin, scale, jnp.asarray(probe), jnp.asarray(xq),
                        None, digit_dtype="bf16", **kw)
            np.testing.assert_allclose(np.asarray(s8), np.asarray(sb),
                                       rtol=1e-5, atol=1e-5)
            assert (np.asarray(p8) == np.asarray(pb)).mean() > 0.95


@pytest.mark.parametrize("codec", ["sq8", "sq4", "sq6"])
def test_mega_kernel_matches_standard(codec):
    """The mega-step pairs kernel (hand-rolled DMA, tps tiles per grid
    step — built because the automatic pipeline pays ~12.5 us per grid
    step) returns identical scores/positions to the per-tile-step
    kernel, with and without a selector mask."""
    rng = np.random.default_rng(23)
    n, d, nlist, lmax, nprobe, k = 600, 64, 8, 128, 4, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((20, d)).astype(np.float32)
    for metric in ("L2", "INNER_PRODUCT"):
        (lists, rn, rs, counts, row_pos, vmin, scale,
         dec) = _sq_state(xb, nlist, lmax, codec, rng, metric)
        probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                          for _ in range(20)]).astype(np.int32)
        mask = (rng.random((nlist, lmax)) < 0.7).astype(np.int8)
        kw = dict(k=k, k_scan=2 * k, nprobe=nprobe, metric=metric,
                  codec=codec, interpret=True)
        for m in (None, jnp.asarray(mask)):
            s1, p1 = pallas_ivf_sq_pairs_search(
                lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
                jnp.asarray(probe), jnp.asarray(xq), m, **kw)
            s2, p2 = pallas_ivf_sq_pairs_search(
                lists, rn, rs, counts, jnp.asarray(row_pos), vmin, scale,
                jnp.asarray(probe), jnp.asarray(xq), m, mega=True, **kw)
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                       rtol=1e-5, atol=1e-5)
            assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.95


def test_flat_mega_kernel_matches_standard():
    """Flat-kernel mega-step variant parity (see the SQ mega test)."""
    from duckdb_faiss_ext_tpu.ops.pallas_ivf_pairs import \
        pallas_ivf_pairs_search

    rng = np.random.default_rng(31)
    nlist, lmax, d, nprobe, k = 8, 128, 64, 4, 5
    xb = rng.standard_normal((nlist, lmax, d)).astype(np.float32)
    counts = np.full(nlist, 100, np.int32)
    row_pos = np.arange(nlist * lmax, dtype=np.int32) \
        .reshape(nlist, lmax)
    row_pos[:, 100:] = -1
    xq = rng.standard_normal((20, d)).astype(np.float32)
    probe = np.stack([rng.choice(nlist, nprobe, replace=False)
                      for _ in range(20)]).astype(np.int32)
    mask = (rng.random((nlist, lmax)) < 0.7).astype(np.int8)
    for metric in ("L2", "INNER_PRODUCT"):
        for m in (None, jnp.asarray(mask)):
            kw = dict(k=k, k_scan=2 * k, nprobe=nprobe, metric=metric,
                      interpret=True)
            s1, p1 = pallas_ivf_pairs_search(
                jnp.asarray(xb), jnp.asarray(counts),
                jnp.asarray(row_pos), jnp.asarray(probe),
                jnp.asarray(xq), m, **kw)
            s2, p2 = pallas_ivf_pairs_search(
                jnp.asarray(xb), jnp.asarray(counts),
                jnp.asarray(row_pos), jnp.asarray(probe),
                jnp.asarray(xq), m, mega=True, **kw)
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                       rtol=1e-5, atol=1e-5)
            assert (np.asarray(p1) == np.asarray(p2)).mean() > 0.95


def test_pairs_mega_path_end_to_end(catalog=None):
    """config.pairs_impl='mega' routes big-batch IVF,SQ8 serving through
    the mega-step kernel with identical results to the grid kernel."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex
    from duckdb_faiss_ext_tpu.utils.config import config

    cat = Catalog()
    rng = np.random.default_rng(37)
    n, d, nq, k = 20000, 32, 256, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = xb[:nq] + 0.01 * rng.standard_normal((nq, d)).astype(np.float32)
    dfx.faiss_create("pm", d, "IVF64,SQ8", metric_type="L2", catalog=cat)
    dfx.faiss_add(xb, "pm", catalog=cat)
    dfx.set_kernel_mode("pallas")
    dfx.set_precision("fast")        # int8 pallas plan needs fast mode
    saved_work = IVFIndex.PAIRS_MIN_WORK
    IVFIndex.PAIRS_MIN_WORK = 0
    try:
        idx = cat.get("pm").index
        r1 = dfx.faiss_search("pm", k, xq, {"nprobe": "8"}, catalog=cat)
        assert idx._last_scan_path in ("pairs-sq8", "fused-pairs-sq8")
        config.pairs_impl = "mega"
        r2 = dfx.faiss_search("pm", k, xq, {"nprobe": "8"}, catalog=cat)
        assert idx._last_scan_path in ("pairs-sq8", "fused-pairs-sq8")
    finally:
        config.pairs_impl = "grid"
        dfx.set_kernel_mode("auto")
        dfx.set_precision("parity")
        IVFIndex.PAIRS_MIN_WORK = saved_work
    assert (r1["label"] == r2["label"]).mean() > 0.99
    np.testing.assert_allclose(np.sort(r1["distance"], 1),
                               np.sort(r2["distance"], 1),
                               rtol=1e-5, atol=1e-5)


def test_fused_dispatch_matches_staged(catalog):
    """The single-jit fused serve (coarse+pairs+spill+merge+finalize in
    one XLA program) returns results identical to the staged dispatch —
    same jitted building blocks traced inline."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex
    from duckdb_faiss_ext_tpu.utils.config import config

    rng = np.random.default_rng(23)
    xb = np.concatenate([
        rng.standard_normal((3000, 32)).astype(np.float32),   # skewed list
        rng.standard_normal((2000, 32)).astype(np.float32) + 6.0,
    ])
    xq = xb[rng.integers(0, 5000, 32)] + 0.01
    dfx.faiss_create("fu", 32, "IVF16,SQ8", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "fu", catalog=catalog)
    idx = catalog.get("fu").index
    idx.PALLAS_LAYOUT_BUDGET_BYTES = 16 * 256 * 32  # force spill plan
    idx.SPILL_FRACTION_MAX = 0.9
    idx._pallas_plan_cache = None
    dfx.set_kernel_mode("pallas")
    dfx.set_precision("fast")
    saved_work = IVFIndex.PAIRS_MIN_WORK
    saved_batch = IVFIndex.PAIRS_MIN_BATCH
    IVFIndex.PAIRS_MIN_WORK = 0
    IVFIndex.PAIRS_MIN_BATCH = 8
    try:
        config.fused_dispatch = "off"
        staged = dfx.faiss_search("fu", 5, xq, {"nprobe": "4"},
                                  catalog=catalog)
        assert idx._last_scan_path == "pairs-sq8"
        config.fused_dispatch = "auto"
        fused = dfx.faiss_search("fu", 5, xq, {"nprobe": "4"},
                                 catalog=catalog)
        assert idx._last_scan_path == "fused-pairs-sq8"
    finally:
        config.fused_dispatch = "auto"
        dfx.set_kernel_mode("auto")
        dfx.set_precision("parity")
        IVFIndex.PAIRS_MIN_WORK = saved_work
        IVFIndex.PAIRS_MIN_BATCH = saved_batch
    np.testing.assert_array_equal(staged["label"], fused["label"])
    np.testing.assert_array_equal(staged["distance"], fused["distance"])
