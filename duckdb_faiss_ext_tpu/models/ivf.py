"""IVF index: k-means-trained inverted lists with a gathered TPU scan.

Equivalent of faiss::IndexIVF(+Flat storage) as the reference exercises it:
``IVFn[,Flat]`` and ``IVFn_HNSWm,Flat`` factory strings, deferred training
through faiss_add, nprobe + ``quantiser.``-prefixed search params
(src/faiss_extension.cpp:675-689), and native add_with_ids (ids stored in
the inverted lists, no IDMap needed — test
faiss_add_ids_with_train copy.test uses IDMap,IVF1,Flat but FAISS IVF also
accepts ids directly).

Storage layout (rebuilt lazily per mutation):
* host: vectors + ids in insertion order, plus per-row list assignments;
* device: rows sorted by list (one contiguous buffer → coalesced gathers),
  (offsets, counts) list metadata for contiguous block slicing, centroids.

The coarse quantizer index object (``quantizer``) mirrors FAISS's graph shape
(it answers ``quantiser.``-scoped params and holds the centroids for
save/load); assignment itself runs as one fused distance tile, not through
the quantizer's own search path.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import errors
from ..metrics import Metric
from ..ops.flat_search import SIMILARITY_METRICS, finalize_scores
from ..ops.ivf_scan import choose_q_chunk, ivf_pq_search, ivf_search
from ..ops.pallas_ivf import choose_lmax, pallas_ivf_search
from ..utils.config import on_tpu
from ..ops.kmeans import (DEFAULT_NITER, DEFAULT_SEED, kmeans_fit,
                          subsample_for_training)
from ..params import EMPTY
from ..utils.config import (config, next_capacity, next_pow2,
                            pad_rows)
from .base import Index, SearchResult, as_matrix
from .base import dedup_by_key as _dedup_by_key


from ..ops.sq import FLOAT_CODECS as _FLOAT_SQ
from ..ops.sq import float_codec_dtype as _sq_float_dtype


class IVFIndex(Index):
    def __init__(self, d: int, metric: Metric, metric_arg: float,
                 nlist: int, quantizer: Index, encoding: str = "Flat"):
        super().__init__(d, metric, metric_arg)
        self.pq_m = self.pq_nbits = None
        self.pq_codec = "pq"              # "pq" | "rq" (additive residual)
        self.sq_type: str | None = None   # "sq8"|"sq4"|"sq6"|"fp16"
        if encoding != "Flat":
            import re

            m = re.match(r"^PQ(\d+)(?:x(\d+))?$", encoding)
            mrq = re.match(r"^RQ(\d+)x(\d+)$", encoding)
            if m:
                self.pq_m = int(m.group(1))
                self.pq_nbits = int(m.group(2)) if m.group(2) else 8
                if d % self.pq_m != 0:
                    raise errors.InvalidInputError(
                        f"The dimension of the vector ({d}) must be a "
                        f"multiple of the number of subquantizers "
                        f"({self.pq_m})")
            elif mrq:
                # faiss IndexIVFResidualQuantizer: additive full-dim stage
                # codebooks on the residuals (same storage shape as IVFPQ,
                # different decoder — ops/rq.py).
                self.pq_m = int(mrq.group(1))
                self.pq_nbits = int(mrq.group(2))
                self.pq_codec = "rq"
                if not 1 <= self.pq_nbits <= 8:
                    # uint8 code storage; >8 bits would wrap mod 256.
                    raise errors.InvalidInputError(
                        f"RQ supports 1-8 bits per stage (uint8 code "
                        f"storage), got {self.pq_nbits}")
            elif encoding in ("SQ8", "SQ4", "SQ6", "SQfp16", "SQbf16"):
                # faiss IndexIVFScalarQuantizer (by_residual=false, the
                # index_factory default): raw rows SQ-encoded per list.
                self.sq_type = (encoding[2:]
                                if encoding in ("SQfp16", "SQbf16")
                                else encoding.lower())
            else:
                raise errors.InvalidInputError(
                    f"IVF encoding {encoding} is not supported (use Flat, "
                    f"PQm, RQMxb, SQ8, SQ4, SQ6, SQfp16 or SQbf16)")
            if metric.name not in ("L2", "INNER_PRODUCT"):
                raise errors.InvalidInputError(
                    f"{encoding} indexes support only L2 and INNER_PRODUCT "
                    f"metrics, got {metric.name}")
        self._pq_codebooks: np.ndarray | None = None  # (m, ksub, dsub)
        self._sq_vmin: np.ndarray | None = None
        self._sq_scale: np.ndarray | None = None
        if self.pq_m:
            self._codes = np.empty((0, self.pq_m), dtype=np.uint8)
        elif self.sq_type in _FLOAT_SQ:
            self._codes = np.empty((0, d), dtype=_sq_float_dtype(self.sq_type))
        elif self.sq_type:
            from ..ops.sq import sq_code_width

            self._codes = np.empty((0, sq_code_width(d, self.sq_type)),
                                   dtype=np.uint8)
        else:
            self._codes = None
        self.nlist = int(nlist)
        self.quantizer = quantizer
        self.encoding = encoding
        self.nprobe_default = 1  # faiss::IndexIVF::nprobe default
        self.train_seed = DEFAULT_SEED
        self.train_niter = DEFAULT_NITER
        self.train_balance = 0.0
        self._centroids: np.ndarray | None = None
        #: SOAR bookkeeping (None when SOAR is off): storage row → logical
        #: datapoint, and logical position → original storage row.
        self._srcrow: np.ndarray | None = None
        self._logical_rows: np.ndarray | None = None
        self._xb = np.empty((0, d), dtype=np.float32)
        self._ids = np.empty((0,), dtype=np.int64)
        self._assign = np.empty((0,), dtype=np.int32)
        self._version = 0
        self._dr = None          # device-resident state (models/ivf_device)
        self._device = None      # (xb_sorted, lmax, centroids, order)
        self._device_pallas = None   # (xb_lists, counts, row_pos)
        self._ids_sorted = None      # (order, ids[order]) — see _sorted_ids
        self._mask_cache: dict = {}

    # --- lifecycle -------------------------------------------------------
    @property
    def ntotal(self) -> int:
        """Logical datapoint count (user view).  With SOAR every datapoint
        occupies two storage rows (_nstored == 2 * ntotal)."""
        n = self._ids.shape[0]
        return n // 2 if getattr(self, "soar_lambda", 0.0) > 0.0 else n

    @property
    def _nstored(self) -> int:
        """Storage rows (inverted-list entries); kernels/masks/layouts use
        this, the public count is ``ntotal``."""
        return self._ids.shape[0]

    @property
    def is_trained(self) -> bool:
        if self._centroids is None:
            return False
        if self.pq_m is not None:
            return self._pq_codebooks is not None
        if self.sq_type is not None and self.sq_type not in _FLOAT_SQ:
            return self._sq_vmin is not None
        return True

    @property
    def requires_training(self) -> bool:
        return True

    def train(self, x) -> None:
        if self.is_trained:
            return  # FAISS skips retraining a trained quantizer
        x = as_matrix(x, self.d)
        self._centroids, x = self._train_coarse(x)
        self._populate_quantizer()
        if self.pq_m is not None:
            # Residual PQ (faiss IndexIVFPQ by_residual): codebooks trained
            # on x − centroid[assign(x)].
            from ..ops.pq import codec_train

            ksub = 1 << self.pq_nbits
            if x.shape[0] < ksub:
                self._centroids = None
                raise errors.TrainingTooSmallError(x.shape[0], ksub)
            assign = self._assign_lists(x)
            resid = x - self._centroids[assign]
            eta = getattr(self, "aniso_eta", 1.0)
            if eta > 1.0:
                from ..ops.pq import pq_train_anisotropic

                cb = pq_train_anisotropic(resid, self.pq_m, ksub, eta,
                                          seed=self.train_seed,
                                          precision=config.precision,
                                          dirs=x)
            else:
                cb = codec_train(resid, self.pq_m, ksub, self.pq_codec,
                                 seed=self.train_seed,
                                 precision=config.precision)
            self._pq_codebooks = np.asarray(cb, dtype=np.float32)
        if self.sq_type is not None and self.sq_type not in _FLOAT_SQ:
            from ..ops.sq import SQ_LEVELS, sq_train

            vmin, scale = sq_train(x, SQ_LEVELS[self.sq_type])
            self._sq_vmin = np.asarray(vmin)
            self._sq_scale = np.asarray(scale)
        self._invalidate()

    #: IMIIndex sets this False — its mirror quantizer is never consulted
    #: and copying the materialized cell table into it would double memory.
    _mirror_quantizer = True

    def _populate_quantizer(self) -> None:
        """Mirror the centroid table into the quantizer index object
        (faiss graph shape; used again after load_state rebuilds the
        quantizer untrained).  A quantizer that itself needs training
        (nested IVF, e.g. ``IVF1024(IVF32,Flat)``) is trained on the
        centroid table first, mirroring faiss Level1Quantizer::train_q1."""
        if not self._mirror_quantizer or self.quantizer.ntotal != 0:
            return
        if not self.quantizer.is_trained:
            self.quantizer.train(self._centroids)
        self.quantizer.add(self._centroids)

    def _subsample_train(self, x, k: int):
        """Too-few-points check + FAISS's seeded per-centroid subsample,
        for a coarse stage with ``k`` centroids."""
        n = x.shape[0]
        if n < k:
            raise errors.TrainingTooSmallError(n, k)
        nsub = subsample_for_training(n, k)
        if nsub < n:
            rng = np.random.default_rng(self.train_seed)
            sel = rng.choice(n, size=nsub, replace=False)
            x = x[np.sort(sel)]
        return x

    def _train_coarse(self, x):
        """Fit the coarse quantizer; returns (centroid table (nlist, d),
        training subsample for the encoding stages).  IMIIndex overrides
        this with the product (multi-index) quantizer."""
        x = self._subsample_train(x, self.nlist)
        # Training and assignment always run at full precision: with many
        # lists the distance differences between competing centroids fall
        # below bf16 resolution and assignment collapses into a few giant
        # lists (observed at nlist=16k on 96-d data — the padded layout then
        # explodes).  Search-time coarse probing keeps config precision.
        import jax as _jax

        centroids, _ = kmeans_fit(x, self.nlist, niter=self.train_niter,
                                  seed=self.train_seed,
                                  precision=_jax.lax.Precision.HIGHEST,
                                  balance=getattr(self, "train_balance", 0.0))
        return np.asarray(centroids, dtype=np.float32), x

    def _require_trained(self):
        if not self.is_trained:
            raise errors.InvalidInputError(
                "Index is not trained; call train (or faiss_manual_train) "
                "before adding or searching")

    # --- ingest ----------------------------------------------------------
    def add(self, x) -> None:
        x = as_matrix(x, self.d)
        start = self.ntotal
        self.add_with_ids(
            x, np.arange(start, start + x.shape[0], dtype=np.int64))

    def add_with_ids(self, x, ids) -> None:
        self._require_trained()
        if self._dr is not None:
            raise errors.InvalidInputError(
                "host-path adds cannot be mixed with device-resident "
                "ingest on the same index (use add_device)")
        x = as_matrix(x, self.d)
        ids = np.asarray(ids, dtype=np.int64).reshape(-1)
        if ids.shape[0] != x.shape[0]:
            raise errors.add_error(
                f"number of ids ({ids.shape[0]}) does not match number of "
                f"vectors ({x.shape[0]})")
        if x.shape[0] == 0:
            return
        assign = self._assign_lists(x)
        if getattr(self, "soar_lambda", 0.0) > 0.0:
            # SOAR (Sun et al., 2023): every vector also joins a SECOND
            # list chosen so its residual there is near-orthogonal to the
            # primary residual — when the primary list is mis-ranked by
            # query-residual alignment, the spilled copy is likely probed.
            # Materialized as duplicated rows, so every layout / shard /
            # spill / codec path works unchanged; search fetches 2k and
            # dedups by SOURCE row (see search_dispatch).  Bookkeeping:
            # _srcrow maps every storage row to its logical datapoint,
            # _logical_rows maps logical position -> original storage row.
            assign2 = self._assign_soar(x, assign)
            nb = x.shape[0]
            start_store = self._nstored
            start_logical = self.ntotal
            logical = np.arange(start_logical, start_logical + nb,
                                dtype=np.int64)
            if self._srcrow is None:
                self._srcrow = np.empty((0,), np.int64)
                self._logical_rows = np.empty((0,), np.int64)
            self._srcrow = np.concatenate(
                [self._srcrow, logical, logical])
            self._logical_rows = np.concatenate(
                [self._logical_rows,
                 np.arange(start_store, start_store + nb, dtype=np.int64)])
            x = np.concatenate([x, x], axis=0)
            ids = np.concatenate([ids, ids])
            assign = np.concatenate([assign, assign2])
        if self.pq_m is not None:
            # Store byte codes only (FAISS IVFPQ memory profile).
            from ..ops.pq import codec_encode

            resid = x - self._centroids[assign]
            eta = getattr(self, "aniso_eta", 1.0)
            if eta > 1.0:
                from ..ops.pq import pq_encode_anisotropic

                codes = np.asarray(pq_encode_anisotropic(
                    jnp.asarray(resid), jnp.asarray(self._pq_codebooks),
                    jnp.float32(eta), precision=config.precision,
                    dirs=jnp.asarray(x)))
            else:
                codes = np.asarray(codec_encode(
                    jnp.asarray(resid), jnp.asarray(self._pq_codebooks),
                    self.pq_codec, precision=config.precision,
                    beam=getattr(self, "rq_beam", None)))
            self._codes = np.concatenate([self._codes, codes], axis=0)
        elif self.sq_type is not None:
            self._codes = np.concatenate(
                [self._codes, self._sq_encode(x)], axis=0)
        else:
            self._xb = np.concatenate([self._xb, x], axis=0)
        self._ids = np.concatenate([self._ids, ids])
        self._assign = np.concatenate([self._assign, assign])
        self._invalidate()

    def reconstruct(self, key: int) -> np.ndarray:
        """Stored vector by position (decodes PQ/SQ storage; feeds IDMap2
        reconstruct-by-label through the composite graph)."""
        key = int(key)
        if key < 0 or key >= self.ntotal:
            raise errors.InvalidInputError(
                f"Position {key} is out of range (ntotal={self.ntotal})")
        if self._dr is not None:
            return self._dr_reconstruct(key)
        if self._logical_rows is not None:
            # SOAR: logical positions indirect to the original storage row.
            key = int(self._logical_rows[key])
        if self.pq_m is not None:
            from ..ops.pq import codec_decode

            resid = np.asarray(codec_decode(
                jnp.asarray(self._codes[key:key + 1]),
                jnp.asarray(self._pq_codebooks), self.pq_codec))[0]
            return resid + self._centroids[self._assign[key]]
        if self.sq_type is not None:
            from ..ops.sq import sq_decode

            vmin, scale = self._sq_ranges()
            return np.asarray(sq_decode(
                jnp.asarray(self._codes[key:key + 1]), vmin, scale,
                self.sq_type))[0]
        return self._xb[key]

    def _sq_encode(self, x: np.ndarray) -> np.ndarray:
        from ..ops.sq import SQ_LEVELS, sq4_pack, sq6_pack, sq_quantize

        if self.sq_type in _FLOAT_SQ:
            return x.astype(_sq_float_dtype(self.sq_type))
        q = np.asarray(sq_quantize(jnp.asarray(x),
                                   jnp.asarray(self._sq_vmin),
                                   jnp.asarray(self._sq_scale),
                                   levels=SQ_LEVELS[self.sq_type]))
        if self.sq_type == "sq4":
            return sq4_pack(q)
        if self.sq_type == "sq6":
            return sq6_pack(q)
        return q

    def _sq_ranges(self):
        if self.sq_type in _FLOAT_SQ or self._sq_vmin is None:
            z = np.zeros((self.d,), np.float32)
            return jnp.asarray(z), jnp.asarray(z)
        return jnp.asarray(self._sq_vmin), jnp.asarray(self._sq_scale)

    def _sq_codes_dev(self):
        """Device upload of the sorted uint8 SQ codes for the decode path,
        cached per version (the int8 path never touches it)."""
        cached = getattr(self, "_sq_dev_cache", None)
        if cached is not None and cached[0] == self._version:
            return cached[1]
        storage, _, _, _ = self._build_device()
        dev = jnp.asarray(storage[0])
        self._sq_dev_cache = (self._version, dev)
        return dev

    def _ivf_sq_row_norm(self):
        """Per-sorted-row Σ(scale·c)² fp32 (cap,) for the int8 IVF scan
        (ops/ivf_scan.py::ivf_sq_int8_search), which reads the SAME packed
        device code buffer as the decode path — this is its only extra
        state.  Cached per version, aligned with _build_device's order."""
        cached = getattr(self, "_int8_cache", None)
        if cached is not None and cached[0] == self._version:
            return cached[1]
        from ..ops.sq import sq_row_norms

        storage, _, _, order = self._build_device()
        cap = storage[0].shape[0]
        n = self._nstored
        codes = self._codes[order] if n else self._codes   # (n, w) packed
        rn = sq_row_norms(codes, self._sq_scale, self.d, self.sq_type)
        state = jnp.asarray(pad_rows(rn, cap))
        self._int8_cache = (self._version, state)
        return state

    def _assign_lists(self, x: np.ndarray) -> np.ndarray:
        """Coarse assignment of new vectors (best list by the index metric).

        All chunk dispatches are issued asynchronously and fetched with ONE
        host transfer at the end — per-chunk fetches serialize on the host
        round-trip and made 10M-row ingest latency-bound."""
        from ..ops.distance import pairwise_tile

        sim = self.metric.name in SIMILARITY_METRICS
        cents = jnp.asarray(self._centroids)
        # Bound the transient (chunk × nlist) score tile to ~512 MB.
        chunk = max(1024, min(65536, (1 << 27) // max(self.nlist, 1)))
        parts = []
        import jax as _jax

        for i in range(0, x.shape[0], chunk):
            # Full precision: assignment consistency with training matters
            # more than ingest speed (see train()).
            tile = pairwise_tile(jnp.asarray(x[i:i + chunk]), cents,
                                 self.metric.name, self.metric_arg,
                                 _jax.lax.Precision.HIGHEST)
            best = jnp.argmax(tile, 1) if sim else jnp.argmin(tile, 1)
            parts.append(best.astype(jnp.int32))
        if not parts:
            return np.empty((0,), dtype=np.int32)
        return np.asarray(jnp.concatenate(parts), dtype=np.int32)

    def _assign_soar(self, x: np.ndarray, assign: np.ndarray) -> np.ndarray:
        """Secondary SOAR assignment: argmin over lists l != primary of
        ||x - c_l||^2 + lambda * ((x - c_l) · r1_hat)^2, where r1 is the
        primary residual — spills each point toward a list whose residual
        is orthogonal to the primary one.  L2 geometry (SOAR's derivation);
        one extra matmul per chunk on top of the plain assignment tile."""
        import jax as _jax

        lam = jnp.float32(self.soar_lambda)
        cents = jnp.asarray(self._centroids)
        hp = _jax.lax.Precision.HIGHEST
        chunk = max(1024, min(65536, (1 << 27) // max(self.nlist, 1)))
        parts = []
        for i in range(0, x.shape[0], chunk):
            xc = jnp.asarray(x[i:i + chunk])
            a1 = jnp.asarray(assign[i:i + chunk])
            r1 = xc - cents[a1]
            r1h = r1 / jnp.sqrt(jnp.maximum(
                jnp.sum(r1 * r1, 1, keepdims=True), 1e-20))
            xn = jnp.sum(xc * xc, 1, keepdims=True)
            cn = jnp.sum(cents * cents, 1)[None, :]
            xdc = jnp.dot(xc, cents.T, precision=hp,
                          preferred_element_type=jnp.float32)
            sqdist = xn - 2.0 * xdc + cn
            # (x - c_l)·r1_hat = x·r1_hat − c_l·r1_hat
            proj = (jnp.sum(xc * r1h, 1, keepdims=True)
                    - jnp.dot(r1h, cents.T, precision=hp,
                              preferred_element_type=jnp.float32))
            cost = sqdist + lam * proj * proj
            # Exclude the primary list.
            rows = jnp.arange(a1.shape[0])
            cost = cost.at[rows, a1].set(jnp.inf)
            parts.append(jnp.argmin(cost, 1).astype(jnp.int32))
        if not parts:
            return np.empty((0,), dtype=np.int32)
        return np.asarray(jnp.concatenate(parts), dtype=np.int32)

    def _invalidate(self):
        self._version += 1
        self._device = None
        self._device_pallas = None
        self._device_spill = None
        self._ids_sorted = None
        self._srcrow_sorted = None
        self._sq_dev_cache = None
        self._int8_cache = None
        self._mask_cache.clear()

    # --- Pallas list-scan layout (padded 3-D lists) ------------------------
    #: HBM budget for the padded (nlist, lmax, d) list layout; beyond this
    #: the pad-to-max waste is not worth the DMA-friendly shape and the
    #: sorted+gather layout is used instead (raw-sized + an int32 table).
    #: Measured at 10M×96/nlist=4096: the full padded layout is 6.4 GB
    #: (pad ratio 1.68× raw) and fits v5e's 16 GB HBM with ample headroom,
    #: taking b48 search from 120 qps (sorted+gather) to the DMA kernel
    #: path.  2 GB (the old budget) silently forced gather at exactly the
    #: scale the kernel matters.
    PALLAS_LAYOUT_BUDGET_BYTES = 7 << 30

    #: scalar-prefetch budget for the probe table (SMEM is 1 MB/core; leave
    #: headroom for the grid scalars).
    PALLAS_SMEM_PROBE_INTS = 96 * 1024

    #: spill-region cap: beyond this fraction of rows overflowing the capped
    #: layout, the dense spill scan would dominate and the sorted+gather
    #: layout wins instead.  20% of the corpus as one dense MXU tile costs
    #: about a fifth of a flat scan — still far cheaper than the gather
    #: path it replaces.
    SPILL_FRACTION_MAX = 0.2

    def _counts(self) -> np.ndarray:
        cache = getattr(self, "_counts_cache", None)
        if cache is not None and cache[0] == self._version:
            return cache[1]
        c = (np.bincount(self._assign, minlength=self.nlist)
             if self.ntotal else np.zeros((self.nlist,), np.int64))
        self._counts_cache = (self._version, c)
        return c

    def _counts_max(self) -> int:
        return int(self._counts().max()) if self.ntotal else 1

    def _pallas_plan(self):
        """Layout plan for the Pallas list-scan kernel:
        None           — pallas unusable (metric/mode/memory);
        ("full", None) — padded (nlist, lmax, w) fits the HBM budget;
        ("spill", L)   — lists capped at L, overflow rows in a flat spill
                         region scanned densely and merged (bounds memory at
                         high skew while keeping the DMA kernel layout)."""
        from ..utils.config import config

        if self._dr is not None:
            # Device-resident layout (models/ivf_device.py): the padded
            # lists already live in HBM with a fixed lmax — the list-scan
            # kernel (or its interpreter off-TPU) is the only serving path.
            return ("device", self._dr.lmax)
        if self.metric.name not in ("L2", "INNER_PRODUCT"):
            return None
        if self.sq_type is not None:
            # SQ8/SQ4 have the fused int8 DMA kernel (SQ4 scores its two
            # nibble planes in-kernel; + SQ-aware spill scan for capped
            # layouts); SQ6's 3-byte bit-sliced unpack needs int8 reshapes
            # Mosaic rejects, so it runs the XLA decode+gather scan.
            from ..utils.config import sq_int8_active

            if self.sq_type not in ("sq8", "sq4") or not sq_int8_active():
                return None
        mode = config.kernel_mode
        if not (mode == "pallas" or (mode == "auto" and on_tpu())):
            return None
        cache = getattr(self, "_pallas_plan_cache", None)
        if cache is not None and cache[0] == self._version:
            return cache[1]
        if self.pq_m is not None:
            width = self.pq_m
        elif self.sq_type is not None:
            width = self._codes.shape[1]
        else:
            width = self.d * 4
        full = choose_lmax(self._counts_max())
        if self.nlist * full * width <= self.PALLAS_LAYOUT_BUDGET_BYTES:
            plan = ("full", None)
        else:
            budget_lmax = self.PALLAS_LAYOUT_BUDGET_BYTES // \
                max(self.nlist * width, 1)
            lmax = 128
            while lmax * 2 <= budget_lmax:
                lmax *= 2
            if budget_lmax < 128:
                plan = None
            else:
                counts = self._counts()
                nspill = int(np.maximum(counts - lmax, 0).sum())
                plan = (("spill", lmax)
                        if nspill <= self.SPILL_FRACTION_MAX * self._nstored
                        else None)
        self._pallas_plan_cache = (self._version, plan)
        return plan

    def _use_pallas_scan(self) -> bool:
        return self._pallas_plan() is not None

    def _build_list_layout(self, lmax_cap: int | None = None):
        """Host-side padded list layout: (payload (nlist, lmax, w), counts
        (nlist,), row_pos (nlist, lmax), spill) — payload is byte codes for
        PQ storage, raw fp32 rows otherwise.  Single source for the pallas
        and device-sharded layouts.

        With ``lmax_cap``, lists longer than the cap keep their first cap
        members in the padded layout; the overflow rows come back in
        ``spill`` = (payload (s, w), assign (s,), pos (s,) original-row
        positions), unpadded.  spill is None otherwise."""
        n = self._nstored
        counts = self._counts()
        if lmax_cap is None and n and \
                counts.max() > max(32 * n / self.nlist, 4096):
            import sys

            print(f"duckdb_faiss_ext_tpu: IVF list skew is extreme "
                  f"(max {counts.max()} vs avg {n / self.nlist:.0f}); the "
                  f"padded layout will be memory-heavy — consider retraining "
                  f"(kmeans_balance) or fewer lists", file=sys.stderr)
        lmax = choose_lmax(max(1, int(counts.max()) if n else 1))
        if lmax_cap is not None:
            lmax = min(lmax, lmax_cap)
        kept = np.minimum(counts, lmax)
        row_pos = np.full((self.nlist, lmax), -1, np.int32)
        order = np.argsort(self._assign, kind="stable")
        offsets = np.concatenate([[0], np.cumsum(counts)])
        raw = self._codes if self._codes is not None else self._xb
        w = raw.shape[1] if self._codes is not None else self.d
        payload = np.zeros((self.nlist, lmax, w), raw.dtype)
        spill = None
        if n:
            # Vectorized scatter (a Python loop over nlist was the build
            # bottleneck at 16k lists): rank of each sorted row within its
            # list decides padded slot vs spill.
            sorted_assign = self._assign[order]
            ranks = np.arange(n, dtype=np.int64) - offsets[sorted_assign]
            keep = ranks < lmax
            flat = sorted_assign[keep].astype(np.int64) * lmax + ranks[keep]
            payload.reshape(-1, w)[flat] = raw[order[keep]]
            row_pos.reshape(-1)[flat] = order[keep]
            if not keep.all():
                sp = order[~keep]
                spill = (raw[sp], self._assign[sp], sp.astype(np.int32))
        return payload, kept.astype(np.int32), row_pos, spill

    def _build_device_pallas(self):
        if getattr(self, "_device_pallas", None) is not None:
            return self._device_pallas
        if self._dr is not None:
            return self._dr_build_device_pallas()
        plan = self._pallas_plan()
        lmax_cap = plan[1] if plan is not None else None
        payload, counts, row_pos, spill = self._build_list_layout(lmax_cap)
        if self.pq_m is not None:
            extra = (jnp.asarray(self._pq_codebooks),)
        elif self.sq_type is not None:
            # Int8 SQ8 kernel extras: Σ(scale·c)² scattered into the padded
            # (nlist, lmax) layout via row_pos, plus the decode ranges.
            from ..ops.sq import sq_row_norms

            rn = sq_row_norms(self._codes, self._sq_scale, self.d,
                              self.sq_type)
            rn_layout = np.zeros(row_pos.shape, np.float32)
            valid = row_pos >= 0
            rn_layout[valid] = rn[row_pos[valid]]
            vmin, scale = self._sq_ranges()
            extra = (jnp.asarray(rn_layout), vmin, scale)
        else:
            extra = ()
        self._device_pallas = (
            jnp.asarray(payload),
            jnp.asarray(counts),
            jnp.asarray(row_pos),
            jnp.asarray(self._centroids),
        ) + extra
        if spill is None:
            self._device_spill = None
        else:
            sp_payload, sp_assign, sp_pos = spill
            s_pad = max(128, next_pow2(sp_pos.shape[0]))
            self._device_spill = (
                jnp.asarray(pad_rows(sp_payload, s_pad)),
                jnp.asarray(pad_rows(sp_assign, s_pad).astype(np.int32)),
                jnp.asarray(pad_rows(sp_pos, s_pad, fill=-1)
                            .astype(np.int32)),
            )
        return self._device_pallas

    def _spill_mask(self, selector):
        key = ("spill", selector.cache_key(), self._version)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        sp_pos = np.asarray(self._device_spill[2])
        passing = selector.contains(self._ids)
        mask = np.zeros(sp_pos.shape, bool)
        valid = sp_pos >= 0
        mask[valid] = passing[sp_pos[valid]]
        dev = jnp.asarray(mask)
        self._mask_cache[key] = dev
        return dev

    def _pallas_mask(self, selector):
        key = ("pallas", selector.cache_key(), self._version)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        if self._dr is not None:
            rp = self._dr.row_pos          # host copy, no device fetch
        else:
            rp = np.asarray(self._build_device_pallas()[2])
        passing = selector.contains(self._ids)
        mask = np.zeros(rp.shape, np.int8)
        valid = rp >= 0
        mask[valid] = passing[rp[valid]]
        dev = jnp.asarray(mask)
        self._mask_cache = {key: dev}
        return dev

    # --- device build ----------------------------------------------------
    def _build_device(self):
        if self._dr is not None:
            raise errors.InvalidInputError(
                "this device-resident index serves only through the "
                "list-scan kernel (range search and nprobe beyond the "
                "SMEM probe budget need a host-path index)")
        if self._device is not None:
            return self._device
        n = self._nstored
        order = np.argsort(self._assign, kind="stable")
        sorted_assign = self._assign[order]
        counts = np.bincount(sorted_assign, minlength=self.nlist)
        # Scan window length: the longest list, pow2-bucketed so adds don't
        # re-jit every time the max grows.  Lists are CONTIGUOUS blocks of
        # the sorted buffer — the scans slice (lmax, w) windows per probe
        # (ops/ivf_scan.slice_probed_lists); no (nlist, lmax) index table.
        lmax = max(1, int(counts.max()) if n else 1)
        lmax = max(128, next_pow2(lmax))

        # capacity bucketing: padding rows past n are never inside a probed
        # window (offsets/counts bound every list's rows).
        cap = max(config.min_capacity, next_capacity(n + 1))

        if self.pq_m is not None:
            codes_sorted = pad_rows(self._codes[order] if n else self._codes,
                                    cap)
            assign_sorted = pad_rows(sorted_assign, cap).astype(np.int32)
            self._device = (
                (jnp.asarray(codes_sorted), jnp.asarray(assign_sorted),
                 jnp.asarray(self._pq_codebooks)),
                lmax,
                jnp.asarray(self._centroids),
                order.astype(np.int64),
            )
        elif self.sq_type is not None:
            # Codes stay HOST-side here: the int8 fast path and the uint8
            # decode path each upload their own representation lazily
            # (_ivf_int8_state / _sq_codes_dev) — uploading both would
            # double corpus HBM (13.6 GB × 2 at the MARCO scale).
            codes_sorted = pad_rows(self._codes[order] if n else self._codes,
                                    cap)
            vmin, scale = self._sq_ranges()
            self._device = (
                (codes_sorted, vmin, scale),
                lmax,
                jnp.asarray(self._centroids),
                order.astype(np.int64),
            )
        else:
            xb_sorted = pad_rows(self._xb[order] if n else self._xb, cap)
            self._device = (
                jnp.asarray(xb_sorted),
                lmax,
                jnp.asarray(self._centroids),
                order.astype(np.int64),
            )
        return self._device

    # --- selector --------------------------------------------------------
    def row_labels(self) -> np.ndarray:
        return self._ids

    def _selector_mask(self, selector, order):
        key = (selector.cache_key(), self._version)
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        rows = selector.contains(self._ids[order])  # sorted order
        storage = self._device[0]
        cap = (storage[0] if isinstance(storage, tuple) else storage).shape[0]
        mask = jnp.asarray(pad_rows(rows, cap, fill=False))
        self._mask_cache = {key: mask}
        return mask

    # --- search ----------------------------------------------------------
    def search(self, xq, k, params=EMPTY, selector=None) -> SearchResult:
        return self._finish_dispatch(
            self.search_dispatch(xq, k, params, selector), xq, k)

    def search_dispatch(self, xq, k, params=EMPTY, selector=None):
        """Raw device dispatch for the single-fetch serving tier
        (api.faiss_search_batched): (dist_dev, pos_dev, nq, k_eff,
        positions→labels fn[, host postprocess]) or None when no device
        work applies.

        With SOAR enabled every datapoint is stored twice (two lists), so
        the kernel fetches 2k candidates and a host postprocess drops the
        same-SOURCE-row duplicates (labels_fn.src_of maps kernel positions
        to logical datapoints — genuinely duplicated user labels are NOT
        collapsed) before padding back to k."""
        if getattr(self, "soar_lambda", 0.0) > 0.0 and int(k) > 0:
            disp = self._dispatch_inner(xq, 2 * int(k), params, selector)
            if disp is None:
                return None
            dist, pos, nq, _, labels_fn = disp
            sim = self.metric.name in SIMILARITY_METRICS
            sentinel = float("-inf") if sim else float("inf")
            src_of = getattr(labels_fn, "src_of", None)

            def post(d, lab, pos_host, k=int(k), sentinel=sentinel,
                     src_of=src_of):
                keys = src_of(pos_host) if src_of is not None else lab
                return _dedup_by_key(d, lab, keys, k, sentinel)

            return dist, pos, nq, int(k), labels_fn, post
        return self._dispatch_inner(xq, k, params, selector)

    def _dispatch_inner(self, xq, k, params=EMPTY, selector=None):
        self._require_trained()
        xq = as_matrix(xq, self.d)
        nq = xq.shape[0]
        k = int(k)
        if nq == 0 or k <= 0 or self.ntotal == 0:
            return None

        # SearchParametersIVF: nprobe plus quantiser.-scoped recursion
        # (src/faiss_extension.cpp:675-689).  Our coarse assignment is an
        # exact fused tile, so quantiser.* params parse but cannot change
        # results; they are accepted for surface parity.
        nprobe = params.get_int("nprobe", self.nprobe_default)
        _ = params.scoped("quantiser.")

        nprobe_eff = max(1, min(int(nprobe), self.nlist))
        nq_pad = max(config.min_query_bucket, next_pow2(nq))
        xq_pad = jnp.asarray(pad_rows(xq, nq_pad))

        def ids_labels(pos, ids=self._ids):
            return np.where(pos >= 0, ids[np.clip(pos, 0, None)]
                            if ids.size else pos, -1)

        if self._srcrow is not None:
            # Storage-row positions → logical datapoint (SOAR dedup key).
            ids_labels.src_of = (
                lambda pos, src=self._srcrow:
                np.where(pos >= 0, src[np.clip(pos, 0, None)], -1))

        if getattr(self, "_shard_mesh", None) is not None:
            # Device-sharded placement (faiss_to_device): lists partitioned
            # over the mesh, all-gather top-k merge.
            lmax_s = self._ivf_sharded_lmax()
            k_eff = min(k, nprobe_eff * lmax_s)
            dist, pos = self._search_sharded(xq_pad, k_eff, nprobe_eff,
                                             selector)
            return dist, pos, nq, k_eff, ids_labels

        # Pallas list-scan path; skipped when even the minimum 64-query
        # block would overflow the SMEM probe-table budget (qb bottoms out
        # at 64 below — very high nprobe goes through the gather scan).
        if self._use_pallas_scan() and \
                64 * nprobe_eff <= self.PALLAS_SMEM_PROBE_INTS:
            dev = self._build_device_pallas()
            payload, counts, row_pos, cents_dev = dev[:4]
            lmax = payload.shape[1]
            spill = getattr(self, "_device_spill", None)
            # Spill rows are extra candidates beyond the capped padded
            # layout: k_eff must count them or k > nprobe·lmax truncates
            # valid neighbors to the padded slots.
            n_spill = spill[2].shape[0] if spill is not None else 0
            k_kernel = min(k, nprobe_eff * lmax)
            k_eff = min(k, nprobe_eff * lmax + n_spill)
            mask = (self._pallas_mask(selector)
                    if selector is not None else None)
            probe_ids = _coarse_topk(
                xq_pad, cents_dev,
                jnp.asarray(self.metric_arg, jnp.float32),
                nprobe=nprobe_eff, metric=self.metric.name,
                precision=config.precision)
            # The probe table is scalar-prefetched into SMEM (1 MB/core):
            # block the kernel over queries so nq_block·nprobe ints stay
            # within budget (1024×256 probes hit the 1 MB wall — measured).
            qb = xq_pad.shape[0]
            while qb * nprobe_eff > self.PALLAS_SMEM_PROBE_INTS and qb > 64:
                qb //= 2

            def run_block(xq_b, probe_b, mask_b=mask):
                if self.pq_m is not None:
                    from ..ops.pallas_ivf import pallas_ivf_pq_search

                    qc = max(1, min(8, xq_b.shape[0]))
                    return pallas_ivf_pq_search(
                        payload, counts, row_pos, dev[4], cents_dev,
                        probe_b, xq_b, mask_b,
                        k=k_kernel, nprobe=nprobe_eff,
                        metric=self.metric.name,
                        q_chunk=qc, precision=config.precision,
                        interpret=not on_tpu(), codec=self.pq_codec)
                if self.sq_type is not None:
                    from ..ops.pallas_ivf import pallas_ivf_sq_search

                    rn_layout, vmin, scale = dev[4], dev[5], dev[6]
                    k_scan = min(nprobe_eff * lmax,
                                 max(4 * k_kernel, k_kernel + 32))
                    return pallas_ivf_sq_search(
                        payload, rn_layout, counts, row_pos, vmin, scale,
                        probe_b, xq_b, mask_b,
                        k=k_kernel, k_scan=k_scan, nprobe=nprobe_eff,
                        metric=self.metric.name, codec=self.sq_type,
                        interpret=not on_tpu())
                return pallas_ivf_search(
                    payload, counts, row_pos, probe_b, xq_b, mask_b,
                    k=k_kernel, nprobe=nprobe_eff, metric=self.metric.name,
                    interpret=not on_tpu())

            if qb == xq_pad.shape[0]:
                scores, pos = run_block(xq_pad, probe_ids)
            else:
                parts = [run_block(xq_pad[i:i + qb], probe_ids[i:i + qb])
                         for i in range(0, xq_pad.shape[0], qb)]
                scores = jnp.concatenate([p[0] for p in parts], axis=0)
                pos = jnp.concatenate([p[1] for p in parts], axis=0)
            if spill is not None:
                # Overflow rows of capped lists: dense scan masked to each
                # query's probe set, merged with the padded-layout top-k.
                from ..ops.ivf_scan import ivf_spill_scan, merge_topk

                sp_payload, sp_assign, sp_pos = spill
                sp_mask = (self._spill_mask(selector)
                           if selector is not None else None)
                sq_kw = {}
                if self.sq_type is not None:
                    sq_kw = dict(sq=self.sq_type, sq_vmin=dev[5],
                                 sq_scale=dev[6])
                sp_scores, sp_positions = ivf_spill_scan(
                    sp_payload, sp_assign, sp_pos, cents_dev,
                    dev[4] if self.pq_m is not None else None,
                    probe_ids, xq_pad, sp_mask,
                    jnp.asarray(self.metric_arg, jnp.float32),
                    k=min(k_eff, sp_pos.shape[0]), metric=self.metric.name,
                    precision=config.precision, pq=self.pq_m is not None,
                    codec=self.pq_codec, **sq_kw)
                scores, pos = merge_topk(scores, pos, sp_scores,
                                         sp_positions, k_eff)
            dist, pos = finalize_scores(scores, pos, self.metric.name)
            return dist, pos, nq, k_eff, ids_labels

        storage, lmax, centroids, order = self._build_device()
        k_eff = min(k, nprobe_eff * lmax)
        offs, cnts = self._sorted_list_meta()
        mask = (self._selector_mask(selector, order)
                if selector is not None else None)
        q_chunk = choose_q_chunk(nq_pad, nprobe_eff * lmax, self.d)

        if self.pq_m is not None:
            codes_sorted, assign_sorted, codebooks = storage
            scores, pos = ivf_pq_search(
                codes_sorted, codebooks,
                offs, cnts, centroids,
                xq_pad, mask, jnp.asarray(self.metric_arg, jnp.float32),
                k=k_eff, nprobe=nprobe_eff, metric=self.metric.name,
                q_chunk=q_chunk, precision=config.precision,
                codec=self.pq_codec, lmax=lmax)
        elif self.sq_type is not None:
            from ..utils.config import sq_int8_active

            _, vmin, scale = storage
            if (self.sq_type in ("sq8", "sq4", "sq6")
                    and self.metric.name in ("L2", "INNER_PRODUCT")
                    and self.d >= 16     # tiny-d margins sit at the int8 noise floor
                    and sq_int8_active()):
                from ..ops.ivf_scan import ivf_sq_int8_search

                rn = self._ivf_sq_row_norm()
                k_scan = min(nprobe_eff * lmax,
                             max(4 * k_eff, k_eff + 32))
                scores, pos = ivf_sq_int8_search(
                    self._sq_codes_dev(), rn, offs, cnts,
                    centroids, vmin, scale, xq_pad, mask,
                    jnp.asarray(self.metric_arg, jnp.float32),
                    k=k_eff, k_scan=k_scan, nprobe=nprobe_eff,
                    metric=self.metric.name, q_chunk=q_chunk,
                    precision=config.precision, codec=self.sq_type,
                    lmax=lmax)
            else:
                from ..ops.ivf_scan import ivf_sq_search

                scores, pos = ivf_sq_search(
                    self._sq_codes_dev(), vmin, scale,
                    offs, cnts, centroids,
                    xq_pad, mask,
                    jnp.asarray(self.metric_arg, jnp.float32),
                    k=k_eff, nprobe=nprobe_eff, metric=self.metric.name,
                    q_chunk=q_chunk, precision=config.precision,
                    codec=self.sq_type, lmax=lmax)
        else:
            scores, pos = ivf_search(
                storage, offs, cnts, centroids,
                xq_pad, mask, jnp.asarray(self.metric_arg, jnp.float32),
                k=k_eff, nprobe=nprobe_eff, metric=self.metric.name,
                q_chunk=q_chunk, precision=config.precision, lmax=lmax)
        dist, pos = finalize_scores(scores, pos, self.metric.name)

        def sorted_labels(pos_host, ids_sorted=self._sorted_ids(order)):
            return np.where(pos_host >= 0,
                            ids_sorted[np.clip(pos_host, 0, None)]
                            if ids_sorted.size else pos_host, -1)

        if self._srcrow is not None:
            sorted_labels.src_of = (
                lambda pos, src=self._sorted_srcrow(order):
                np.where(pos >= 0, src[np.clip(pos, 0, None)], -1))

        return dist, pos, nq, k_eff, sorted_labels

    def _sorted_list_meta(self):
        """(offsets, counts) int32 device arrays describing the sorted
        layout's contiguous list blocks (for slice_probed_lists); cached
        per version."""
        cached = getattr(self, "_list_meta_cache", None)
        if cached is not None and cached[0] == self._version:
            return cached[1]
        c = self._counts().astype(np.int64)
        off = np.concatenate([[0], np.cumsum(c[:-1])]) if c.size else c
        meta = (jnp.asarray(off.astype(np.int32)),
                jnp.asarray(c.astype(np.int32)))
        self._list_meta_cache = (self._version, meta)
        return meta

    def _sorted_srcrow(self, order) -> np.ndarray:
        """_srcrow permuted into sorted layout, cached per build like
        _sorted_ids (same O(_nstored)-per-dispatch concern)."""
        cached = getattr(self, "_srcrow_sorted", None)
        if cached is None or cached[0] is not order:
            cached = (order, self._srcrow[order])
            self._srcrow_sorted = cached
        return cached[1]

    def _sorted_ids(self, order) -> np.ndarray:
        """ids permuted into the sorted storage layout, cached per layout
        build — the batched serving tier holds one dispatch tuple per batch,
        so materializing an O(ntotal) copy per dispatch (80 MB at the 10M
        scale) is both a host hot-path gather and a memory multiplier.
        Keyed on the identity of the layout's ``order`` array: a rebuild
        (any add) produces a fresh order object, invalidating the cache."""
        cached = self._ids_sorted
        if cached is None or cached[0] is not order:
            cached = (order, self._ids[order] if self.ntotal else self._ids)
            self._ids_sorted = cached
        return cached[1]

    # --- create params (efConstruction recursion hits the quantizer) ------
    def apply_create_params(self, params) -> None:
        # Engine extensions beyond the reference's surface: training knobs
        # (seed/niter for reproducibility, kmeans_balance for skew-aware
        # list sizing — SURVEY.md §2.3 skew handling).
        self.train_seed = params.get_int("train_seed", self.train_seed)
        self.train_niter = params.get_int("train_niter", self.train_niter)
        self.train_balance = params.get_float("kmeans_balance", 0.0)
        beam = params.get_int("beam")
        if beam is not None:
            # RQ-storage encode beam (models/rq.DEFAULT_BEAM otherwise).
            if self.pq_codec != "rq":
                raise errors.InvalidInputError(
                    "beam applies to RQ storage (IVFn,RQMxb)")
            self.rq_beam = max(1, beam)
        lam = params.get_float("soar_lambda")
        if lam is not None:
            # SOAR dual assignment (see add_with_ids); lambda weights the
            # orthogonality-amplified term, ~1.0 is the paper's sweet spot.
            if lam < 0.0:
                raise errors.InvalidInputError(
                    f"soar_lambda must be >= 0, got {lam}")
            if self.nlist < 2 and lam > 0.0:
                raise errors.InvalidInputError(
                    "SOAR needs at least 2 inverted lists")
            self.soar_lambda = lam
        eta = params.get_float("anisotropic_eta")
        if eta is not None:
            # ScaNN-style score-aware residual quantization (PQ storage
            # only); anisotropy axis = the ORIGINAL datapoint direction.
            if eta < 1.0:
                raise errors.InvalidInputError(
                    f"anisotropic_eta must be >= 1.0, got {eta}")
            if self.pq_m is None or self.pq_codec != "pq":
                raise errors.InvalidInputError(
                    "anisotropic_eta applies to PQ storage (IVFn,PQm)")
            self.aniso_eta = eta
        self.quantizer.apply_create_params(params.scoped("ivf."))

    # --- serialization ----------------------------------------------------
    def state_dict(self) -> dict:
        if self._dr is not None:
            # Materialize the device layout back into the host format so
            # save/load round-trips into a normal host-path index (one
            # bulk payload fetch; save at scale is an explicit, rare op).
            rows = self._dr_materialize_codes()
            state = {"xb": (rows if self.sq_type is None
                            else np.empty((0, self.d), np.float32)),
                     "ids": self._ids, "assign": self._assign}
            if self._centroids is not None:
                state["centroids"] = self._centroids
            if self.sq_type is not None:
                state["codes"] = rows
                if self._sq_vmin is not None:
                    state["sq_vmin"] = self._sq_vmin
                    state["sq_scale"] = self._sq_scale
            return state
        state = {
            "xb": self._xb,
            "ids": self._ids,
            "assign": self._assign,
        }
        if getattr(self, "soar_lambda", 0.0) > 0.0:
            # Needed after load: search must keep fetching 2k + deduping.
            state["soar_lambda"] = np.float32(self.soar_lambda)
            if self._srcrow is not None:
                state["soar_srcrow"] = self._srcrow
                state["soar_rows"] = self._logical_rows
        if getattr(self, "aniso_eta", 1.0) > 1.0:
            state["aniso_eta"] = np.float32(self.aniso_eta)
        if getattr(self, "rq_beam", None) is not None:
            state["rq_beam"] = np.int64(self.rq_beam)
        if self._centroids is not None:
            state["centroids"] = self._centroids
        if self.pq_m is not None:
            state["codes"] = self._codes
            if self._pq_codebooks is not None:
                state["pq_codebooks"] = self._pq_codebooks
        if self.sq_type is not None:
            state["codes"] = (self._codes.view(np.uint8)
                              if self.sq_type in _FLOAT_SQ
                              else self._codes)
            if self._sq_vmin is not None:
                state["sq_vmin"] = self._sq_vmin
                state["sq_scale"] = self._sq_scale
        return state

    def load_state(self, state: dict) -> None:
        lam = state.pop("soar_lambda", None)
        if lam is not None:
            self.soar_lambda = float(lam)
        srcrow = state.pop("soar_srcrow", None)
        if srcrow is not None:
            self._srcrow = np.asarray(srcrow, np.int64).reshape(-1)
            self._logical_rows = np.asarray(
                state.pop("soar_rows"), np.int64).reshape(-1)
        eta = state.pop("aniso_eta", None)
        if eta is not None:
            self.aniso_eta = float(eta)
        beam = state.pop("rq_beam", None)
        if beam is not None:
            self.rq_beam = int(beam)
        self._xb = np.asarray(state["xb"], np.float32).reshape(-1, self.d)
        self._ids = np.asarray(state["ids"], np.int64).reshape(-1)
        self._assign = np.asarray(state["assign"], np.int32).reshape(-1)
        cents = state.get("centroids")
        self._centroids = (np.asarray(cents, np.float32)
                           if cents is not None else None)
        if self.pq_m is not None:
            self._codes = np.asarray(state["codes"],
                                     np.uint8).reshape(-1, self.pq_m)
            cb = state.get("pq_codebooks")
            self._pq_codebooks = (np.asarray(cb, np.float32)
                                  if cb is not None else None)
        if self.sq_type is not None:
            from ..ops.sq import sq_code_width

            codes = np.asarray(state["codes"])
            if self.sq_type in _FLOAT_SQ:
                self._codes = codes.view(
                    _sq_float_dtype(self.sq_type)).reshape(-1, self.d)
            else:
                self._codes = codes.astype(np.uint8).reshape(
                    -1, sq_code_width(self.d, self.sq_type))
            vmin = state.get("sq_vmin")
            if vmin is not None:
                self._sq_vmin = np.asarray(vmin, np.float32)
                self._sq_scale = np.asarray(state["sq_scale"], np.float32)
        if self._centroids is not None:
            # Rebuilt-by-factory quantizer is untrained; _populate_quantizer
            # retrains it on the centroid table when needed (a bare .add
            # crashed loading IVFn(IVFm,...) composites).
            self._populate_quantizer()
        self._invalidate()


import functools as _functools  # noqa: E402

import jax as _jax  # noqa: E402


@_functools.partial(_jax.jit,
                    static_argnames=("nprobe", "metric", "precision"))
def _coarse_topk(xq, centroids, metric_arg, *, nprobe, metric, precision):
    """Coarse-quantizer assignment: top-nprobe list ids per query (MXU tile
    + one small top_k) — feeds the Pallas list-scan kernel."""
    from ..ops.distance import pairwise_tile
    from ..ops.flat_search import SIMILARITY_METRICS as _SIM

    cdist = pairwise_tile(xq, centroids, metric, metric_arg, precision)
    cscore = cdist if metric in _SIM else -cdist
    _, ids = _jax.lax.top_k(cscore, nprobe)
    return ids.astype(_jax.numpy.int32)


def _ivf_shard_over(self, mesh) -> None:
    """faiss_to_gpu analogue for IVF: partition the padded list layout over
    the mesh's 'shard' axis (each device owns a contiguous block of lists);
    searches then run through parallel.sharded.sharded_ivf_search_fn with
    the all-gather top-k merge.  The placement is sticky across adds (the
    sharded layout rebuilds on the same mesh after mutations)."""
    if self.metric.name not in ("L2", "INNER_PRODUCT"):
        raise errors.InvalidInputError(
            f"IVF indexes with metric {self.metric.name} cannot be sharded "
            f"over devices (only L2 and INNER_PRODUCT)")
    if self._dr is not None:
        raise errors.InvalidInputError(
            "a device-resident index cannot be re-sharded with "
            "faiss_to_device (its layout lives on one device)")
    if "batch" not in mesh.shape or "shard" not in mesh.shape:
        raise errors.InvalidInputError(
            "IVF sharding needs a mesh with 'shard' and 'batch' axes "
            "(parallel.placement.default_mesh builds one)")
    nshards = int(mesh.shape["shard"])
    if self.nlist % nshards:
        # Auto-shrink to the largest list-count divisor that fits the
        # devices (the default mesh uses every local device; small indexes
        # can't use them all).
        usable = next(g for g in range(min(nshards, self.nlist), 0, -1)
                      if self.nlist % g == 0)
        import numpy as _np
        from jax.sharding import Mesh as _Mesh

        devs = mesh.devices.reshape(-1)[: usable]
        mesh = _Mesh(_np.array(devs).reshape(usable, 1),
                     ("shard", "batch"))
    self._shard_mesh = mesh
    self._device_pallas = None  # rebuilt sharded on next search
    # Re-sharding onto a different mesh must drop the old placement: the
    # array cache is keyed only on _version and the shard_map fn cache
    # doesn't include the mesh, so stale entries would silently keep the
    # index on the previous device set.
    self._device_sharded = None
    self._sharded_fn_cache = None


def _ivf_build_sharded(self):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if getattr(self, "_device_sharded", None) is not None \
            and self._device_sharded[0] == self._version:
        return self._device_sharded[1]
    mesh = self._shard_mesh
    payload, counts, row_pos, _ = self._build_list_layout()
    arrays = (
        jax.device_put(payload, NamedSharding(mesh, P("shard", None, None))),
        jax.device_put(counts, NamedSharding(mesh, P("shard"))),
        jax.device_put(row_pos, NamedSharding(mesh, P("shard", None))),
        jnp.asarray(self._centroids),
    )
    if self.pq_m is not None:
        arrays += (jnp.asarray(self._pq_codebooks),)
    elif self.sq_type is not None:
        arrays += self._sq_ranges()   # (vmin, scale), replicated
    self._device_sharded = (self._version, arrays)
    return arrays


def _ivf_sharded_mask(self, selector):
    """Selector mask aligned with the sharded (nlist, lmax) layout, placed
    with the same 'shard' partitioning as the lists."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = ("sharded", selector.cache_key(), self._version)
    hit = self._mask_cache.get(key)
    if hit is not None:
        return hit
    row_pos = np.asarray(self._build_sharded()[2])
    passing = selector.contains(self._ids)
    mask = np.zeros(row_pos.shape, np.int8)
    valid = row_pos >= 0
    mask[valid] = passing[row_pos[valid]]
    dev = jax.device_put(mask,
                         NamedSharding(self._shard_mesh, P("shard", None)))
    self._mask_cache = {key: dev}
    return dev


def _ivf_search_sharded(self, xq_pad, k_eff, nprobe_eff, selector):
    from ..parallel.sharded import sharded_ivf_search_fn

    arrays = self._build_sharded()
    payload, counts, row_pos, centroids = arrays[:4]
    pq = self.pq_m is not None
    sq = self.sq_type
    has_mask = selector is not None
    key = (k_eff, nprobe_eff, self.metric.name, xq_pad.shape[0], pq,
           self.pq_codec, sq, has_mask, config.precision)
    cache = getattr(self, "_sharded_fn_cache", None)
    if cache is None:
        cache = self._sharded_fn_cache = {}
    fn = cache.get(key)
    if fn is None:
        fn = cache[key] = sharded_ivf_search_fn(
            self._shard_mesh, k=k_eff, nprobe=nprobe_eff,
            metric=self.metric.name,
            q_chunk=min(8, xq_pad.shape[0]),
            precision=config.precision, pq=pq, pq_codec=self.pq_codec,
            sq=sq, has_mask=has_mask)
    extras = arrays[4:]  # codebooks (PQ) or vmin/scale (SQ)
    if has_mask:
        extras += (self._ivf_sharded_mask(selector),)
    return fn(payload, counts, row_pos, centroids, xq_pad,
              jnp.asarray(self.metric_arg, jnp.float32), *extras)


IVFIndex.shard_over = _ivf_shard_over
IVFIndex._build_sharded = _ivf_build_sharded
IVFIndex._search_sharded = _ivf_search_sharded
IVFIndex._ivf_sharded_mask = _ivf_sharded_mask


def _ivf_sharded_lmax(self) -> int:
    return self._build_sharded()[0].shape[1]


IVFIndex._ivf_sharded_lmax = _ivf_sharded_lmax


def _ivf_range_search(self, xq, radius, params=EMPTY, selector=None):
    """Range search over the probed lists (faiss::IndexIVF::range_search
    contract: exact within the nprobe-selected lists)."""
    from ..ops.range import _ivf_range_chunk, empty_range_result
    from ..ops.range import RangeSearchResult

    self._require_trained()
    xq = as_matrix(xq, self.d)
    nq = xq.shape[0]
    if nq == 0 or self.ntotal == 0:
        return empty_range_result(nq)
    nprobe = params.get_int("nprobe", self.nprobe_default)
    nprobe_eff = max(1, min(int(nprobe), self.nlist))

    storage, lmax, centroids, order = self._build_device()
    offs, cnts = self._sorted_list_meta()
    xb_sorted = storage[0] if isinstance(storage, tuple) else storage
    if self.pq_m is not None:
        # Decode-on-the-fly for PQ storage: reconstruct candidates from
        # codes inside the chunk fn is not wired here; decode the probed
        # candidates via the dense sorted codes path instead.
        codes_sorted, assign_sorted, codebooks = storage
        from ..ops.pq import codec_decode

        # Materialize decoded rows chunk-wise would defeat compression;
        # for range search (non-hot path) decode the full sorted corpus
        # once on device.
        resid = codec_decode(codes_sorted, codebooks, self.pq_codec)
        xb_sorted = resid + centroids[assign_sorted]
    elif self.sq_type is not None:
        from ..ops.sq import sq_decode

        _, vmin, scale = storage
        xb_sorted = sq_decode(self._sq_codes_dev(), vmin, scale,
                              self.sq_type)
    nq_pad = max(config.min_query_bucket, next_pow2(nq))
    xq_pad = jnp.asarray(pad_rows(xq, nq_pad))
    probe_ids = _coarse_topk(xq_pad, centroids,
                             jnp.asarray(self.metric_arg, jnp.float32),
                             nprobe=nprobe_eff, metric=self.metric.name,
                             precision=config.precision)
    sim = self.metric.name in SIMILARITY_METRICS
    labels_sorted = self._sorted_ids(order)
    passing = (selector.contains(labels_sorted)
               if selector is not None else None)
    # Power-of-two chunk so it divides nq_pad (slices never shift).
    budget = max(1, (1 << 22) // max(nprobe_eff * lmax, 1))
    qc = 1
    while qc * 2 <= min(budget, int(nq_pad)):
        qc *= 2
    marg = jnp.asarray(self.metric_arg, jnp.float32)
    per_q_rows = [[] for _ in range(nq)]
    per_q_dist = [[] for _ in range(nq)]
    for q0 in range(0, nq, qc):
        xq_c = jax.lax.dynamic_slice(
            xq_pad, (min(q0, nq_pad - qc), 0), (qc, self.d))
        pr_c = jax.lax.dynamic_slice(
            probe_ids, (min(q0, nq_pad - qc), 0), (qc, nprobe_eff))
        dist, cand = _ivf_range_chunk(
            xb_sorted, offs, cnts, pr_c, xq_c,
            marg, metric=self.metric.name, precision=config.precision,
            lmax=lmax)
        dist = np.asarray(dist)
        cand = np.asarray(cand)
        hit = (dist > radius) if sim else (dist < radius)
        if passing is not None:
            hit &= passing[np.clip(cand, 0, len(passing) - 1)] & \
                (cand < len(passing))
        for qi in range(min(qc, nq - q0)):
            sel_idx = np.nonzero(hit[qi])[0]
            if sel_idx.size:
                rows = cand[qi, sel_idx]
                per_q_rows[q0 + qi].append(labels_sorted[rows])
                per_q_dist[q0 + qi].append(dist[qi, sel_idx])
    lims = np.zeros((nq + 1,), np.int64)
    lparts, dparts = [], []
    for q in range(nq):
        rows = (np.concatenate(per_q_rows[q]) if per_q_rows[q]
                else np.empty((0,), np.int64))
        ds = (np.concatenate(per_q_dist[q]) if per_q_dist[q]
              else np.empty((0,), np.float32))
        lims[q + 1] = lims[q] + rows.size
        lparts.append(rows.astype(np.int64))
        dparts.append(ds.astype(np.float32))
    return RangeSearchResult(
        lims,
        np.concatenate(lparts) if lparts else np.empty((0,), np.int64),
        np.concatenate(dparts) if dparts else np.empty((0,), np.float32))


import jax  # noqa: E402

def _ivf_range_search_outer(self, xq, radius, params=EMPTY, selector=None):
    res = _ivf_range_search(self, xq, radius, params, selector)
    if getattr(self, "soar_lambda", 0.0) <= 0.0:
        return res
    # SOAR duplicates rows across two lists: a label can appear twice in a
    # query's CSR segment when both its lists were probed.  Keep the BEST
    # duplicate (codec storages encode the two copies against different
    # centroids, so their decoded distances differ).  One vectorized
    # lexsort over the whole CSR; result order within a segment is
    # unspecified, matching faiss::RangeSearchResult.
    from ..ops.range import RangeSearchResult

    nq = res.lims.shape[0] - 1
    nres = res.labels.shape[0]
    if nres == 0:
        return res
    qid = np.repeat(np.arange(nq, dtype=np.int64), np.diff(res.lims))
    sim = self.metric.name in SIMILARITY_METRICS
    dkey = -res.distances if sim else res.distances
    order = np.lexsort((dkey, res.labels, qid))
    q_s, l_s = qid[order], res.labels[order]
    first = np.ones((nres,), bool)
    first[1:] = (q_s[1:] != q_s[:-1]) | (l_s[1:] != l_s[:-1])
    keep = order[first]
    keep.sort()  # restore per-query grouping
    counts = np.bincount(qid[keep], minlength=nq)
    lims = np.zeros((nq + 1,), np.int64)
    np.cumsum(counts, out=lims[1:])
    return RangeSearchResult(lims, res.labels[keep], res.distances[keep])


IVFIndex.range_search = _ivf_range_search_outer


class IMIIndex(IVFIndex):
    """IVF over a product (multi-index) coarse quantizer — the factory's
    ``IMI2x{nbits}[,encoding]`` heads (faiss::MultiIndexQuantizer feeding
    IndexIVF*, reachable through the reference's pass-through factory call,
    src/faiss_extension.cpp:154-155).

    The coarse space is the cross product of two codebooks of K = 2^nbits
    centroids fitted independently on the two halves of the vector, giving
    nlist = K^2 cells while training only needs n >= K points (the IMI
    advantage: 65536 cells from 256-way k-means).  TPU design: the (K^2, d)
    cell-center table is materialized once at train time so every shared
    scan/layout/sharding path works unchanged (a 64-query probe against
    65536 cells is one small MXU tile); assignment stays factored per half
    — exact for L2/INNER_PRODUCT because both metrics decompose over
    disjoint coordinate blocks."""

    #: materialized cell-center table cap (bytes): 4^nbits * d * 4.
    MAX_TABLE_BYTES = 1 << 30
    #: the mirror quantizer is never consulted for IMI (assignment is
    #: factored, probing uses the cell table directly); copying the table
    #: into it would double host memory.
    _mirror_quantizer = False

    def __init__(self, d: int, metric: Metric, metric_arg: float,
                 nbits: int, quantizer: Index, encoding: str = "Flat"):
        nbits = int(nbits)
        if nbits < 1:
            raise errors.InvalidInputError(
                f"IMI needs at least 1 bit per sub-quantizer, got {nbits}")
        if d % 2:
            raise errors.InvalidInputError(
                f"The dimension of the vector ({d}) must be even for an "
                f"IMI2x coarse quantizer")
        table_bytes = (1 << (2 * nbits)) * d * 4
        if table_bytes > self.MAX_TABLE_BYTES:
            raise errors.InvalidInputError(
                f"IMI2x{nbits} at dimension {d} needs a "
                f"{table_bytes >> 20} MiB cell table (cap "
                f"{self.MAX_TABLE_BYTES >> 20} MiB); use fewer bits")
        super().__init__(d, metric, metric_arg, nlist=1 << (2 * nbits),
                         quantizer=quantizer, encoding=encoding)
        if metric.name not in ("L2", "INNER_PRODUCT"):
            raise errors.InvalidInputError(
                f"IMI indexes support only L2 and INNER_PRODUCT metrics, "
                f"got {metric.name}")
        self.imi_nbits = nbits

    def _train_coarse(self, x):
        K = 1 << self.imi_nbits
        x = self._subsample_train(x, K)
        h = self.d // 2
        hp = jax.lax.Precision.HIGHEST
        bal = getattr(self, "train_balance", 0.0)
        cb1, _ = kmeans_fit(x[:, :h], K, niter=self.train_niter,
                            seed=self.train_seed, precision=hp, balance=bal)
        cb2, _ = kmeans_fit(x[:, h:], K, niter=self.train_niter,
                            seed=self.train_seed + 1, precision=hp,
                            balance=bal)
        cb1 = np.asarray(cb1, np.float32)
        cb2 = np.asarray(cb2, np.float32)
        # Cell (i, j) → list i*K + j, center = concat(cb1[i], cb2[j]).
        table = np.concatenate([np.repeat(cb1, K, axis=0),
                                np.tile(cb2, (K, 1))], axis=1)
        return np.ascontiguousarray(table), x

    def _imi_codebooks(self):
        """Factored sub-codebooks recovered from the materialized table
        (no separate serialized state needed)."""
        K = 1 << self.imi_nbits
        h = self.d // 2
        return self._centroids[::K, :h], self._centroids[:K, h:]

    def _assign_lists(self, x: np.ndarray) -> np.ndarray:
        """Exact factored assignment: per-half nearest sub-centroid.  For
        L2/IP the cell score is the sum of the two half scores over disjoint
        coordinates, so the per-half argbest minimizes over all K^2 cells
        without forming them."""
        from ..ops.distance import pairwise_tile

        if x.shape[0] == 0:
            return np.empty((0,), dtype=np.int32)
        K = 1 << self.imi_nbits
        h = self.d // 2
        cb1, cb2 = self._imi_codebooks()
        sim = self.metric.name in SIMILARITY_METRICS
        hp = jax.lax.Precision.HIGHEST
        chunk = max(1024, min(65536, (1 << 27) // K))
        parts = []
        for i in range(0, x.shape[0], chunk):
            xc = jnp.asarray(x[i:i + chunk])
            t1 = pairwise_tile(xc[:, :h], jnp.asarray(cb1),
                               self.metric.name, self.metric_arg, hp)
            t2 = pairwise_tile(xc[:, h:], jnp.asarray(cb2),
                               self.metric.name, self.metric_arg, hp)
            a1 = (jnp.argmax(t1, 1) if sim else jnp.argmin(t1, 1))
            a2 = (jnp.argmax(t2, 1) if sim else jnp.argmin(t2, 1))
            parts.append((a1 * K + a2).astype(jnp.int32))
        return np.asarray(jnp.concatenate(parts), dtype=np.int32)


# Device-resident ingest (attaches add_device / train_device and the
# _dr_* hooks; at the very bottom so the partially-imported module already
# holds the finished classes).
IMIIndex._supports_device_ingest = False   # factored assignment + train

from . import ivf_device  # noqa: E402,F401
