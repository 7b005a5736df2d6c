"""Global runtime configuration.

``precision`` selects the matmul mode for MXU distance kernels:

* ``"parity"``  — lax.Precision.HIGHEST: ~fp32 accumulation, required to match
  the reference's fp32 BLAS distances (the golden-value tests,
  test/sql/faiss.test:16-38).
* ``"fast"``    — lax.Precision.DEFAULT: bf16 MXU passes, the throughput mode.

The reference has no such switch because CPU BLAS is always fp32; on TPU the
parity/throughput trade-off is real, so it is explicit.
"""

from __future__ import annotations

import dataclasses

from jax import lax

_PRECISIONS = {
    "parity": lax.Precision.HIGHEST,
    "fast": lax.Precision.DEFAULT,
}


@dataclasses.dataclass
class Config:
    precision_mode: str = "parity"
    #: search-kernel selection: "auto" = Pallas fused kernel on TPU where
    #: supported (L2/IP, k ≤ 1024), XLA scan otherwise; "xla" / "pallas"
    #: force one path ("pallas" off-TPU runs the interpreter — tests only).
    kernel_mode: str = "auto"
    #: minimum padded corpus capacity (power of two); keeps jit cache small
    min_capacity: int = 128
    #: minimum padded query-batch bucket
    min_query_bucket: int = 8
    #: SQ8 scan arithmetic: "auto" = int8 MXU dot in fast mode (codes read
    #: as int8, no decode intermediate, 2× bf16 TOPS; query-side-only
    #: quantization recovered by the built-in exact rerank), decode path
    #: in parity mode; "int8" / "decode" force one path.
    sq_dot: str = "auto"
    #: spill-scan digit-dot lowering for the XLA spill scan: "int32"
    #: keeps the int8->int32 einsum; "bf16" casts through bf16 MXU
    #: matmuls.  Settled by a clean same-session on-chip A/B
    #: (2026-08-20, tools/spill_profile.py): int32 312.0 vs bf16
    #: 326.5 ms at 1M rows/b1024, and 45.0 vs 48.2 ms at 262k/b256 —
    #: int32 wins both shapes (the earlier cross-session diag that
    #: motivated bf16 was relay-drift noise).
    spill_int8_via: str = "int32"
    #: IN-KERNEL digit-dot operand dtype for the Pallas SQ scans (the
    #: per-query DMA and pair-tile kernels): "bf16" casts both int8
    #: operands to bf16 so the dot rides the MXU (integer-exact — see
    #: ops/sq_digits.py); "int8" keeps the s8xs8 dot_general, which
    #: per-tile timing showed running at ~VPU MAC rates for small M.
    sq_digit_dtype: str = "bf16"
    #: pair-tile kernel implementation: "grid" = one tile per automatic
    #: grid step (measured ~12.5 us/step overhead); "mega" = hand-rolled
    #: DMA, 16+ tiles per step (ops/pallas_ivf_pairs.py mega kernels).
    pairs_impl: str = "grid"
    #: spill-scan implementation: "auto" = the fused Pallas dense scan
    #: (ops/pallas_spill.py, exact full-window rerank) for sq8/sq4
    #: spills >= spill_pallas_min rows, XLA chunked scan otherwise;
    #: "xla" / "pallas" force one path.  Standing rule: a kernel
    #: defaults on only after an on-chip label-agreement-1.0 run is
    #: recorded in BASELINE.md — cleared 2026-08-20
    #: (tools/spill_profile.py: agreement 1.0000 at 1M rows/b1024 and
    #: 262k/b256; 110 vs 312 ms = 2.8x over the XLA scan at the marco
    #: shape).
    spill_impl: str = "auto"
    spill_pallas_min: int = 1 << 18
    #: single-jit SQ pairs serving: "auto" fuses coarse+pairs+spill+
    #: merge+finalize into ONE XLA program when the batch needs no query
    #: blocking (the staged path pays a dispatch gap + intermediate HBM
    #: round-trip per program boundary through the tunneled runtime);
    #: "off" keeps the staged dispatch.  Same jitted building blocks
    #: traced inline — results identical.
    fused_dispatch: str = "auto"
    #: host->device query wire format: "auto" = fp16 in fast mode for
    #: uploads > 1 MB (cast back to f32 on device — the tunneled relay
    #: uploads at ~25 ms + ~23 ms/MB, so the b1024 x 1536 query batch
    #: cost 170 ms of a 223 ms marco batch as fp32; fp16 halves it for
    #: ~6e-4 relative query error, far below storage quantization
    #: noise), f32 in parity mode; "f32" / "f16" force one format.
    query_wire: str = "auto"

    @property
    def precision(self):
        return _PRECISIONS[self.precision_mode]


config = Config()


def set_precision(mode: str) -> None:
    if mode not in _PRECISIONS:
        raise ValueError(f"precision mode must be one of {sorted(_PRECISIONS)}")
    config.precision_mode = mode


def set_kernel_mode(mode: str) -> None:
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError("kernel mode must be auto, xla, or pallas")
    config.kernel_mode = mode


def set_sq_dot(mode: str) -> None:
    if mode not in ("auto", "int8", "decode"):
        raise ValueError("sq dot mode must be auto, int8, or decode")
    config.sq_dot = mode


def sq_int8_active() -> bool:
    """Whether the SQ8 scan should take the int8 MXU path right now."""
    from jax import lax

    if config.sq_dot == "int8":
        return True
    if config.sq_dot == "decode":
        return False
    return config.precision != lax.Precision.HIGHEST


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. tunneled 'axon'
    devices, whose platform string differs but which are TPU chips)."""
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    kind = (getattr(dev, "device_kind", "") or "").lower()
    plat = (getattr(dev, "platform", "") or "").lower()
    return "tpu" in kind or plat in ("tpu", "axon")


def next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1).bit_length())


def next_capacity(n: int) -> int:
    """Device-buffer capacity schedule: powers of two up to 1M rows
    (amortised growth, few jit shapes), then 1M-row increments — pow2
    padding wastes up to 2× HBM at 10M+ rows.  All returned values are
    divisible by every power-of-two block size ≤ 2^20 the kernels pick."""
    n = int(n)
    if n <= (1 << 20):
        return next_pow2(max(n, 1))
    step = 1 << 20
    return step * -(-n // step)


def pad_rows(arr, target: int, fill=0.0):
    """Pad (n, ...) array with fill rows up to target rows."""
    import numpy as np

    n = arr.shape[0]
    if n == target:
        return arr
    pad = [(0, target - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad, constant_values=fill)
