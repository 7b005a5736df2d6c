"""Shared in-kernel int8 digit-dot builder for the SQ Pallas kernels.

Three kernel families score packed SQ codes with int8 MXU dots against the
two-digit recentred query quantization (ops/sq.py::sq_query_digits): the
per-query DMA list scan (ops/pallas_ivf.py), the pair-tile MXU-batched
scan (ops/pallas_ivf_pairs.py), and the dense spill scan.  Their unpack +
dot bodies are byte-for-byte the same algorithm — this module is the one
implementation, so a new codec (or a Mosaic legality fix) lands once.

Mosaic legality rules baked in (validated on the real v5e chip,
2026-08-18):

* s8×s8 ``dot_general`` with ``preferred_element_type=int32`` lowers iff
  the contraction is over the LAST dim of both operands and no minor-dim
  reshape/insertion touches an 8-bit type;
* ``>>``/``<<`` on u8/i8 vectors never legalize (``arith.shrui``) — the
  nibble/plane extraction widens to i32, shifts, then truncates to i8;
* the i32 widen materialises ``rows·w·4`` bytes of scoped VMEM, so the
  callers sub-tile rows (``sq_utile``) to bound the scratch;
* sq8's ``c ⊕ 0x80`` recentring (c − 128 by two's-complement
  reinterpretation) is a pure bitwise VPU pass + ``pltpu.bitcast``.

Reference parity: these dots compute the same u·c term faiss's
ScalarQuantizer distance computers produce from QT_8bit/QT_4bit/QT_6bit
codes (reference exposes them via index_factory strings behind
src/faiss_extension.cpp:631); the digit decomposition and MXU batching
are TPU-native with no reference analogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.pallas import tpu as pltpu

#: scoped-VMEM headroom assumed by sq_utile (of the 16 MB per core): the
#: remainder covers Mosaic's own temporaries and the double-buffered
#: pipeline slack (13 MB measured safe across the chip-validated shapes).
SQ_SCOPED_VMEM = 13 << 20


def sq_utile(codec: str, lmax: int, row_bytes: int,
             resident_bytes: int, dtype: str = "int8") -> int:
    """Rows per unpack+dot sub-tile.

    sq4/sq6 widen their code block to i32 per sub-tile (4·row_bytes per
    row of scratch), so they cap at 512 rows.  sq8 only materialises the
    xor'd i8 copy (row_bytes per row — 2x that for the bf16 digit-dot
    operand): one big step when the VMEM left after ``resident_bytes``
    (double-buffered blocks, score tiles) allows — fewer serial sub-tile
    chains per grid step (measured 2x on the 8.8M×1536 padded scan,
    chain9 2026-08-19)."""
    if codec != "sq8":
        # sq4/sq6 widen to i32 per sub-tile; at large blocks the 512-row
        # sub-tile overflowed the scoped stack by ~0.9 MB and the
        # 256-row one by 20 KB (sq6 pair-tile grid kernel, lmax 2560 x
        # 1152 B — marco sq6 sweep 2026-08-20), so shrink with the
        # double-buffered block size.
        blk = lmax * row_bytes
        return min(lmax, 512 if blk <= (2 << 20) else
                   256 if blk <= (5 << 19) else 128)
    per_row = row_bytes * (2 if dtype == "bf16" else 1)
    left = SQ_SCOPED_VMEM - resident_bytes
    return min(lmax, max(512, left // max(per_row, 1) // 512 * 512))


def sq_block_digit_dot(block, t0: int, ut: int, codec: str,
                       dtype: str = "int8"):
    """Unpack rows [t0, t0+ut) of a VMEM code block and return
    ``digit_dot: (G, wq) int8 -> (G, ut)`` (int32 for dtype="int8",
    fp32 for dtype="bf16"; both integer-exact — see below).

    ``block`` layouts: (lmax, w) uint8 for sq8 (w = d) and sq4
    (w = ceil(d/2), byte j packs dims 2j low / 2j+1 high); plane-major
    (3*lmax, d4) for sq6 (4 codes per 3 bytes, d4 = ceil(d/4); plane b
    occupies rows [b*lmax, (b+1)*lmax)) — the plane axis is FOLDED into
    the sublane axis so the trailing dims are (8,128)-tileable: a
    4-D (3, lmax, d4) block made Mosaic demand a relaid operand and XLA
    materialised a padded copy of the whole payload (15 G at the 8.8M
    marco shape — compile-time HBM OOM, 2026-08-20).  The matching
    query-digit packing is ``sq_pack_query_planes``.

    ``dtype="bf16"``: both operands cast to bf16 before the dot
    (preferred fp32).  int8 values are EXACT in bf16 (|v| <= 128 < 2^8
    mantissa) and the MXU accumulates fp32, so the dots compute the
    same integers up to <=1-ulp accumulation noise past 2^24 — which
    the callers' exact fp32 rerank absorbs (the same argument as the
    spill scan's spill_int8_via="bf16", chain11 2026-08-19).  Why it
    exists: per-tile timing showed the s8xs8 dot_general running at
    ~VPU int32 MAC rates (~20 us for 2x (8,1536)x(1536,1024)), i.e.
    Mosaic lowers small-M int8 dots OFF the MXU; bf16 rides the MXU."""
    cast = ((lambda x: x.astype(jnp.bfloat16)) if dtype == "bf16"
            else (lambda x: x))
    pref = jnp.float32 if dtype == "bf16" else jnp.int32

    if codec == "sq6":
        d4 = block.shape[1]
        lm = block.shape[0] // 3
        b0 = lax.slice(block, (t0, 0), (t0 + ut, d4)) \
            .astype(jnp.int32)
        b1 = lax.slice(block, (lm + t0, 0), (lm + t0 + ut, d4)) \
            .astype(jnp.int32)
        b2 = lax.slice(block, (2 * lm + t0, 0), (2 * lm + t0 + ut, d4)) \
            .astype(jnp.int32)
        planes = (cast((b0 >> 2).astype(jnp.int8)),
                  cast((((b0 & 3) << 4) | (b1 >> 4)).astype(jnp.int8)),
                  cast((((b1 & 15) << 2) | (b2 >> 6)).astype(jnp.int8)),
                  cast((b2 & 63).astype(jnp.int8)))

        def digit_dot(ug, planes=planes, d4=d4):
            g = ug.shape[0]
            dot = jnp.zeros((g, ut), pref)
            for x, cx in enumerate(planes):
                ui_x = cast(lax.slice(ug, (0, x * d4), (g, (x + 1) * d4)))
                dot = dot + jax.lax.dot_general(
                    ui_x, cx, (((1,), (1,)), ((), ())),
                    preferred_element_type=pref)
            return dot
        return digit_dot

    if codec == "sq4":
        w_half = block.shape[1]
        b32 = lax.slice(block, (t0, 0), (t0 + ut, w_half)) \
            .astype(jnp.int32)
        nib_lo = cast((b32 & 0x0F).astype(jnp.int8))
        nib_hi = cast((b32 >> 4).astype(jnp.int8))

        def digit_dot(ug, w_half=w_half, nl=nib_lo, nh=nib_hi):
            g = ug.shape[0]
            ui_e = cast(lax.slice(ug, (0, 0), (g, w_half)))
            ui_o = cast(lax.slice(ug, (0, w_half), (g, 2 * w_half)))
            return (jax.lax.dot_general(
                        ui_e, nl, (((1,), (1,)), ((), ())),
                        preferred_element_type=pref)
                    + jax.lax.dot_general(
                        ui_o, nh, (((1,), (1,)), ((), ())),
                        preferred_element_type=pref))
        return digit_dot

    # sq8
    ci8 = cast(pltpu.bitcast(
        lax.slice(block, (t0, 0), (t0 + ut, block.shape[1]))
        ^ jnp.uint8(0x80), jnp.int8))

    def digit_dot(ug, ci8=ci8):
        return jax.lax.dot_general(
            cast(ug), ci8, (((1,), (1,)), ((), ())),
            preferred_element_type=pref)
    return digit_dot


def sq_pack_query_planes(digit, d: int, wbytes: int, codec: str):
    """Rearrange a (nq, d) int8 query digit to match the kernel block
    layout: sq4 → even/odd dim planes (each padded to the byte width,
    pad contributes 0); sq6 → four dim-planes (dims x::4, padded to d4);
    sq8 → unchanged."""
    if codec == "sq4":
        pad = 2 * wbytes - d
        dp = jnp.pad(digit, ((0, 0), (0, pad)))
        return jnp.concatenate([dp[:, 0::2], dp[:, 1::2]], axis=1)
    if codec == "sq6":
        d4 = wbytes // 3
        pad = 4 * d4 - d
        dp = jnp.pad(digit, ((0, 0), (0, pad)))
        return jnp.concatenate([dp[:, x::4] for x in range(4)], axis=1)
    return digit
