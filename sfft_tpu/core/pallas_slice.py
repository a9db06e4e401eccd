"""Single-pass integer slicing on the TPU VPU via Pallas — OPT-IN.

The sliced exact engine (core/exact_fft.py) decomposes every f32 (hi, lo)
pair operand into NB-bit integer slices before its MXU dots. The XLA lowering
of that decomposition materializes the sequential residual chain r_q in HBM —
measured 3.38 ms per RESIDENT (4096, 2049) pair lane-set at nsl=8 on the
v5e; this kernel computes all slices in ONE read of (hi, lo): 0.82 ms
measured (4.1x) on the same resident operand.

IN SITU however the Pallas route is a measured NET LOSS (see _ENABLE below):
inside the transforms and correlation windows the slicing input is produced
by fused elementwise chains that XLA folds straight into its own slicing
chain, while the Pallas call forces producer materialization + block
reshapes + int8 moveaxis copies. The module therefore ships OPT-IN
(SFFT_PALLAS_SLICE=1) for isolated-operand callers, with the measurement
kept as the documented reason.

Bit-identical to exact_fft._slice_pair_real: verified elementwise in Pallas
interpret mode (tests) and by on-device slice-sum equality on hardware
(tools/diag_slice_cost.py). Exactness argument: the scale is a power of two
(divisions exact), p = round(r * 2^(6q)) is an integer with |p| <= 64, and
r - p/sc subtracts two values within a factor of 2 (Sterbenz: exact), so the
representation invariant value == s * sum_q slices[q] 2^{-6(q+1)} holds for
ANY rounding tie direction; the canonicalization TwoSum needs no compiler
fence here because Mosaic lowers the arithmetic verbatim (no algebraic
simplifier, no FMA contraction pass over it — measured bit-equality).

Runtime constraint (axon remote compiler): pallas_call with a `grid=` fails
to compile, so blocking happens at the JAX level — lax.map over row blocks,
each a grid-free VMEM-resident call (same pattern as core/pallas_moments.py).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# OPT-IN (measured net loss in situ, kept for isolated-operand use cases):
# the kernel wins 4.1x on a RESIDENT operand (0.82 vs 3.38 ms per 4K
# lane-set), but inside the real pipelines the slicing's input is produced
# by a fused elementwise chain (pair Hadamard, twiddle products) that XLA
# fuses INTO the XLA slicing chain at zero materialization cost — routing
# through Pallas forces the producer output, the block reshape and the
# (nsl, ...) int8 results to materialize in HBM. Measured on hardware
# 2026-08-20 (docs/diag_pexact_stages_4096_r5c): pair-FFT stage 292 -> 508
# ms, greek windowed correlations 220 -> 293 ms with the Pallas path on.
_ENABLE = bool(int(os.environ.get("SFFT_PALLAS_SLICE", "0")))
_MIN_ELEMS = 1 << 20          # below this the dispatch bookkeeping dominates


def supported(x) -> bool:
    """Pallas slicing path applies: opted in, TPU backend, big operand."""
    if not _ENABLE:
        return False
    try:
        if jax.default_backend() == "cpu":
            return False
    except Exception:
        return False
    return x.size >= _MIN_ELEMS


def _mk_kernel(nsl: int, nb_bits: int):
    def kernel(hi_ref, lo_ref, s_ref, out_ref):
        h = hi_ref[:, :]
        l = lo_ref[:, :]
        s = s_ref[:, :]
        # canonicalize so |lo| <= ulp(hi)/2 (fast TwoSum; |hi| >= |lo|)
        h2 = h + l
        l2 = l - (h2 - h)
        r = h2 / s
        for q in range(nsl):
            sc = np.float32(2.0 ** (nb_bits * (q + 1)))
            p = jnp.round(r * sc)
            out_ref[q, :, :] = p.astype(jnp.int8)
            r = r - p / sc
            if q == 3:
                # hi fully consumed after ceil(24/6) = 4 slices: inject lo
                r = r + l2 / s
    return kernel


def slice_pair_real(hi: jnp.ndarray, lo: jnp.ndarray, nsl: int,
                    rowwise: bool, nb_bits: int, pow2ceil,
                    interpret: bool = False):
    """(hi, lo) f32 -> (int8 slices stacked on axis 0, pow-2 scale), the
    Pallas twin of exact_fft._slice_pair_real(int8=True). Arbitrary leading
    dims (sliced along the LAST axis's rows); rowwise scales per last-axis
    row, else one global scale. `pow2ceil` is exact_fft._pow2ceil_scalar
    (passed in to avoid a circular import)."""
    sh = hi.shape
    if rowwise:
        K = sh[-1]
        rows = int(np.prod(sh[:-1])) if len(sh) > 1 else 1
        h2d = hi.reshape(rows, K)
        l2d = lo.reshape(rows, K)
        s = pow2ceil(jnp.max(jnp.abs(h2d), axis=-1, keepdims=True))  # (r, 1)
        s_full = s
        s_out = s.reshape(sh[:-1] + (1,))
    else:
        # one GLOBAL scale -> element grouping is free: flatten and re-block
        # at the ideal lane width. DFT-stage operands are (..., 64); keeping
        # their last axis would pad every block 64 -> 128 (2x wasted VPU
        # work) and spray tiny blocks (measured as a net regression).
        K = 2048 if hi.size >= 2048 else 128
        rows = -(-hi.size // K)
        flat_pad = rows * K - hi.size
        h2d = jnp.pad(hi.reshape(-1), (0, flat_pad)).reshape(rows, K)
        l2d = jnp.pad(lo.reshape(-1), (0, flat_pad)).reshape(rows, K)
        s = pow2ceil(jnp.max(jnp.abs(hi)))                           # scalar
        s_full = jnp.broadcast_to(s.reshape(1, 1), (rows, 1))
        s_out = s

    Kp = K + ((-K) % 128)
    # block budget: the axon compiler enforces a 16 MB scoped-VMEM limit and
    # counts inputs + outputs + kernel temporaries (measured OOM at 48 MB
    # with 2 MB-element blocks) — ~2^19 elements * (8 B f32-in + nsl B out +
    # ~10 B temps) stays under it; also don't pad rows past the data
    rb = max(32, min((1 << 19) // Kp // 32 * 32,
                     (rows + 31) // 32 * 32))
    rows_p = rows + ((-rows) % rb)
    pr, pc = rows_p - rows, Kp - K
    h2d = jnp.pad(h2d, ((0, pr), (0, pc)))
    l2d = jnp.pad(l2d, ((0, pr), (0, pc)))
    sp = jnp.pad(s_full, ((0, pr), (0, 0)), constant_values=1.0)
    nb = rows_p // rb

    call = pl.pallas_call(
        _mk_kernel(nsl, nb_bits),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsl, rb, Kp), jnp.int8),
        interpret=interpret,
    )
    blocks = jax.lax.map(
        lambda t: call(*t),
        (h2d.reshape(nb, rb, Kp), l2d.reshape(nb, rb, Kp),
         jnp.broadcast_to(sp.reshape(nb, rb, 1), (nb, rb, 128))[:, :, :1]))
    sl = jnp.moveaxis(blocks, 1, 0).reshape(nsl, rows_p, Kp)
    if rowwise:
        sl = sl[:, :rows, :K].reshape((nsl,) + sh)
    else:
        sl = sl[:, :rows, :K].reshape(nsl, -1)[:, :hi.size]
        sl = sl.reshape((nsl,) + sh)
    return sl, s_out


def _mk_kernel_triple(nsl: int, nb_bits: int):
    def kernel(hi_ref, mid_ref, lo_ref, s_ref, out_ref):
        h = hi_ref[:, :]
        m = mid_ref[:, :]
        l = lo_ref[:, :]
        s = s_ref[:, :]
        r = h / s
        carry = jnp.zeros_like(r)
        for q in range(nsl):
            sc = np.float32(2.0 ** (nb_bits * (q + 1)))
            p = jnp.round(r * sc)
            out_ref[q, :, :] = p.astype(jnp.int8)
            r = r - p / sc
            if q == 3:
                # EXACT injection (TwoSum; see _slice_triple_real): the
                # rounding of r + mid/s is ~2^-48*s — defer it as a carry to
                # the lo injection where the add rounds at 2^-72*s
                b = m / s
                t = r + b
                v = t - r
                carry = (r - (t - v)) + (b - v)
                r = t
            if q == 7:
                r = r + (l / s + carry)
    return kernel


def slice_triple_real(hi, mid, lo, nsl: int, rowwise: bool, nb_bits: int,
                      pow2ceil, interpret: bool = False):
    """Pallas twin of exact_fft._slice_triple_real (72-bit capture; the
    refinement-residual path). Inputs are exact 3-way f32 splits (already
    canonical). nsl >= 8 (the injections land at q==3/q==7)."""
    assert nsl >= 8
    sh = hi.shape
    K = sh[-1]
    rows = int(np.prod(sh[:-1])) if len(sh) > 1 else 1
    h2d = hi.reshape(rows, K)
    m2d = mid.reshape(rows, K)
    l2d = lo.reshape(rows, K)
    if rowwise:
        s = pow2ceil(jnp.max(jnp.abs(h2d), axis=-1, keepdims=True))
        s_full = s
        s_out = s.reshape(sh[:-1] + (1,))
    else:
        s = pow2ceil(jnp.max(jnp.abs(h2d)))
        s_full = jnp.broadcast_to(s.reshape(1, 1), (rows, 1))
        s_out = s
    Kp = K + ((-K) % 128)
    # triple kernel: 3 f32 inputs + nsl(=12) int8 outputs + temps — tighter
    # element budget than the pair kernel for the same 16 MB VMEM scope
    rb = max(32, min((1 << 18) // Kp // 32 * 32,
                     (rows + 31) // 32 * 32))
    rows_p = rows + ((-rows) % rb)
    pr, pc = rows_p - rows, Kp - K
    h2d = jnp.pad(h2d, ((0, pr), (0, pc)))
    m2d = jnp.pad(m2d, ((0, pr), (0, pc)))
    l2d = jnp.pad(l2d, ((0, pr), (0, pc)))
    sp = jnp.pad(s_full, ((0, pr), (0, 0)), constant_values=1.0)
    nb = rows_p // rb
    call = pl.pallas_call(
        _mk_kernel_triple(nsl, nb_bits),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nsl, rb, Kp), jnp.int8),
        interpret=interpret,
    )
    blocks = jax.lax.map(
        lambda t: call(*t),
        (h2d.reshape(nb, rb, Kp), m2d.reshape(nb, rb, Kp),
         l2d.reshape(nb, rb, Kp),
         jnp.broadcast_to(sp.reshape(nb, rb, 1), (nb, rb, 128))[:, :, :1]))
    sl = jnp.moveaxis(blocks, 1, 0).reshape(nsl, rows_p, Kp)
    sl = sl[:, :rows, :K].reshape((nsl,) + sh)
    return sl, s_out
