"""Pallas TPU kernel: exact-grade f64 moment contraction via two-float arithmetic.

The peeled assembly needs image moments  M[s, y] = sum_x W[s, x] * G[x, y]
computed to full f64 accuracy (the smooth-content correlations cancel
catastrophically at lower precision). On this TPU, XLA's exact f64 route for
skinny matmuls runs at ~0.03 TFLOP/s (10.7 ms marginal per 4K plane); the
fast f64 emulation is only ~1e-7 accurate. This kernel runs the contraction
on the VPU in compensated double-float (Dekker/Knuth error-free
transformations on f32 pairs): 1.9 ms marginal per 4K plane at ~1e-14
relative accuracy.

Inputs are f64 arrays split exactly into (hi, lo) f32 pairs
(hi = f32(x), lo = f32(x - hi)). Products expand as
  (wh + wl)(gh + gl) = [Dekker TwoProd(wh, gh): exact p + e]
                       + wh*gl + wl*gh + wl*gl
and the per-block column sums run through a compensated pairwise tree
(Knuth TwoSum on the hi lane, error folded into lo). Per-term neglected
error is O(2^-48) relative; measured max relative error vs true f64 on
4096-deep contractions is ~1e-14.

Runtime constraint (axon remote compiler): pallas_call with a `grid=` fails
to compile ("tpu_compile_helper exit 1"), so blocking happens at the JAX
level — an unrolled loop of grid-free pallas_calls over (bx, by) tiles, with
exact f64 accumulation of the per-tile (hi, lo) partials outside the kernel.
Counter-intuitively this is also the fastest layout measured (small tiles
pipeline better than one 100MB-scoped-VMEM call: 1.9 ms vs 3.8 ms).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SPLIT_C = np.float32(4097.0)  # 2^12 + 1 (Dekker split for f32: 24 = 12+12)


def split_f64(x: jnp.ndarray):
    """Exact two-float split of an f64 array: x == hi + lo with f32 parts."""
    hi = x.astype(jnp.float32)
    lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def _two_prod(a, b):
    """Dekker TwoProd in f32: a*b = p + e exactly (no FMA assumed)."""
    p = a * b
    a1 = a * _SPLIT_C
    ah = a1 - (a1 - a)
    al = a - ah
    b1 = b * _SPLIT_C
    bh = b1 - (b1 - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def _two_sum(a, b):
    """Knuth TwoSum in f32: a+b = s + e exactly."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _tree_reduce_comp(ph, plo, n: int):
    """Compensated pairwise-tree reduction over axis 0 of (n, by) hi/lo pairs
    -> (1, by). Static sublane slicing only (Mosaic-friendly)."""
    h, l = ph, plo
    while n > 1:
        half = n // 2
        s, e = _two_sum(h[:half], h[half:n])
        l = l[:half] + l[half:n] + e
        h = s
        n = half
    return h, l


def _make_kernel(bx: int, S: int):
    def kernel(wh_ref, wl_ref, gh_ref, gl_ref, outh_ref, outl_ref):
        gh = gh_ref[:, :]
        gl = gl_ref[:, :]
        for s in range(S):  # static unroll over the few moment weights
            w_h = wh_ref[:, s : s + 1]               # (bx, 1)
            w_l = wl_ref[:, s : s + 1]
            p, e = _two_prod(w_h, gh)                # (bx, by) exact products
            lo = e + (w_h * gl + (w_l * gh + w_l * gl))
            rh, rl = _tree_reduce_comp(p, lo, bx)    # (1, by)
            outh_ref[s, :] = rh[0]
            outl_ref[s, :] = rl[0]

    return kernel


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    m = (-n) % mult
    if m == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, m)
    return jnp.pad(x, pads)


def moments_pallas(W: jnp.ndarray, G: jnp.ndarray, bx: int = 128,
                   by: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """M = W @ G in compensated double-float. W: (S, N0) f64, G: (N0, N1) f64.

    Returns f64 (S, N1), accurate to ~1e-14 relative. Arbitrary shapes
    (zero-padded internally to tile multiples); S <= 16 per kernel (larger S
    is chunked). Traceable under jit; TPU only — except interpret=True,
    which runs the identical kernel through the Pallas interpreter on any
    backend (used by the CPU test suite to pin the two-float arithmetic).

    Blocking: lax.scan over contraction blocks inside lax.map over lane
    chunks, so the HLO graph contains ONE pallas custom-call per matmul
    regardless of operand size (a fully unrolled block loop put thousands of
    custom-calls into large graphs and blew up axon compile times).
    """
    S, N0 = W.shape
    _, N1 = G.shape
    if S > 16:
        return jnp.concatenate(
            [moments_pallas(W[i : i + 16], G, bx, by, interpret)
             for i in range(0, S, 16)],
            axis=0,
        )
    Sp = 16

    wh, wl = split_f64(W.T)            # (N0, S): s on the lane axis
    wh = _pad_to(_pad_to(wh, 1, Sp), 0, bx)
    wl = _pad_to(_pad_to(wl, 1, Sp), 0, bx)
    gh, gl = split_f64(G)
    gh = _pad_to(_pad_to(gh, 0, bx), 1, by)
    gl = _pad_to(_pad_to(gl, 0, bx), 1, by)
    N0p, N1p = gh.shape
    nK, nL = N0p // bx, N1p // by

    kern = _make_kernel(bx, S)
    call_tile = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        out_shape=(jax.ShapeDtypeStruct((Sp, by), jnp.float32),) * 2,
        interpret=interpret,
    )

    whb = wh.reshape(nK, bx, Sp)
    wlb = wl.reshape(nK, bx, Sp)
    # (nL, nK, bx, by) lane-chunked contraction blocks
    ghb = jnp.moveaxis(gh.reshape(nK, bx, nL, by), 2, 0)
    glb = jnp.moveaxis(gl.reshape(nK, bx, nL, by), 2, 0)

    def lane_chunk(g2):
        ghc, glc = g2

        def step(acc, xs):
            whk, wlk, ghk, glk = xs
            oh, ol = call_tile(whk, wlk, ghk, glk)
            return acc + (oh.astype(jnp.float64) + ol.astype(jnp.float64)), 0

        acc, _ = jax.lax.scan(
            step, jnp.zeros((Sp, by), jnp.float64), (whb, wlb, ghc, glc))
        return acc

    out = jax.lax.map(lane_chunk, (ghb, glb))       # (nL, Sp, by)
    out = jnp.moveaxis(out, 0, 1).reshape(Sp, N1p)
    return out[:S, :N1]
