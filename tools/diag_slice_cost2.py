"""Marginal (in-jit) cost of sliced-engine components at 4K shapes.

diag_slice_cost.py's standalone-jit numbers are dispatch-floor-dominated
(~25 ms/call swamps everything). Here each component body runs k times
inside ONE jit via lax.map over per-iteration seeds (data perturbed per
iteration so nothing collapses to a single compute); marginal cost =
(t_k2 - t_k1) / (k2 - k1).

Run: python tools/diag_slice_cost2.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K1, K2 = 2, 8

    from sfft_tpu.utils import warmup

    warmup.start_device_warmup()

    import jax
    import jax.numpy as jnp

    from sfft_tpu.core import exact_fft as ef
    from sfft_tpu.core.exact_fft import (CPair, SliceProfile, _corr_emats,
                                         _pair_hadamard_conj,
                                         _slice_pair_real, _sliced_dot_multi,
                                         _static_slices_for, exact_dft_axis,
                                         exact_idft_halfin_real)

    print(f"platform: {jax.default_backend()}, N={N}", flush=True)
    Nh = N // 2 + 1
    prof = SliceProfile(8, 7, 6)
    rng = np.random.default_rng(0)

    # one shared base pair, uploaded once (content irrelevant to timing)
    base = rng.normal(0, 1, (N, Nh))
    bh = jnp.asarray(base.astype(np.float32))
    bl = jnp.asarray((base - base.astype(np.float32)).astype(np.float32))

    def run(tag, mk_body):
        ts = {}
        for k in (K1, K2):
            seeds = jnp.arange(1, k + 1, dtype=jnp.float32) * np.float32(1e-6)

            def f(seeds):
                return jnp.sum(jax.lax.map(mk_body, seeds))

            t0 = time.time()
            compiled = jax.jit(f).lower(seeds).compile()
            tc = time.time() - t0
            float(np.asarray(compiled(seeds)))
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                float(np.asarray(compiled(seeds)))
                best = min(best, time.time() - t0)
            ts[k] = best
        marg = (ts[K2] - ts[K1]) / (K2 - K1) * 1000
        print(f"  {tag:16s} marginal {marg:8.2f} ms  "
              f"(k{K1} {ts[K1]*1000:7.1f} ms, k{K2} {ts[K2]*1000:7.1f} ms, "
              f"compile {tc:5.1f}s)", flush=True)

    # ---- elementwise roofline: one f32 pass over a (N, Nh) plane ----------
    def b_ew(s):
        return jnp.sum(bh * s)

    run("roofline_ew", b_ew)

    # ---- slicing (XLA) ------------------------------------------------------
    def b_slice(s):
        sl, sc = _slice_pair_real(bh * (1 + s), bl, prof.nsl_data,
                                  rowwise=True)
        return (jnp.sum(sl.astype(jnp.int32)).astype(jnp.float32)
                + jnp.sum(sc))

    run("slice_xla", b_slice)

    # ---- slicing (Pallas single pass) ---------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = ef.NB
    nsl = prof.nsl_data

    def _mk_kernel(nsl):
        def kernel(hi_ref, lo_ref, s_ref, out_ref):
            h = hi_ref[:, :]
            l = lo_ref[:, :]
            sc0 = s_ref[:, :]
            h2 = h + l
            l2 = l - (h2 - h)
            r = h2 / sc0
            for q in range(nsl):
                sc = np.float32(2.0 ** (NB * (q + 1)))
                p = jnp.round(r * sc)
                out_ref[q, :, :] = p.astype(jnp.int8)
                r = r - p / sc
                if q == 3:
                    r = r + l2 / sc0
        return kernel

    def slice_pallas(hi, lo, nsl, rb=256):
        n0, n1 = hi.shape
        pad1 = (-n1) % 128
        pad0 = (-n0) % rb
        hi = jnp.pad(hi, ((0, pad0), (0, pad1)))
        lo = jnp.pad(lo, ((0, pad0), (0, pad1)))
        s = ef._pow2ceil_scalar(jnp.max(jnp.abs(hi), axis=-1, keepdims=True))
        n0p, n1p = hi.shape
        nb = n0p // rb
        call = pl.pallas_call(
            _mk_kernel(nsl),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nsl, rb, n1p), jnp.int8),
        )
        blocks = jax.lax.map(
            lambda t: call(*t),
            (hi.reshape(nb, rb, n1p), lo.reshape(nb, rb, n1p),
             jnp.broadcast_to(s.reshape(nb, rb, 1),
                              (nb, rb, 128))[:, :, :1]))
        sl = jnp.moveaxis(blocks, 1, 0).reshape(nsl, n0p, n1p)
        return sl[:, :n0, :n1], s[:n0]

    def b_slice_pl(s):
        sl, sc = slice_pallas(bh * (1 + s), bl, nsl)
        return (jnp.sum(sl.astype(jnp.int32)).astype(jnp.float32)
                + jnp.sum(sc))

    try:
        run("slice_pallas", b_slice_pl)
    except Exception as e:
        print(f"  slice_pallas FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- pair Hadamard -------------------------------------------------------
    def b_had(s):
        A = CPair(bh * (1 + s), bl, bh, bl)
        B = CPair(bh, bl, bh * (1 - s), bl)
        H = _pair_hadamard_conj(A, B)
        return (jnp.sum(jnp.abs(H.rh)) + jnp.sum(jnp.abs(H.ih))
                ).astype(jnp.float32)

    run("had", b_had)

    # ---- deep dot vs E1 (data pre-sliced inside; slicing cost separate) ----
    E0, E1 = _corr_emats(N, N, 16, 16, half=True)
    w_r, s_r = _static_slices_for(E1.real, nsl=prof.nsl_static)
    w_i, s_i = _static_slices_for(E1.imag, nsl=prof.nsl_static)
    dsl0 = jnp.asarray(rng.integers(-33, 34, (prof.nsl_data, N, Nh)),
                       jnp.int8)

    def b_dot(s):
        outs = _sliced_dot_multi(dsl0, s + 1.0, [w_r, w_i], [s_r, s_i],
                                 False, E1.shape[1], kmax=prof.kmax)
        return sum(jnp.sum(jnp.abs(h)) + jnp.sum(jnp.abs(l))
                   for h, l in outs).astype(jnp.float32)

    run("dot_E1", b_dot)

    # ---- one complex axis transform (axis-0 leg) ----------------------------
    def b_dft(s):
        z = exact_dft_axis(CPair(jnp.swapaxes(bh * (1 + s), 0, 1),
                                 jnp.swapaxes(bl, 0, 1),
                                 jnp.swapaxes(bh, 0, 1),
                                 jnp.swapaxes(bl, 0, 1)), N, prof=prof)
        return (jnp.sum(jnp.abs(z.rh)) + jnp.sum(jnp.abs(z.ih))
                ).astype(jnp.float32)

    run("dftax_c", b_dft)

    # ---- forward real axis transform with half_out (axis-1 leg) ------------
    bfh = jnp.pad(bh, ((0, 0), (0, N - Nh)))
    bfl = jnp.pad(bl, ((0, 0), (0, N - Nh)))

    def b_dft_r(s):
        z = exact_dft_axis(CPair(bfh * (1 + s), bfl, None, None), N,
                           half_out=True, prof=prof)
        return (jnp.sum(jnp.abs(z.rh)) + jnp.sum(jnp.abs(z.ih))
                ).astype(jnp.float32)

    run("dftax_r_half", b_dft_r)

    # ---- padded full-width real inverse vs half-input inverse ---------------
    def b_inv_pad(s):
        zp = CPair(jnp.pad(bh * (1 + s), ((0, 0), (0, N - Nh))),
                   jnp.pad(bl, ((0, 0), (0, N - Nh))),
                   jnp.pad(bh, ((0, 0), (0, N - Nh))),
                   jnp.pad(bl, ((0, 0), (0, N - Nh))))
        y = exact_dft_axis(zp, N, inverse=True, real_out=True, prof=prof)
        return jnp.sum(jnp.abs(y.rh)).astype(jnp.float32)

    run("inv_pad_full", b_inv_pad)

    def b_inv_half(s):
        y = exact_idft_halfin_real(
            CPair(bh * (1 + s), bl, bh, bl), N, prof=prof)
        return jnp.sum(jnp.abs(y.rh)).astype(jnp.float32)

    run("inv_halfin", b_inv_half)


if __name__ == "__main__":
    main()
