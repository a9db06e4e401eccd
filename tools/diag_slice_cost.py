"""Where do the sliced-engine milliseconds go? Slicing vs Hadamard vs dots.

Times, each as its own jit (scalar-reduce fetch, axon-safe), the components
of the exact windowed-correlation / pair-FFT pipeline at 4K half-spectrum
shapes, plus a prototype single-pass Pallas slicing kernel:

  slice_xla     _slice_pair_real (nsl=8, rowwise) on one (4096, 2049) pair
  slice_pallas  same op as ONE pass over the data (Pallas, JAX-level blocks)
  had           _pair_hadamard_conj of two complex (4096, 2049) CPairs
  dot_E1        _sliced_dot_multi deep path: pre-sliced data vs E1 parts
  corr4         one exact_corr_window chunk (4 pairs) end-to-end
  dftax         exact_dft_axis over N0 of a complex (2049, 4096)-pair
  roofline      plain bf16 matmul + f32 elementwise copy of the same bytes

Run: python tools/diag_slice_cost.py [N [reps]]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from sfft_tpu.utils import warmup

    warmup.start_device_warmup()

    import jax
    import jax.numpy as jnp

    from sfft_tpu.core import exact_fft as ef
    from sfft_tpu.core.exact_fft import (CPair, SliceProfile, _corr_emats,
                                         _pair_hadamard_conj,
                                         _slice_pair_real, _sliced_dot_multi,
                                         _static_slices_for, exact_corr_window,
                                         exact_dft_axis)

    print(f"platform: {jax.default_backend()}, N={N}", flush=True)
    Nh = N // 2 + 1
    prof = SliceProfile(8, 7, 6)
    rng = np.random.default_rng(0)

    def mk_pair(shape, scale=1.0):
        v = rng.normal(0, scale, shape)
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo)

    def timeit(tag, fn, *args):
        t0 = time.time()
        compiled = jax.jit(fn).lower(*args).compile()
        t_comp = time.time() - t0
        try:
            ma = compiled.memory_analysis()
            extra = (f" code {ma.generated_code_size_in_bytes/1e6:6.1f} MB "
                     f"temp {ma.temp_size_in_bytes/1e6:8.1f} MB")
        except Exception:
            extra = ""
        out = compiled(*args)
        float(np.asarray(out))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = compiled(*args)
            float(np.asarray(out))
            ts.append(time.time() - t0)
        print(f"  {tag:14s} {min(ts)*1000:8.2f} ms  (compile {t_comp:5.1f}s)"
              f"{extra}", flush=True)
        return min(ts)

    # ---- slicing, XLA form --------------------------------------------------
    hi, lo = mk_pair((N, Nh), 1.0)

    def f_slice(hi, lo):
        sl, s = _slice_pair_real(hi, lo, prof.nsl_data, rowwise=True)
        return jnp.sum(sl.astype(jnp.int32)).astype(jnp.float32) + jnp.sum(s)

    timeit("slice_xla", f_slice, hi, lo)

    # ---- slicing, prototype Pallas single pass ------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = ef.NB
    nsl = prof.nsl_data

    def _mk_kernel(nsl):
        def kernel(hi_ref, lo_ref, s_ref, out_ref):
            h = hi_ref[:, :]
            l = lo_ref[:, :]
            s = s_ref[:, :]
            # canonicalize (fast TwoSum: |hi| >= |lo| by construction)
            h2 = h + l
            l2 = l - (h2 - h)
            r = h2 / s
            for q in range(nsl):
                sc = np.float32(2.0 ** (NB * (q + 1)))
                p = jnp.round(r * sc)
                out_ref[q, :, :] = p.astype(jnp.int8)
                r = r - p / sc
                if q == 3:
                    r = r + l2 / s
        return kernel

    def slice_pallas(hi, lo, nsl, rb=256):
        n0, n1 = hi.shape
        pad1 = (-n1) % 128
        pad0 = (-n0) % rb
        hi = jnp.pad(hi, ((0, pad0), (0, pad1)))
        lo = jnp.pad(lo, ((0, pad0), (0, pad1)))
        s = ef._pow2ceil_scalar(
            jnp.max(jnp.abs(hi), axis=-1, keepdims=True))      # (n0p, 1)
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
             jnp.broadcast_to(s.reshape(nb, rb, 1), (nb, rb, 128))[:, :, :1]))
        sl = jnp.moveaxis(blocks, 1, 0).reshape(nsl, n0p, n1p)
        return sl[:, :n0, :n1], s[:n0]

    def f_slice_pl(hi, lo):
        sl, s = slice_pallas(hi, lo, nsl)
        return jnp.sum(sl.astype(jnp.int32)).astype(jnp.float32) + jnp.sum(s)

    try:
        timeit("slice_pallas", f_slice_pl, hi, lo)
        # equivalence vs the XLA slicing
        a = jax.jit(lambda h, l: _slice_pair_real(h, l, nsl, rowwise=True)[0]
                    .astype(jnp.int32).sum())(hi, lo)
        b = jax.jit(lambda h, l: slice_pallas(h, l, nsl)[0]
                    .astype(jnp.int32).sum())(hi, lo)
        print(f"  slice sum check: xla {int(a)} pallas {int(b)} "
              f"{'OK' if int(a) == int(b) else 'MISMATCH'}", flush=True)
    except Exception as e:
        print(f"  slice_pallas FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- Hadamard -----------------------------------------------------------
    arh, arl = mk_pair((N, Nh))
    aih, ail = mk_pair((N, Nh))
    brh, brl = mk_pair((N, Nh))
    bih, bil = mk_pair((N, Nh))

    def f_had(arh, arl, aih, ail, brh, brl, bih, bil):
        H = _pair_hadamard_conj(CPair(arh, arl, aih, ail),
                                CPair(brh, brl, bih, bil))
        return (jnp.sum(jnp.abs(H.rh)) + jnp.sum(jnp.abs(H.ih))
                ).astype(jnp.float32)

    timeit("had", f_had, arh, arl, aih, ail, brh, brl, bih, bil)

    # ---- deep dot vs E1 parts (data pre-sliced; excludes slicing) -----------
    E0, E1 = _corr_emats(N, N, 16, 16, half=True)
    w_r, s_r = _static_slices_for(E1.real, nsl=prof.nsl_static)
    w_i, s_i = _static_slices_for(E1.imag, nsl=prof.nsl_static)
    dsl = jnp.asarray(rng.integers(-33, 34, (prof.nsl_data, N, Nh)), jnp.int8)
    sd = jnp.float32(1.0)

    def f_dot(dsl, sd):
        outs = _sliced_dot_multi(dsl, sd, [w_r, w_i], [s_r, s_i],
                                 False, E1.shape[1], kmax=prof.kmax)
        return sum(jnp.sum(jnp.abs(h)) + jnp.sum(jnp.abs(l))
                   for h, l in outs).astype(jnp.float32)

    timeit("dot_E1", f_dot, dsl, sd)

    # ---- one corr chunk of 4 pairs end-to-end -------------------------------
    spec = CPair(*(jnp.stack([x] * 3) for x in (arh, arl, aih, ail)))

    def f_corr(rh, rl, ih, il):
        sp = CPair(rh, rl, ih, il)
        ia = np.array([0, 0, 1, 2])
        jb = np.array([0, 1, 2, 0])
        cc = exact_corr_window(sp, sp, N, N, 16, 16, pairs=(ia, jb),
                               prof=prof, chunk=4)
        return jnp.sum(jnp.abs(cc)).astype(jnp.float32)

    timeit("corr4", f_corr, spec.rh, spec.rl, spec.ih, spec.il)

    # ---- one complex axis transform (the axis-0 leg of fft/ifft) ------------
    crh, crl = mk_pair((Nh, N))
    cih, cil = mk_pair((Nh, N))

    def f_dft(rh, rl, ih, il):
        z = exact_dft_axis(CPair(rh, rl, ih, il), N, prof=prof)
        return (jnp.sum(jnp.abs(z.rh)) + jnp.sum(jnp.abs(z.ih))
                ).astype(jnp.float32)

    timeit("dftax", f_dft, crh, crl, cih, cil)

    # ---- rooflines -----------------------------------------------------------
    xb = jnp.asarray(rng.normal(0, 1, (N, N)).astype(np.float32))

    def f_copy(x):
        return jnp.sum(x * np.float32(1.0000001)).astype(jnp.float32)

    timeit("roofline_ew", f_copy, xb)

    a8 = jnp.asarray(rng.integers(-100, 100, (N, Nh)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-100, 100, (Nh, 896)), jnp.int8)

    def f_mm(a, b):
        return jnp.sum(jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)).astype(jnp.float32)

    timeit("roofline_i8mm", f_mm, a8, b8)


if __name__ == "__main__":
    main()
