"""Micro-breakdown of the exact pair-FFT stage at 4K (the 405 ms item of the
892 ms fused contract step): slicing cost, stage-1 dots, twiddle pair-mul,
stage-2 dots, and the per-axis split — to find where the HBM traffic goes.

Run: python tools/diag_fft_traffic.py [nplanes]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(tag, fn, *args, n_rep=3):
    import jax
    import jax.numpy as jnp

    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
    ts = []
    for _ in range(n_rep):
        t0 = time.time()
        out = compiled(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
        ts.append(time.time() - t0)
    print(f"  {tag:34s} {min(ts)*1000:8.1f} ms", flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from sfft_tpu.core import exact_fft as ef

    P = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    N = 4096
    rng = np.random.default_rng(0)
    X = rng.normal(size=(P, N, N))
    Xd = jax.device_put(jnp.asarray(X))

    def full2d(x):
        sp = ef.exact_fft2_pair(ef.pair_from_f64(x), half=True)
        return tuple(v for v in sp if v is not None)

    timeit(f"full 2D pair-FFT ({P} planes)", full2d, Xd)

    def axis1(x):
        p = ef.pair_from_f64(x)
        y = ef.exact_dft_axis(p, N, half_out=True)
        return tuple(v for v in y if v is not None)

    timeit("axis-1 (real in, half out)", axis1, Xd)

    # slicing only: pair-split + 9 data slices (the per-stage preamble)
    def slicing(x):
        p = ef.pair_from_f64(x)
        sl, s = ef._slice_pair_real(
            p.rh.reshape(P * N, 64, 64), p.rl.reshape(P * N, 64, 64),
            ef.NSL_DATA, rowwise=False, int8=True)
        return sl.astype(jnp.int32).sum(), s

    timeit("pair-split + 9-slice (stage-1 in)", slicing, Xd)

    # stage-1 dots only: slices fixed, contract vs DS (real+imag)
    R, S, DS, DR, tw = ef._dft_stage_mats(N, False)

    def stage1(x):
        p = ef.pair_from_f64(x)
        rs = p.rh.reshape(P * N, S, R)  # (..., a-major fake), shape only
        d = ef.CPair(jnp.swapaxes(rs, -1, -2),
                     jnp.swapaxes(p.rl.reshape(P * N, S, R), -1, -2),
                     None, None)
        out = ef._cmatmul_sliced(d, DS.real.copy(), DS.imag.copy())
        return tuple(v for v in out if v is not None)

    timeit("stage-1 sliced cmatmul (real in)", stage1, Xd)

    def twiddle_only(x):
        p = ef.pair_from_f64(x)
        G = ef.CPair(p.rh.reshape(P * N, R, S), p.rl.reshape(P * N, R, S),
                     p.rh.reshape(P * N, R, S) * 0.5,
                     p.rl.reshape(P * N, R, S) * 0.5)
        U = ef._pair_mul_static(G, tw)
        return tuple(v for v in U if v is not None)

    timeit("twiddle pair-mul (complex)", twiddle_only, Xd)

    def stage2(x):
        p = ef.pair_from_f64(x)
        d = ef.CPair(p.rh.reshape(P * N, S, R), p.rl.reshape(P * N, S, R),
                     p.rh.reshape(P * N, S, R) * 0.5,
                     p.rl.reshape(P * N, S, R) * 0.5)
        Rc = R // 2 + 1
        out = ef._cmatmul_sliced(d, DR.real[:, :Rc].copy(),
                                 DR.imag[:, :Rc].copy())
        return tuple(v for v in out if v is not None)

    timeit("stage-2 sliced cmatmul (cpx, half)", stage2, Xd)


if __name__ == "__main__":
    main()
