"""Accuracy sweep for exact-engine slice counts (VERDICT r2 #3 headroom).

DESIGN.md lists NSL 9->8 / KMAX 8->7 as unexploited speed headroom for the
contract engine. The contract needs ~1e-13 norm-wise table accuracy (1e-13
table noise -> 3e-7 solution error at the bench conditioning). This sweep
measures windowed-correlation table error vs the f64 oracle for candidate
(NSL_DATA, NSL_STATIC, KMAX) settings on a 512^2 synthetic pair, CPU.

Run: python tools/diag_slice_tuning.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sfft_tpu.core import exact_fft as ef

    n = 512
    w = 8
    rng = np.random.default_rng(3)
    # bench-like content: smooth gradient + stars + noise, basis-weighted
    from bench import make_pair
    I, J = make_pair(n, seed=1)
    xs = np.linspace(0, 1, n)
    planes = np.stack([
        I, I * xs[:, None], I * xs[None, :] ** 2, J,
    ])

    # f64 oracle: full correlations via numpy FFT
    spec = np.fft.fft2(planes)
    oracle = {}
    ia, jb = np.triu_indices(planes.shape[0])
    lag = np.arange(-2 * w, 2 * w + 1)
    for a, b in zip(ia, jb):
        H = spec[a] * np.conj(spec[b])
        # correlation theorem: ifft2(A^ conj(B^))[d] = sum_x A[x+d] B[x],
        # so CC(A,B)[rho] = sum_x A[x] B[x+rho] = ifft2(H)[-rho]
        cc = np.real(np.fft.ifft2(H))
        oracle[(a, b)] = cc[np.ix_((-lag) % n, (-lag) % n)]

    combos = [(9, 9, 8), (8, 9, 7), (8, 8, 7), (8, 8, 8), (9, 9, 7),
              (8, 9, 8), (7, 8, 7)]
    for nsl_d, nsl_s, kmax in combos:
        ef.NSL_DATA = nsl_d
        ef.NSL_STATIC = nsl_s
        ef.KMAX = kmax
        ef._dft_stage_mats.cache_clear()
        ef._corr_emats.cache_clear()

        t0 = time.time()

        @jax.jit
        def tables(P):
            sp = ef.exact_fft2_pair(P, half=True)
            return ef.exact_corr_window(sp, sp, n, n, 2 * w, 2 * w,
                                        symmetric=True)

        out = np.asarray(tables(jnp.asarray(planes)))
        dt = time.time() - t0
        errs = []
        for a, b in zip(ia, jb):
            ref = oracle[(a, b)]
            scale = np.max(np.abs(ref))
            errs.append(np.max(np.abs(out[a, b] - ref)) / scale)
        print(f"NSL_DATA={nsl_d} NSL_STATIC={nsl_s} KMAX={kmax}: "
              f"max rel table err {max(errs):.3e}  ({dt:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
