"""Micro-breakdown of the exact contract solve at NEQ~1740 (383 ms measured
in tools/diag_stages.py — second-largest stage of the 4K contract step).

Times on TPU: factor only; factor + one blocked solve; full _exact_solve
(<=4 refinement iterations); variants with nb=512 and iters=2.

Run: python tools/diag_solve.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(tag, fn, *args, n_rep=3):
    import jax.numpy as jnp

    compiled = fn.lower(*args).compile()
    out = compiled(*args)
    float(np.asarray(jnp.sum(jnp.abs(out))))
    ts = []
    for _ in range(n_rep):
        t0 = time.time()
        out = compiled(*args)
        float(np.asarray(jnp.sum(jnp.abs(out))))
        ts.append(time.time() - t0)
    print(f"  {tag:28s} {min(ts)*1000:8.1f} ms", flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from sfft_tpu.core import solve as sv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1740
    rng = np.random.default_rng(0)
    # SPD with cond ~3e8 and wild row scales (bench-like after raw assembly)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    d = np.logspace(0, -8.5, n)
    A = (Q * d) @ Q.T
    s = np.exp(rng.normal(0, 3, n))
    A = A * s[:, None] * s[None, :]
    b = A @ rng.normal(size=n)
    Ad = jax.device_put(jnp.asarray(A))
    bd = jax.device_put(jnp.asarray(b))
    print(f"n={n}", flush=True)

    hp = jax.lax.Precision.HIGHEST

    def eq(A, b):
        d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A)) + 1e-300)
        return A * d[:, None] * d[None, :], b * d, d

    timeit("factor nb=256", jax.jit(
        lambda A, b: sv._blocked_cholesky(eq(A, b)[0], nb=256,
                                          precision=hp).sum()), Ad, bd)
    timeit("factor nb=512", jax.jit(
        lambda A, b: sv._blocked_cholesky(eq(A, b)[0], nb=512,
                                          precision=hp).sum()), Ad, bd)
    timeit("factor nb=256 SLICED", jax.jit(
        lambda A, b: sv._blocked_cholesky(eq(A, b)[0], nb=256, precision=hp,
                                          trailing="sliced").sum()), Ad, bd)
    timeit("factor nb=512 SLICED", jax.jit(
        lambda A, b: sv._blocked_cholesky(eq(A, b)[0], nb=512, precision=hp,
                                          trailing="sliced").sum()), Ad, bd)
    timeit("sliced syrk 1484", jax.jit(
        lambda A, b: sv.sliced_exact_dot(A[:1484, :256]).sum()), Ad, bd)
    timeit("HIGHEST syrk 1484", jax.jit(
        lambda A, b: jnp.dot(A[:1484, :256], A[:1484, :256].T,
                             precision=hp).sum()), Ad, bd)
    timeit("lib chol f64 256", jax.jit(
        lambda A, b: jnp.linalg.cholesky(
            eq(A, b)[0][:256, :256]).sum()), Ad, bd)
    timeit("lib trisolve panel", jax.jit(
        lambda A, b: jax.scipy.linalg.solve_triangular(
            jnp.linalg.cholesky(eq(A, b)[0][:256, :256]),
            A[:256, 256:].astype(A.dtype), lower=True).sum()), Ad, bd)

    def fsolve(A, b, nb):
        As, bs, d = eq(A, b)
        L = sv._blocked_cholesky(As, nb=nb, precision=hp)
        y = sv._blocked_trisolve(L, bs, lower=True, nb=nb)
        x = sv._blocked_trisolve(L.T, y, lower=False, nb=nb)
        return (x * d).sum()

    timeit("factor+1solve nb=256", jax.jit(lambda A, b: fsolve(A, b, 256)),
           Ad, bd)
    timeit("full exact (default)", jax.jit(
        lambda A, b: sv._exact_solve(A, b).sum()), Ad, bd)
    timeit("full exact (iters=2)", jax.jit(
        lambda A, b: sv._exact_solve(A, b, iters=2).sum()), Ad, bd)
    timeit("refined (fast mode)", jax.jit(
        lambda A, b: sv._refined_solve(A, b).sum()), Ad, bd)

    def tri_inv_solve(A, b):
        As, bs, d = eq(A, b)
        hp = jax.lax.Precision.HIGHEST
        L = sv._blocked_cholesky(As, precision=hp, trailing="sliced")
        Dinv = sv._diag_block_inverses(L)
        Li = sv._tri_inverse_blocked(L, Dinv)
        x = jnp.dot(Li.T, jnp.dot(Li, bs, precision=hp), precision=hp)
        for _ in range(2):
            r = bs - jnp.dot(As, x, precision=hp)
            x = x + jnp.dot(Li.T, jnp.dot(Li, r, precision=hp), precision=hp)
        return (x * d).sum()

    timeit("sliced chol+Linv+2ref", jax.jit(tri_inv_solve), Ad, bd)

    # accuracy cross-check of iters=2 vs 4 (CPU oracle)
    x4 = np.asarray(sv._exact_solve(Ad, bd))
    x2 = np.asarray(sv._exact_solve(Ad, bd, iters=2))
    xo = np.linalg.solve(A, b)
    sc = np.max(np.abs(xo))
    print(f"  iters=4 vs LAPACK max rel {np.max(np.abs(x4-xo))/sc:.2e}",
          flush=True)
    print(f"  iters=2 vs LAPACK max rel {np.max(np.abs(x2-xo))/sc:.2e}",
          flush=True)


if __name__ == "__main__":
    main()
