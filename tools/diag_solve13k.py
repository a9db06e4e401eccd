"""Micro-breakdown of the 13k-dof NIRCam contract solve (996 ms of the
~1.5 s step, tools/diag_nircam_stages.py 2026-08-19). Sub-stages, each its
own jit timed by scalar-reduction fetch:

  reduce    _select_rows_cols tweak reduction (13226 -> 13207, f64 copies)
  equil     Jacobi equilibration (two 1.4 GB f64 elementwise passes)
  chol32    f32 cast + library Cholesky
  triinv    _tri_inverse_f32 blocked explicit inverse
  refit     ONE refinement iteration (exact-f64 HIGHEST matvec + 2 f32
            matvecs + norm)
  full      _refined_solve_f64 end to end
  solve_sys full solve_system (reduce + refined + re-extend)

Run on hardware: python tools/diag_solve13k.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(tag, fn, args, n_rep=3):
    import jax.numpy as jnp

    compiled = fn.lower(*args).compile()

    def sync(out):
        leaves = [x for x in (out if isinstance(out, tuple) else (out,))
                  if hasattr(x, "dtype")]
        float(np.asarray(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32)))))
        return out

    out = sync(compiled(*args))
    ts = []
    for _ in range(n_rep):
        t0 = time.time()
        out = sync(compiled(*args))
        ts.append(time.time() - t0)
    print(f"  {tag:10s} {min(ts)*1000:8.1f} ms", flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    import jax.numpy as jnp

    from sfft_tpu.core import solve as sv

    # synthetic SPD system at the NIRCam scale. NOTE the spectrum floor: a
    # dense logspace(0,-7) spectrum at n=13207 is NOT numerically positive
    # definite in f32 (LAPACK f32 Cholesky fails at minor 10707; the TPU
    # factor goes NaN the same way) even though the real regularized NIRCam
    # system at the same cond_eq ~1.1e7 factors fine — spectrum SHAPE, not
    # cond, decides f32-PD-ness. Floor at 1e-5 (cond_eq 1e5, safely inside
    # the production class) so the tool times the CONVERGED path; the real
    # 13k system's wall comes from tools/diag_nircam_stages.py.
    n = 13207
    rng = np.random.default_rng(0)
    print(f"building synthetic SPD n={n} on host...", flush=True)
    # low-rank + diagonal construction (O(n^2)): A = G G^T/k + D
    k = 64
    G = rng.normal(size=(n, k))
    D = np.logspace(0, -5, n)
    A = (G @ G.T) / k + np.diag(D) + 1e-5 * np.eye(n)
    b = A @ rng.normal(size=n)
    wu.wait()
    Ad = jax.device_put(jnp.asarray(A))
    bd = jax.device_put(jnp.asarray(b))
    print("device arrays ready", flush=True)
    hp = jax.lax.Precision.HIGHEST

    def equil(A, b):
        d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A)) + 1e-300)
        return A * d[:, None] * d[None, :], b * d, d

    As, bs, _ = timeit("equil", jax.jit(equil), (Ad, bd))[:3]

    L32 = timeit("chol32", jax.jit(
        lambda M: jnp.linalg.cholesky(M.astype(jnp.float32))), (As,))

    Li32 = timeit("triinv", jax.jit(sv._tri_inverse_f32), (L32,))

    def refit(As, bs, x, Li):
        r = bs - jnp.dot(As, x, precision=hp)
        y = jnp.dot(Li, r.astype(jnp.float32))
        return x + jnp.dot(Li.T, y).astype(bs.dtype), jnp.linalg.norm(r)

    x0 = jnp.zeros_like(bs)
    timeit("refit", jax.jit(refit), (As, bs, x0, Li32))

    def matvec64(As, x):
        return jnp.dot(As, x, precision=hp)

    timeit("matvec64", jax.jit(matvec64), (As, bs))

    def matvec32(Li, r):
        return jnp.dot(Li, r.astype(jnp.float32))

    timeit("matvec32", jax.jit(matvec32), (Li32, bs))

    timeit("full", jax.jit(sv._refined_solve_f64), (Ad, bd))
    timeit("full it4", jax.jit(
        lambda A, b: sv._refined_solve_f64(A, b, iters=4)), (Ad, bd))

    # accuracy: vs CPU LAPACK on the same system
    x = np.asarray(sv._refined_solve_f64(Ad, bd))
    # CPU check would need minutes at 13k; check residual instead
    r = b - A @ x
    print(f"  final relres {np.linalg.norm(r)/np.linalg.norm(b):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
