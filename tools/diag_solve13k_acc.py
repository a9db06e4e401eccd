"""Is the jitted 13k _refined_solve_f64 result finite + converged on TPU?

CONCLUSION (2026-08-19, on hardware): with the dense logspace(0,-7)
spectrum this system is NOT numerically positive definite in f32 — the f32
Cholesky factor is NaN (87.2M NaN entries), and LAPACK f32 agrees (minor
10707 not PD), so this is a property of the synthetic spectrum, not of the
TPU. The solution comes back all-NaN (visible failure). The real
regularized NIRCam system at the same cond_eq ~1.1e7 factors fine; see
_refined_solve_f64's validity-domain docstring. Kept as the regression
probe for that failure mode.

Run on hardware: python tools/diag_solve13k_acc.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    import jax.numpy as jnp

    from sfft_tpu.core import solve as sv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 13207
    rng = np.random.default_rng(0)
    print(f"building synthetic SPD n={n} on host...", flush=True)
    k = 64
    G = rng.normal(size=(n, k))
    D = np.logspace(0, -7, n)
    A = (G @ G.T) / k + np.diag(D) + 1e-7 * np.eye(n)
    xt = rng.normal(size=n)
    b = A @ xt
    wu.wait()
    Ad = jax.device_put(jnp.asarray(A))
    bd = jax.device_put(jnp.asarray(b))
    print("device arrays ready", flush=True)
    hp = jax.lax.Precision.HIGHEST

    def probe(A, b):
        x = sv._refined_solve_f64(A, b)
        r = b - jnp.dot(A, x, precision=hp)
        return (jnp.sum(jnp.isnan(x)), jnp.linalg.norm(r) / jnp.linalg.norm(b),
                jnp.max(jnp.abs(x)))

    t0 = time.time()
    nnan, relres, xmax = jax.jit(probe)(Ad, bd)
    print(f"probe compile+run {time.time()-t0:.1f}s", flush=True)
    print(f"  jitted: nan count {int(np.asarray(nnan))}, "
          f"relres {float(np.asarray(relres)):.3e}, "
          f"max|x| {float(np.asarray(xmax)):.3e}", flush=True)

    # error vs the known ground truth (construction: b = A @ xt)
    def err_fn(A, b):
        x = sv._refined_solve_f64(A, b)
        xtd = jnp.asarray(xt)
        return jnp.max(jnp.abs(x - xtd)) / jnp.max(jnp.abs(xtd))

    e = float(np.asarray(jax.jit(err_fn)(Ad, bd)))
    print(f"  max-rel err vs ground truth: {e:.3e}", flush=True)

    # where does the f32 factor stand? NaN count of chol32
    def chol_probe(A):
        d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A)) + jnp.finfo(A.dtype).tiny)
        Ah, Asl, sa, chk = sv._sliced_residual_setup(A, d)
        L32 = jnp.linalg.cholesky(Ah)
        Li32 = sv._tri_inverse_f32(L32)
        return (jnp.sum(jnp.isnan(L32)), jnp.sum(jnp.isnan(Li32)))

    nL, nLi = jax.jit(chol_probe)(Ad)
    print(f"  chol32 nan {int(np.asarray(nL))}, triinv nan "
          f"{int(np.asarray(nLi))}", flush=True)


if __name__ == "__main__":
    main()
