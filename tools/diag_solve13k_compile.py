"""Which piece of the new 13k solve costs 798 s of compile?
Compiles each component jit separately at n=13207 and times .lower().compile().

Run: python tools/diag_solve13k_compile.py [n]
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
    import jax.numpy as jnp

    from sfft_tpu.core import solve as sv

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 13207
    A = jax.ShapeDtypeStruct((n, n), jnp.float64)
    b = jax.ShapeDtypeStruct((n,), jnp.float64)
    d = jax.ShapeDtypeStruct((n,), jnp.float64)
    L32 = jax.ShapeDtypeStruct((n, n), jnp.float32)
    nsl = sv._RESID_NSL
    Asl = jax.ShapeDtypeStruct((nsl * n, n), jnp.int8)
    sa = jax.ShapeDtypeStruct((n, 1), jnp.float32)

    def t(tag, fn, *args):
        t0 = time.time()
        jax.jit(fn).lower(*args).compile()
        print(f"  {tag:22s} compile {time.time()-t0:7.1f}s", flush=True)

    t("setup (slice A)", lambda A, d: sv._sliced_residual_setup(A, d)[1], A, d)
    t("tri_inverse_f32", sv._tri_inverse_f32, L32)
    t("sliced_matvec", sv._sliced_matvec, Asl, sa, b)
    t("chol32", lambda M: jnp.linalg.cholesky(M), L32)

    def loop_only(Asl_flat, sa, bs, Li32):
        def f32_solve(r):
            y = jnp.dot(Li32, r.astype(jnp.float32))
            return jnp.dot(Li32.T, y).astype(bs.dtype)

        x = f32_solve(bs)
        bnorm = jnp.linalg.norm(bs)

        def body(state):
            k, x, _ = state
            r = bs - sv._sliced_matvec(Asl_flat, sa, x)
            return k + 1, x + f32_solve(r), jnp.linalg.norm(r)

        def cond(state):
            k, _, rn = state
            return jnp.logical_and(k < 12, rn > 1e-15 * bnorm)

        _, x, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x, bnorm))
        return x

    t("refine while_loop", loop_only, Asl, sa, b, L32)
    t("FULL _refined_solve_f64", sv._refined_solve_f64, A, b)


if __name__ == "__main__":
    main()
