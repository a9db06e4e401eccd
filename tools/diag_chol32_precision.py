"""Does the 13k f32 Cholesky breakdown on TPU come from bf16-grade internal
dots? jnp.linalg.cholesky cannot take a precision argument; A/B it under
jax.default_matmul_precision contexts and count NaNs + time it.

Run on hardware: python tools/diag_chol32_precision.py [n]
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

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 13207
    rng = np.random.default_rng(0)
    print(f"building synthetic SPD n={n} on host...", flush=True)
    k = 64
    G = rng.normal(size=(n, k))
    D = np.logspace(0, -7, n)
    A = (G @ G.T) / k + np.diag(D) + 1e-7 * np.eye(n)
    d = 1.0 / np.sqrt(np.diag(A))
    As32 = (A * d[:, None] * d[None, :]).astype(np.float32)
    wu.wait()
    Ad = jax.device_put(jnp.asarray(As32))
    print("device array ready", flush=True)

    for prec in ("bfloat16", "tensorfloat32", "float32"):
        with jax.default_matmul_precision(prec):
            f = jax.jit(jnp.linalg.cholesky).lower(Ad).compile()
        L = f(Ad)
        nnan = int(np.asarray(jnp.sum(jnp.isnan(L))))
        ts = []
        for _ in range(3):
            t0 = time.time()
            L = f(Ad)
            float(np.asarray(jnp.sum(jnp.abs(L[:2, :2]))))
            ts.append(time.time() - t0)
        print(f"  chol32[{prec:14s}] nan {nnan:9d}  {min(ts)*1000:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
