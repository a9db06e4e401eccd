"""Measure the contract cold start AFTER the const-lift fix (jitconst).

Run: python -u tools/diag_cold_fixed.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    t_imp = time.time()
    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sfft_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench import build_step, make_pair
    from sfft_tpu.config import make_config

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    log(f"platform: {jax.default_backend()}")
    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    float(np.asarray(jnp.sum(Id)))

    fn = build_step(cfg)
    t0 = time.time()
    lowered = fn.lower(Id, Jd)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    try:
        ma = compiled.memory_analysis()
        log(f"code={ma.generated_code_size_in_bytes/1e6:.1f}MB "
            f"arg={ma.argument_size_in_bytes/1e6:.1f}MB "
            f"tmp={ma.temp_size_in_bytes/1e6:.1f}MB")
    except Exception as e:
        log(f"(memory_analysis: {e})")
    out = np.asarray(compiled(Id, Jd)[0])
    t3 = time.time()
    ts = []
    for _ in range(3):
        ta = time.time()
        out = np.asarray(compiled(Id, Jd)[0])
        ts.append(time.time() - ta)
    log(f"[contract {n}] trace+consts {t1-t0:.1f}s compile {t2-t1:.1f}s "
        f"exec1 {t3-t2:.1f}s steady {min(ts)*1000:.0f}ms diff RMS {out[0]:.4f}")


if __name__ == "__main__":
    main()
