"""Bisect the const-args steady-state overhead at 2048^2: which constants
cost per-call time when passed as runtime args instead of embedded?

Variants: A plain jit (all embedded)  B all consts as args (jitconst)
          C only consts < 64 KB as args, big ones re-embedded

Run: python -u tools/diag_bisect_consts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def steady(fn, args, nrep=5):
    out = np.asarray(fn(*args)[0] if isinstance(fn(*args), tuple) else fn(*args))
    ts = []
    for _ in range(nrep):
        t0 = time.time()
        out = np.asarray(fn(*args)[0] if isinstance(fn(*args), tuple) else fn(*args))
        ts.append(time.time() - t0)
    return min(ts), float(out if np.ndim(out) == 0 else out.ravel()[0])


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sfft_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from jax.core import eval_jaxpr

    from bench import make_pair
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import solve_and_subtract_fn

    n = 2048
    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    log(f"platform {jax.default_backend()} n={n}")
    step = solve_and_subtract_fn(cfg)

    def f(I, J):
        sol, diff = step(I, J, I, J)
        return jnp.sqrt(jnp.mean(diff.astype(jnp.float32) ** 2))

    I, J = make_pair(n, seed=3)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    float(np.asarray(jnp.sum(Id)))

    closed = jax.make_jaxpr(f)(Id, Jd)
    jaxpr = closed.jaxpr
    consts = closed.consts
    sizes = [np.asarray(c).nbytes for c in consts]
    log(f"{len(consts)} consts, {sum(sizes)/1e6:.1f} MB total, "
        f"{sum(s for s in sizes if s >= 65536)/1e6:.1f} MB in >=64KB")

    # B: all consts as args
    consts_d = [jax.device_put(c) for c in consts]

    def run_all(cs, a, b):
        return eval_jaxpr(jaxpr, cs, a, b)[0]

    fb = jax.jit(run_all)
    t0 = time.time()
    tb, outb = steady(lambda a, b: fb(consts_d, a, b), (Id, Jd))
    log(f"B all-args: setup {time.time()-t0:.0f}s steady {tb*1000:.0f}ms rms {outb:.4f}")

    # C: only small consts as args; big ones recaptured as literals
    big_idx = [i for i, s in enumerate(sizes) if s >= 65536]
    small_idx = [i for i, s in enumerate(sizes) if s < 65536]
    big_np = [np.asarray(consts[i]) for i in big_idx]
    small_d = [consts_d[i] for i in small_idx]

    def run_small(cs_small, a, b):
        cs = [None] * len(consts)
        for k, i in enumerate(small_idx):
            cs[i] = cs_small[k]
        for k, i in enumerate(big_idx):
            cs[i] = jnp.asarray(big_np[k])
        return eval_jaxpr(jaxpr, cs, a, b)[0]

    fc = jax.jit(run_small)
    t0 = time.time()
    tc, outc = steady(lambda a, b: fc(small_d, a, b), (Id, Jd))
    log(f"C small-args/big-embedded: setup {time.time()-t0:.0f}s "
        f"steady {tc*1000:.0f}ms rms {outc:.4f}")

    # A: plain jit, everything embedded
    fa = jax.jit(f)
    t0 = time.time()
    ta, outa = steady(fa, (Id, Jd))
    log(f"A embedded: setup {time.time()-t0:.0f}s steady {ta*1000:.0f}ms rms {outa:.4f}")


if __name__ == "__main__":
    main()
