"""A/B: steady-state cost of consts-as-args vs embedded consts vs
consts-as-args with AUTO input layouts. 1024^2 contract config on TPU.

Run: python -u tools/diag_layout_ab.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def steady(fn, args, nrep=4):
    out = np.asarray(fn(*args)[0])
    ts = []
    for _ in range(nrep):
        t0 = time.time()
        out = np.asarray(fn(*args)[0])
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sfft_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from bench import make_pair
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import solve_and_subtract_fn

    n = 1024
    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    log(f"platform {jax.default_backend()}, backends "
        f"{cfg.greek_backend}/{cfg.fdiff_backend}/{cfg.solver}")
    step = solve_and_subtract_fn(cfg)

    def f(I, J):
        sol, diff = step(I, J, I, J)
        return jnp.sqrt(jnp.mean(diff.astype(jnp.float32) ** 2)), sol

    I, J = make_pair(n, seed=7)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    float(np.asarray(jnp.sum(Id)))

    # --- A: plain jit (embedded consts) ---------------------------------
    t0 = time.time()
    fa = jax.jit(f)
    ta, outa = steady(fa, (Id, Jd))
    log(f"A plain-jit embedded: first-call path {time.time()-t0:.1f}s, "
        f"steady {ta*1000:.0f}ms rms {outa:.4f}")

    # --- B: jitconst (consts as default-layout args) --------------------
    closed = jax.make_jaxpr(f)(Id, Jd)
    from jax.core import eval_jaxpr
    jaxpr = closed.jaxpr
    consts_h = closed.consts
    consts_d = [jax.device_put(c) for c in consts_h]

    def run(cs, *args):
        return tuple(eval_jaxpr(jaxpr, cs, *args))

    t0 = time.time()
    fb = jax.jit(run)
    tb, outb = steady(lambda *a: fb(consts_d, *a), (Id, Jd))
    log(f"B jitconst default-layout: first-call path {time.time()-t0:.1f}s, "
        f"steady {tb*1000:.0f}ms rms {outb:.4f}")

    # --- C: jitconst with AUTO input layouts ----------------------------
    from jax.experimental.layout import Format, Layout

    t0 = time.time()
    fc = jax.jit(run, in_shardings=Format(Layout.AUTO))
    lowered = fc.lower(consts_d, Id, Jd)
    compiled = lowered.compile()
    fmts = compiled.input_formats[0]
    (c_fmts, a_fmts) = fmts
    consts_l = [jax.device_put(c, fmt) for c, fmt in zip(consts_d, c_fmts)]
    args_l = [jax.device_put(a, fmt) for a, fmt in zip((Id, Jd), a_fmts)]
    t1 = time.time()
    tc, outc = steady(lambda *a: compiled(consts_l, *a), tuple(args_l))
    log(f"C jitconst AUTO-layout: compile {t1-t0:.1f}s, "
        f"steady {tc*1000:.0f}ms rms {outc:.4f}")


if __name__ == "__main__":
    main()
