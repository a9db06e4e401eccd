"""Incremental probe: how slowly do EMBEDDED HLO constants reach the TPU at
first dispatch on axon, and does lifting them to arguments (utils/jitconst)
fix it? Prints each step immediately (unbuffered).

Run: python -u tools/diag_consts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe(tag, fn, args, use_lower=True):
    import jax

    t0 = time.time()
    if use_lower:
        c = fn.lower(*args).compile()
    else:
        c = fn
    t1 = time.time()
    out = np.asarray(c(*args))
    t2 = time.time()
    out = np.asarray(c(*args))
    t3 = time.time()
    log(f"[{tag}] compile {t1-t0:.1f}s exec1 {t2-t1:.2f}s exec2 {t3-t2:.3f}s")
    return t2 - t1


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    log(f"platform: {jax.default_backend()}")
    x = jax.device_put(jnp.ones((512, 512)))
    np.asarray(jnp.sum(x))
    log("warmup done")

    rng = np.random.default_rng(0)
    for mb in (1, 8, 32):
        n = int(mb * 1e6 / 8 / 512)
        C = rng.random((n, 512))
        f = jax.jit(lambda v, _C=C: jnp.sum(v[: _C.shape[0]] * jnp.asarray(_C)))
        v = jax.device_put(jnp.ones((n, 512)))
        np.asarray(jnp.sum(v))
        dt = probe(f"const {mb}MB f64 embedded", f, (v,))
        log(f"    -> implied upload rate {mb/max(dt,1e-9):.2f} MB/s")

    # same 32 MB constant, lifted to an argument via jitconst
    from sfft_tpu.utils.jitconst import jit_const_args

    n = int(32 * 1e6 / 8 / 512)
    C = rng.random((n, 512))
    g = jit_const_args(lambda v: jnp.sum(v[: C.shape[0]] * jnp.asarray(C)))
    v = jax.device_put(jnp.ones((n, 512)))
    t0 = time.time()
    lowered = g.lower(v)
    c = lowered.compile()
    t1 = time.time()
    out = np.asarray(c(v))
    t2 = time.time()
    out = np.asarray(c(v))
    t3 = time.time()
    log(f"[const 32MB lifted-to-arg] build+compile {t1-t0:.1f}s "
        f"exec1 {t2-t1:.2f}s exec2 {t3-t2:.3f}s")

    # int8 constant (the exact engine's slice tables are int8)
    C8 = (rng.random((4000, 4096)) * 100).astype(np.int8)   # 16 MB int8
    f8 = jax.jit(lambda v: jnp.sum(
        jnp.dot(v[:64].astype(jnp.int8), jnp.asarray(C8),
                preferred_element_type=jnp.int32).astype(jnp.float32)))
    v8 = jax.device_put(jnp.ones((64, 4000)))
    np.asarray(jnp.sum(v8))
    dt = probe("const 16MB int8 embedded (dot)", f8, (v8,))
    log(f"    -> implied upload rate {16/max(dt,1e-9):.2f} MB/s")


if __name__ == "__main__":
    main()
