"""Characterize the fresh-process first-H2D penalty on axon (~80 s observed
for a 268 MB first upload; 52 MB/s afterwards).

Modes:
  tiny  — sync a 4-byte array first, then the 268 MB pair: is the penalty a
          fixed setup cost (tiny pays it) or bytes-proportional (pair pays)?
  overlap — issue the tiny transfer, immediately do the contract compile
          (CPU/server side), THEN sync: does setup overlap with compile?

Run: python tools/diag_firsttouch.py {tiny|overlap} [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

T0 = time.time()


def mark(tag, t_prev):
    t = time.time()
    print(f"  {tag:46s} {t - t_prev:8.1f}s  (t+{t - T0:7.1f}s)", flush=True)
    return t


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    t = T0
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from bench import build_step, make_pair
    from sfft_tpu.config import make_config

    t = mark("imports", t)
    tiny = jax.device_put(jnp.zeros((8,), jnp.float32))
    t = mark("tiny device_put issue", t)
    tsum = jax.jit(jnp.sum)
    ct = tsum.lower(tiny).compile()
    t = mark("tiny-sum compile", t)

    if mode == "tiny":
        float(np.asarray(ct(tiny)))
        t = mark("tiny sync (first touch)", t)
        I, J = make_pair(n)
        t = mark(f"make_pair({n})", t)
        Id = jax.device_put(jnp.asarray(I))
        Jd = jax.device_put(jnp.asarray(J))
        s = jax.jit(lambda a, b: (a[:2, :2] + b[:2, :2]).sum())
        c2 = s.lower(Id, Jd).compile()
        t = mark("pair put issue + sum compile", t)
        float(np.asarray(c2(Id, Jd)))
        t = mark("pair H2D sync (268 MB)", t)
    else:  # overlap
        I, J = make_pair(n)
        t = mark(f"make_pair({n})", t)
        Id = jax.device_put(jnp.asarray(I))
        Jd = jax.device_put(jnp.asarray(J))
        t = mark("pair device_put issue (async)", t)
        cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
        fn = build_step(cfg)
        compiled = fn.lower(Id, Jd).compile()
        t = mark("contract compile(+const puts)", t)
        out = np.asarray(compiled(Id, Jd)[0])
        t = mark(f"first dispatch (rms {out[0]:.4f})", t)
        out = np.asarray(compiled(Id, Jd)[0])
        t = mark("second dispatch", t)
    print(f"total {time.time()-T0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
