"""Decompose the contract first-exec cost (87-188 s observed on axon):
const-table H2D sync vs executable/program first-dispatch load.

Run fresh: python tools/diag_firstexec.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    t_start = time.time()
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    import jax.numpy as jnp

    from bench import build_step, make_pair
    from sfft_tpu.config import make_config

    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    # sync the input upload with a tiny reduce so it doesn't pollute later
    float(np.asarray(jnp.sum(Id[:2, :2] + Jd[:2, :2])))
    t0 = time.time()
    fn = build_step(cfg)
    compiled = fn.lower(Id, Jd).compile()
    t1 = time.time()
    print(f"compile(+const device_put issue): {t1-t0:.1f}s", flush=True)

    consts = compiled._consts
    total = 0
    by_dtype = {}
    for c in consts:
        nb = c.size * c.dtype.itemsize
        total += nb
        by_dtype[str(c.dtype)] = by_dtype.get(str(c.dtype), 0) + nb
    print(f"consts: {len(consts)} arrays, {total/1e6:.1f} MB total, "
          f"by dtype: { {k: round(v/1e6,1) for k,v in by_dtype.items()} }",
          flush=True)

    # sync all const transfers: a tiny program consuming one element of each
    t0 = time.time()

    def touch(cs):
        return sum(c.ravel()[0].astype(jnp.float32) for c in cs)

    tc = jax.jit(touch).lower(consts).compile()
    t1 = time.time()
    float(np.asarray(tc(consts)))
    t2 = time.time()
    print(f"const sync: touch-compile {t1-t0:.1f}s, "
          f"H2D sync {t2-t1:.1f}s", flush=True)

    # now the first dispatch of the big program (consts already resident)
    t0 = time.time()
    out = np.asarray(compiled(Id, Jd)[0])
    t1 = time.time()
    print(f"first dispatch (consts resident): {t1-t0:.1f}s; rms {out[0]:.4f}",
          flush=True)
    ts = []
    for _ in range(3):
        ta = time.time()
        out = np.asarray(compiled(Id, Jd)[0])
        ts.append(time.time() - ta)
    print(f"steady: {min(ts)*1000:.1f} ms; total since start "
          f"{time.time()-t_start:.1f}s", flush=True)


if __name__ == "__main__":
    main()
