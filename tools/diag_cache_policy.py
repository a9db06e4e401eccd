"""Cold-start policy A/B on axon: persistent compile cache ON (hit) vs OFF.

Observed r3: with a local cache HIT the first dispatch pays an executable
upload at ~0.1-1 MB/s (87-1388 s measured). Hypothesis: with the cache OFF,
the (small) HLO goes to the axon service, compiles server-side, and the
executable never crosses the tunnel -> first exec is fast and the total
cold start is just the server compile.

Run: python tools/diag_cache_policy.py {on|off} [n]
Prints one JSON line with import/trace-compile/first-exec/total seconds.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "off"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    t_start = time.time()
    import jax

    jax.config.update("jax_enable_x64", True)
    if mode == "on":
        from sfft_tpu.utils.cache import setup_compile_cache

        setup_compile_cache()
    import jax.numpy as jnp

    from bench import build_step, make_pair
    from sfft_tpu.config import make_config

    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))
    t0 = time.time()
    fn = build_step(cfg)
    lowered = fn.lower(Id, Jd)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = np.asarray(compiled(Id, Jd)[0])
    t3 = time.time()
    ts = []
    for _ in range(3):
        ta = time.time()
        out = np.asarray(compiled(Id, Jd)[0])
        ts.append(time.time() - ta)
    print(json.dumps(dict(
        mode=mode, n=n,
        import_s=round(t0 - t_start, 1), trace_s=round(t1 - t0, 1),
        compile_s=round(t2 - t1, 1), first_exec_s=round(t3 - t2, 1),
        total_s=round(t3 - t_start, 1), steady_ms=round(min(ts) * 1000, 1),
        rms=float(out[0]))))


if __name__ == "__main__":
    main()
