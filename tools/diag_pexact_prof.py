"""Profile sweep of the peeled+sliced (pexact) contract engine on hardware.

For each SliceProfile (nsl_data, nsl_static, kmax) this times the fused 4K
solve+subtract step (best-of-5 warm) and measures parity against the cached
refined CPU f64 oracle — the same wall/parity pair bench.py certifies the
named modes with. Purpose: find the cheapest profile that still holds the
~1e-7 contract-grade parity at the bench pair's cond_eq ~2.9e8, i.e. the
candidate for closing the VERDICT r4 #1 "contract 4K <= ~650 ms" gap.

Usage: python tools/diag_pexact_prof.py [n [w [prof1 prof2 ...]]]
       profiles as comma triples, e.g. 8,7,6 7,7,5 7,6,5 6,6,5
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    profs = [tuple(int(x) for x in p.split(",")) for p in sys.argv[3:]] or [
        (8, 7, 6), (7, 7, 5), (7, 6, 5), (6, 6, 5)]

    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    from bench import build_step, cpu_oracle, make_pair, parity, time_mode
    from sfft_tpu.config import make_config

    import jax.numpy as jnp

    log(f"platform: {jax.default_backend()}, devices: {jax.devices()}")
    I, J = make_pair(n)
    sol_cpu, diff_cpu = cpu_oracle(w, n, I, J, log)
    log(f"session attach: {wu.wait():.1f}s (overlapped with oracle load)")
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))

    rows = []
    for prof in profs:
        tag = f"pexact{prof}"
        cfg = make_config(n, n, w, dtype="float64", greek_chunk=0,
                          greek_backend="pexact", fdiff_backend="pexact",
                          solver="exact", pexact_prof=prof)
        t0 = time.time()
        fn = build_step(cfg)
        t, compiled, (t_comp, warm_hit) = time_mode(tag, fn, Id, Jd, log)
        sol_err, diff_err, _ = parity(tag, compiled, Id, Jd, sol_cpu,
                                      diff_cpu, log)
        rows.append({"prof": list(prof), "wall_ms": round(t * 1000, 1),
                     "compile_s": round(t_comp, 1), "cache_hit": warm_hit,
                     "sol_max_rel_err": float(f"{sol_err:.3e}"),
                     "diff_rms_err": float(f"{diff_err:.3e}"),
                     "total_s": round(time.time() - t0, 1)})
        del compiled, fn

    print(json.dumps({"n": n, "w": w, "rows": rows}))


if __name__ == "__main__":
    main()
