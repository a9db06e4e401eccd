"""Size-curve benchmark: subtraction wall time vs image size, contract + fast.

Reproduces the reference's headline speed plot (docs/sfft_subtract_speed.png,
SURVEY.md §6: A100 CuPy f64 ~0.085/0.14/0.40/0.95/1.35 s at
512/1024/2048/3072/4096 squared) on one TPU chip, for both production modes:

  * CONTRACT — exact-grade sliced-int8 pair-FFT engine (f64 parity contract)
  * FAST     — peeled/fft32/refined mixed-precision mode

Prints one table + one JSON line per size. Run on hardware:
    python tools/bench_curve.py            # all sizes
    python tools/bench_curve.py 1024 4096  # subset
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

A100_S = {512: 0.085, 1024: 0.14, 1536: 0.23, 2048: 0.40, 2560: 0.62,
          3072: 0.95, 3584: 1.15, 4096: 1.35}


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    import jax.numpy as jnp
    from bench import make_pair, build_step
    from sfft_tpu.config import make_config

    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 1536, 2048, 2560,
                                               3072, 3584, 4096]
    w = 8
    print(f"platform: {jax.default_backend()}", file=sys.stderr, flush=True)
    rows = []
    for n in sizes:
        I, J = make_pair(n)
        Id = jax.device_put(jnp.asarray(I))
        Jd = jax.device_put(jnp.asarray(J))
        row = {"n": n, "a100_s": A100_S.get(n)}
        # 'contract' = the production default (peeled+sliced pexact since
        # r5); 'unpeeled' = the r1-r4 any-basis raw-sliced engine, kept for
        # curve continuity with the committed r4 numbers. Default mode set
        # = the headline pair; select others via SFFT_CURVE_MODES (comma
        # list) — each (mode, size) program is a separate cold compile on a
        # fresh axon server boot (~5-7 min for exact-solver modes).
        import os as _os

        sel_modes = _os.environ.get("SFFT_CURVE_MODES",
                                    "contract,fast").split(",")
        for tag, over in [
            ("contract", {}),
            ("unpeeled", dict(greek_backend="exact", fdiff_backend="exact",
                              solver="exact")),
            ("balanced", dict(greek_backend="pexact", fdiff_backend="pexact",
                              solver="exact", pexact_prof=(6, 6, 5))),
            ("fast", dict(greek_backend="peeled", fdiff_backend="fft32",
                          solver="refined")),
        ]:
            if tag not in sel_modes:
                continue
            cfg = make_config(n, n, w, dtype="float64", greek_chunk=0, **over)
            fn = build_step(cfg)
            compiled = fn.lower(Id, Jd).compile()
            wu.wait()
            np.asarray(compiled(Id, Jd)[0])   # warm
            # >= 7 reps, median + spread (VERDICT r4 #3: 1-3% margins on
            # min-of-3 are not statistically robust on a shared chip)
            ts = []
            for _ in range(7):
                t0 = time.time()
                np.asarray(compiled(Id, Jd)[0])
                ts.append(time.time() - t0)
            ts = sorted(ts)
            med = ts[len(ts) // 2]
            row[f"{tag}_s"] = round(med, 4)
            row[f"{tag}_min_s"] = round(ts[0], 4)
            row[f"{tag}_max_s"] = round(ts[-1], 4)
            row[f"{tag}_spread_pct"] = round(100 * (ts[-1] - ts[0]) / med, 1)
            print(f"  {n}^2 {tag}: median {med*1000:.1f} ms "
                  f"(min {ts[0]*1000:.1f}, max {ts[-1]*1000:.1f}, "
                  f"spread {row[f'{tag}_spread_pct']}%)",
                  file=sys.stderr, flush=True)
        if row["a100_s"]:
            for tag in ("contract", "unpeeled", "balanced", "fast"):
                if f"{tag}_s" in row:
                    row[f"{tag}_vs_a100"] = round(
                        row["a100_s"] / row[f"{tag}_s"], 2)
        rows.append(row)
        print(json.dumps(row), flush=True)

    hdr = (f"{'size':>6} {'contract':>10} {'unpeeled':>10} {'balanced':>10} "
           f"{'fast':>10} {'A100 f64':>10} {'speedup(c)':>11}")
    print("\n" + hdr, file=sys.stderr)
    for r in rows:
        a = f"{r['a100_s']:.3f}s" if r.get("a100_s") else "-"
        s = f"{r.get('contract_vs_a100', '-')}" if r.get("a100_s") else "-"
        def ms(tag):
            return (f"{r[f'{tag}_s']*1000:>8.0f}ms" if f"{tag}_s" in r
                    else f"{'-':>10}")
        print(f"{r['n']:>6} {ms('contract')} {ms('unpeeled')} {ms('balanced')} "
              f"{ms('fast')} {a:>10} {s:>11}", file=sys.stderr)


if __name__ == "__main__":
    main()
