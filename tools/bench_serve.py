"""Measure the resident-engine-server path (sfft_tpu/serve.py) on hardware.

The number that matters: a FRESH survey job's time-to-first-difference when a
machine-resident engine server already holds the device session. Without the
server every new process pays the axon session attach (80-350 s, worst 1388 s
— utils/warmup.py); with it a new job is IPC + H2D + compute.

Protocol:
  1. ensure_server() spawns the daemon (it pays the attach, overlapped with
     the warm() compile below).
  2. client.warm(cfg) compiles + first-dispatches the fused 4K contract step
     inside the server.
  3. a FRESH client process (separate Python, no jax backend init) loads the
     pair from disk, connects, runs subtract, writes its wall time — the
     headline "new job" number.
  4. a second in-process subtract gives the steady round-trip number.

Usage: python tools/bench_serve.py [--n 4096] [--mode contract|fast]
       [--socket PATH] [--keep]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--w", type=int, default=8)
    ap.add_argument("--mode", choices=("contract", "fast"), default="contract")
    ap.add_argument("--socket", default="/tmp/sfft_engine_bench.sock")
    ap.add_argument("--keep", action="store_true",
                    help="leave the server running afterwards")
    ap.add_argument("--platform", default=None,
                    help="force server platform (e.g. cpu for a dry run)")
    args = ap.parse_args()

    from bench import make_pair  # the headline bench's synthetic 4K pair
    from sfft_tpu.config import make_config
    from sfft_tpu.serve import EngineClient, ensure_server

    env = dict(os.environ)
    if args.platform:
        env["SFFT_SERVE_PLATFORM"] = args.platform

    t0 = time.time()
    resp = ensure_server(args.socket, spawn_timeout=600.0, env=env)
    attach = "pending" if not resp["warm"] else f"{resp['attach_s']:.1f}s"
    log(f"server up on {args.socket} (pid {resp['pid']}) "
        f"after {time.time()-t0:.1f}s; attach {attach}")

    over = {}
    if args.mode == "fast":
        over = dict(greek_backend="peeled", fdiff_backend="fft32",
                    solver="refined")
    # NOTE: make_config resolves backend defaults from THIS process's
    # platform; pin the contract backends explicitly so a CPU parent steering
    # a TPU server still requests the contract engine.
    if args.mode == "contract":
        over = dict(greek_backend="exact", fdiff_backend="exact",
                    solver="exact")
    cfg = make_config(args.n, args.n, args.w, dtype="float64", **over)

    with EngineClient(args.socket) as c:
        t0 = time.time()
        warm_s = c.warm(cfg)
        log(f"server warm({args.mode} {args.n}^2): {warm_s:.1f}s server-side "
            f"({time.time()-t0:.1f}s wall incl. any attach wait)")

        I, J = make_pair(args.n)
        pair_file = os.path.join(tempfile.gettempdir(),
                                 f"sfft_serve_pair_{args.n}.npz")
        np.savez(pair_file, I=I, J=J)

        # headline: fresh client process, disk -> diff
        script = textwrap.dedent(f"""
            import sys, time, numpy as np
            t0 = time.time()
            sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
            from sfft_tpu.config import make_config
            from sfft_tpu.serve import EngineClient
            cfg = make_config({args.n}, {args.n}, {args.w}, dtype="float64",
                              **{over!r})
            d = np.load({pair_file!r})
            with EngineClient({args.socket!r}) as c:
                sol, diff, _ = c.subtract(d["I"], d["J"], cfg,
                                          diff_dtype="float32")
            rms = float(np.sqrt(np.mean(diff.astype(np.float64) ** 2)))
            print(time.time() - t0, rms)
        """)
        t0 = time.time()
        out = subprocess.run([sys.executable, "-c", script],
                             capture_output=True, text=True, timeout=3600,
                             env=dict(os.environ))
        if out.returncode != 0:
            log(out.stdout + out.stderr)
            raise SystemExit("fresh-client probe failed")
        fresh_s, rms = map(float, out.stdout.split())
        log(f"FRESH-JOB time-to-first-difference via server: {fresh_s:.2f}s "
            f"(outer wall {time.time()-t0:.2f}s), diff RMS {rms:.4f}")

        # steady round trip, same connection
        t0 = time.time()
        _sol, diff, _ = c.subtract(I, J, cfg, diff_dtype="float32")
        steady_s = time.time() - t0
        log(f"steady client round-trip: {steady_s:.2f}s")

        if not args.keep:
            c.shutdown()

    print(json.dumps({
        "metric": f"serve_fresh_job_first_diff_{args.n}_{args.mode}",
        "value": round(fresh_s, 3),
        "unit": "s",
        "extra": {"server_warm_s": round(warm_s, 2),
                  "steady_round_trip_s": round(steady_s, 3),
                  "diff_rms": rms},
    }))


if __name__ == "__main__":
    main()
