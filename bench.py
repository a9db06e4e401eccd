"""Headline benchmark: 4Kx4K image-pair solve+subtract wall time on one chip.

Baseline (BASELINE.md): reference CuPy SFFT does a 4096^2 pair in ~1.35 s on an
NVIDIA A100 (float64). Target: < 1 s per pair on one TPU chip.

Runs the production TPU config: float64 contract with the peeled
mixed-precision assembly (exact-f64 moments + c64 FFT fluctuation
correlations), f32-LU + f64-refinement solver, c64 FFT difference
construction. Timing is measured with on-device reduction and a scalar fetch
(the axon tunnel's D2H path is ~30 MB/s and block_until_ready does not
synchronize, so naive timing is invalid).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1.0 means faster than the A100 reference.
"""

import json
import sys
import time

import numpy as np

BASELINE_4K_S = 1.35


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    I = 200.0 * (1.0 + 0.2 * xx / n + 0.3 * (yy / n) ** 2)
    k = 2000
    xs = rng.integers(4, n - 4, k)
    ys = rng.integers(4, n - 4, k)
    amps = rng.uniform(100, 2000, k)
    psf = np.array(
        [[0.01, 0.05, 0.1, 0.05, 0.01],
         [0.05, 0.3, 0.6, 0.3, 0.05],
         [0.1, 0.6, 1.0, 0.6, 0.1],
         [0.05, 0.3, 0.6, 0.3, 0.05],
         [0.01, 0.05, 0.1, 0.05, 0.01]]
    )
    for x, y, a in zip(xs, ys, amps):
        I[x - 2 : x + 3, y - 2 : y + 3] += a * psf
    J = 1.1 * I + 5.0 + rng.normal(0, 1.0, (n, n))
    I = I + rng.normal(0, 1.0, (n, n))
    return I, J


def bench_bspline(log):
    import jax
    import jax.numpy as jnp
    from sfft_tpu.io import fits as sfits
    from sfft_tpu.api.bspline import make_bspline_config
    from sfft_tpu.core.engine import solve_and_subtract_fn
    import os

    base = "/root/reference/test/subtract_test_nircam/"
    REFN = "jw01324001001-01324-o001_t001_nircam_clear-f200w_i2d_stamp"
    SCIN = "jw02561001002-02561-o001_t003_nircam_clear-f200w_i2d_stamp"
    if not os.path.exists(base + f"input_data/{REFN}.fits"):
        log("bspline secondary bench: NIRCam data absent")
        return
    ref = np.nan_to_num(sfits.getdata(base + f"input_data/{REFN}.fits").T.astype(np.float64))
    sci = np.nan_to_num(sfits.getdata(base + f"input_data/{SCIN}.fits").T.astype(np.float64))
    mask = sfits.getdata(base + f"auxiliary/{SCIN}.mask4sfft.fits").T.astype(bool)
    mref, msci = np.where(mask, ref, 0.0), np.where(mask, sci, 0.0)
    N0, N1 = ref.shape
    rng = np.random.default_rng(10086)
    XY_REG = np.stack([rng.uniform(10.0, N0 - 10.0, 512),
                       rng.uniform(10.0, N1 - 10.0, 512)], axis=1)
    cfg = make_bspline_config(
        N0, N1, 11, KerSpType="B-Spline", KerSpDegree=2,
        KerIntKnotX=[0.5 + N0 / 3, 0.5 + N0 * 2 / 3],
        KerIntKnotY=[0.5 + N1 / 3, 0.5 + N1 * 2 / 3],
        SEPARATE_SCALING=True, ScaSpType="Polynomial", ScaSpDegree=2,
        BkgSpType="Polynomial", BkgSpDegree=0,
        REGULARIZE_KERNEL=True, XY_REGULARIZE=XY_REG, LAMBDA_REGULARIZE=3e-5)
    step = solve_and_subtract_fn(cfg)

    def timed(I, J, mI, mJ):
        sol, diff = step(I, J, mI, mJ)
        return jnp.sqrt(jnp.mean(diff.astype(jnp.float32) ** 2))

    f = jax.jit(timed)
    args = [jnp.asarray(a) for a in (ref, sci, mref, msci)]
    out = float(np.asarray(f(*args)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = float(np.asarray(f(*args)))
        ts.append(time.time() - t0)
    log(f"secondary: NIRCam B-spline 900^2 GKerHW=11 ({cfg.NEQ} dof): "
        f"{min(ts)*1000:.1f} ms, diff RMS {out:.5f} (A100 ref ~2600 ms)")


def bench_throughput(fn, Id, Jd, log, nrep=8):
    """Survey-mode throughput: back-to-back device-resident pairs through the
    jitted step (BASELINE.json metric = 4Kx4K subtractions/sec/chip). The
    science content differs per pair via on-device rolls; H2D of fresh pairs
    is timed separately (the axon tunnel's transfer rate is not representative
    of production host->TPU DMA)."""
    import jax
    import jax.numpy as jnp

    Js = [jnp.roll(Jd, 37 * k, axis=1) for k in range(4)]
    for Jk in Js:
        np.asarray(fn(Id, Jk))  # warm + materialize rolls
    t0 = time.time()
    outs = [fn(Id, Js[k % 4]) for k in range(nrep)]
    outs = [np.asarray(o) for o in outs]
    dt = time.time() - t0
    thr = nrep / dt
    log(f"throughput: {nrep} pairs in {dt:.2f}s -> {thr:.2f} pairs/s/chip "
        f"(device-resident)")

    # H2D rate of one fresh image through the tunnel
    fresh = np.asarray(Id) + 1.0
    t0 = time.time()
    Xd = jax.device_put(jnp.asarray(fresh))
    float(np.asarray(jnp.sum(Xd[:2, :2])))  # force placement
    h2d = fresh.nbytes / (time.time() - t0) / 1e6
    log(f"H2D: {fresh.nbytes/1e6:.0f} MB at {h2d:.0f} MB/s (axon tunnel)")
    return thr, h2d


def bench_parity(cfg, I_np, J_np, sol_tpu, diff_tpu, diff_rms_tpu, log):
    """On-hardware f64-contract parity: compare the production TPU path's
    solution vector and difference image (already computed by the benchmark's
    compiled step and fetched) against the CPU f64 oracle — the same engine
    code jitted on the in-process CPU backend with the exact fft/lu backends.
    BASELINE.md parity contract: diff match to 1e-6 RMS."""
    import jax
    import jax.numpy as jnp
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import solve_and_subtract_fn

    n = cfg.N0
    cpu = jax.devices("cpu")[0]
    cfg_cpu = make_config(n, n, cfg.w0, dtype="float64", greek_backend="fft",
                          fdiff_backend="fft", solver="lu", greek_chunk=0)
    # The bench pair is deterministic (make_pair seed=0), so the single-core
    # CPU oracle (~275 s at 4K) is disk-cached and recomputed only when the
    # input changes.
    import hashlib
    key = hashlib.sha256(
        I_np.tobytes() + J_np.tobytes() + repr(cfg_cpu).encode()
    ).hexdigest()[:16]
    cache = f"/tmp/sfft_bench_oracle_{key}.npz"
    t0 = time.time()
    try:
        z = np.load(cache)
        sol_cpu, diff_cpu = z["sol"], z["diff"]
        log(f"parity: CPU f64 oracle loaded from cache ({cache})")
    except Exception:
        with jax.default_device(cpu):
            step_cpu = jax.jit(solve_and_subtract_fn(cfg_cpu))
            Ic = jnp.asarray(I_np)
            Jc = jnp.asarray(J_np)
            sol_cpu, diff_cpu = step_cpu(Ic, Jc, Ic, Jc)
            sol_cpu = np.asarray(sol_cpu)
            diff_cpu = np.asarray(diff_cpu)
        np.savez(cache, sol=sol_cpu, diff=diff_cpu)
        log(f"parity: CPU f64 oracle at {n}^2 took {time.time()-t0:.1f}s")

    scale = np.max(np.abs(sol_cpu))
    sol_max_rel = float(np.max(np.abs(sol_tpu - sol_cpu)) / scale)
    e = diff_tpu - diff_cpu
    rms_err = float(np.sqrt(np.mean(e**2)))
    max_err = float(np.max(np.abs(e)))
    log(f"parity: solution max rel err {sol_max_rel:.3e}; "
        f"diff rms err {rms_err:.3e} (diff rms {diff_rms_tpu:.4f}), "
        f"max abs err {max_err:.3e}")
    return sol_max_rel, rms_err, max_err


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/sfft_tpu_jit_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import solve_and_subtract_fn

    platform = jax.default_backend()
    log(f"platform: {platform}, devices: {jax.devices()}")

    n = 4096 if platform != "cpu" else 1024
    cfg = make_config(n, n, 8, dtype="float64", greek_chunk=0)
    log(f"config: greek={cfg.greek_backend} fdiff={cfg.fdiff_backend} "
        f"solver={cfg.solver} NEQ={cfg.NEQ}")

    step = solve_and_subtract_fn(cfg)

    def timed_step(I, J):
        sol, diff = step(I, J, I, J)
        # tiny on-device summary: fetching ONLY this leaf forces execution
        # while keeping sol/diff on device (parity fetches them once, later)
        summary = jnp.stack([
            jnp.sqrt(jnp.mean(diff**2)),
            jnp.sum(jnp.abs(sol)),
            diff[0, 0],
        ])
        return summary, sol, diff

    _fn = jax.jit(timed_step)

    def fn(I, J):
        return _fn(I, J)[0]
    I, J = make_pair(n)
    Id = jax.device_put(jnp.asarray(I))
    Jd = jax.device_put(jnp.asarray(J))

    # cold/warm start breakdown (persistent compile cache turns the compile
    # stage into a disk load on warm starts)
    t0 = time.time()
    lowered = _fn.lower(Id, Jd)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    out = np.asarray(compiled(Id, Jd)[0])
    t3 = time.time()
    warm = (t2 - t1) < 15.0
    log(f"startup: trace {t1-t0:.1f}s, compile {t2-t1:.1f}s "
        f"({'WARM cache hit' if warm else 'cold'}), first exec {t3-t2:.1f}s; "
        f"diff RMS {out[0]:.4f}")

    times = []
    for _ in range(5):
        t0 = time.time()
        out = np.asarray(fn(Id, Jd))
        times.append(time.time() - t0)
    t = min(times)
    log(f"best of 5: {t*1000:.1f} ms; diff RMS {out[0]:.4f} (noise sigma ~1.49)")

    extra = {"startup_compile_s": round(t2 - t1, 1), "warm_start": warm}
    thr = None
    try:
        thr, h2d = bench_throughput(fn, Id, Jd, log)
        extra["pairs_per_sec_chip"] = round(thr, 3)
        extra["h2d_MBps"] = round(h2d, 0)
    except Exception as exc:
        log(f"throughput bench skipped: {exc}")

    if platform != "cpu":
        try:
            _, sol_d, diff_d = _fn(Id, Jd)
            sol_tpu = np.asarray(sol_d)
            t0 = time.time()
            diff_tpu = np.asarray(diff_d)
            log(f"parity: fetched {diff_tpu.nbytes/1e6:.0f} MB diff in "
                f"{time.time()-t0:.1f}s")
            pr = bench_parity(cfg, I, J, sol_tpu, diff_tpu, float(out[0]), log)
            extra["solution_max_rel_err"] = float(f"{pr[0]:.3e}")
            extra["diff_rms_err"] = float(f"{pr[1]:.3e}")
        except Exception as exc:
            log(f"parity bench skipped: {exc}")
        try:
            bench_bspline(log)
        except Exception as exc:
            log(f"bspline secondary bench skipped: {exc}")

    print(json.dumps({
        "metric": f"{n}x{n}_f64_subtract_wall",
        "value": round(t, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_4K_S / t, 3) if n == 4096 else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
