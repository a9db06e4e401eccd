"""Run the Easy auto-pipelines END-TO-END on TPU hardware (VERDICT r4 #4).

Drives api/easy_sparse.py (ESP) and api/easy_crowded.py (ECP) over the
committed golden fixtures (tests/data/golden_*.fits) with the engine on the
real chip: prep (CPU numpy) -> ConvdSide/KerHW decision -> contract
solve+subtract (TPU) -> flux-scaling QA -> PAC -> FITS write. This is the
reference's flagship user scenario (sfft/EasySparsePacket.py:17-600,
sfft/test/subtract_test_sparse_flavor/subtract4sparse.py) — the repo's other
hardware evidence is CustomizedPacket/BSP-shaped; this records the auto path.

Prints one JSON line with wall times (cold-ish first call incl. compile, then
warm repeats) and the same QA statistics the golden CPU tests pin, so the
on-hardware outputs can be compared against tests/data/golden_auto_expected.json.

Usage: python tools/bench_easy_tpu.py [sparse|crowded|both]  (on the axon
TPU host; default both — the selector exists so a half interrupted by a
transient axon remote-compile failure can be rerun alone)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "data")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "both"
    assert part in ("sparse", "crowded", "both"), part
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    platform = jax.default_backend()
    log(f"platform: {platform}, devices: {jax.devices()}")

    out = {"platform": platform}
    with open(os.path.join(DATA, "golden_auto_expected.json")) as f:
        exp = json.load(f)

    attach = wu.wait()
    out["attach_s"] = round(attach, 1)
    log(f"session attach: {attach:.1f}s (overlapped with imports)")

    # --- Easy sparse ------------------------------------------------------
    if part in ("sparse", "both"):
        run_sparse(out, exp, platform, log)
    if part in ("crowded", "both"):
        run_crowded(out, exp, platform, log)
    print(json.dumps(out))


def run_sparse(out, exp, platform, log):
    from sfft_tpu.api.easy_sparse import EasySparsePacket

    kw = dict(ForceConv="AUTO", KerHWLimit=(2, 6), VERBOSE_LEVEL=0,
              PostAnomalyCheck=True)
    t0 = time.time()
    diff, prepdict, sol, fscal, fsig = EasySparsePacket.ESP(
        os.path.join(DATA, "golden_sparse_ref.fits"),
        os.path.join(DATA, "golden_sparse_sci.fits"),
        FITS_DIFF="/tmp/easy_sparse_tpu_diff.fits", **kw)
    t_first = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        diff, prepdict, sol, fscal, fsig = EasySparsePacket.ESP(
            os.path.join(DATA, "golden_sparse_ref.fits"),
            os.path.join(DATA, "golden_sparse_sci.fits"),
            FITS_DIFF="/tmp/easy_sparse_tpu_diff.fits", **kw)
        ts.append(time.time() - t0)
    act = prepdict["Active-Mask"]
    ss = prepdict["SExCatalog-SubSource"]
    e = exp["sparse"]
    diff_rms_active = float(np.sqrt(np.nanmean(np.asarray(diff)[act] ** 2)))
    qa = {
        "easy_sparse_e2e_first_s": round(t_first, 2),
        "easy_sparse_e2e_s": round(min(ts), 2),
        "sparse_n_subsource": [len(ss), e["n_subsource"]],
        "sparse_n_active_pix": [int(np.sum(act)), e["n_active_pix"]],
        "sparse_n_post_anomaly": [
            int(np.sum(np.asarray(ss["MASK_PostAnomaly"]))),
            e["n_post_anomaly"]],
        "sparse_flux_scal_mean": [float(fscal), e["flux_scal_mean"]],
        "sparse_diff_rms_active": [diff_rms_active, e["diff_rms_active"]],
        "sparse_sol_l1": [float(np.sum(np.abs(np.asarray(sol)))), e["sol_l1"]],
    }
    out.update(qa)
    log(f"[easy sparse on {platform}] first {t_first:.2f}s, warm best-of-3 "
        f"{min(ts):.2f}s; QA [measured, golden-CPU-expected]: "
        + json.dumps({k: v for k, v in qa.items() if k.startswith('sparse')}))

    # planted transient at (251, 77) must survive at >20x the active-region
    # RMS (same physical gate as tests/test_golden_sparse.py)
    d = np.asarray(diff)
    peak = float(np.nanmax(np.abs(d[246:256, 72:82])))
    out["sparse_transient_peak_over_rms"] = round(peak / diff_rms_active, 1)
    log(f"[easy sparse] planted transient peak/RMS: "
        f"{peak / diff_rms_active:.1f} (gate >20)")


def run_crowded(out, exp, platform, log):
    # --- Easy crowded -----------------------------------------------------
    from sfft_tpu.api.easy_crowded import EasyCrowdedPacket

    ec = exp["crowded"]
    kwc = dict(ForceConv="REF", GKerHW=ec["kerhw"], VERBOSE_LEVEL=0,
               FITS_DIFF="/tmp/easy_crowded_tpu_diff.fits")
    t0 = time.time()
    diff_c, prep_c, sol_c, fscal_c = EasyCrowdedPacket.ECP(
        os.path.join(DATA, "golden_crowded_ref.fits"),
        os.path.join(DATA, "golden_crowded_sci.fits"), **kwc)
    t_first_c = time.time() - t0
    ts_c = []
    for _ in range(3):
        t0 = time.time()
        diff_c, prep_c, sol_c, fscal_c = EasyCrowdedPacket.ECP(
            os.path.join(DATA, "golden_crowded_ref.fits"),
            os.path.join(DATA, "golden_crowded_sci.fits"), **kwc)
        ts_c.append(time.time() - t0)
    act_c = prep_c["Active-Mask"]
    out["easy_crowded_e2e_first_s"] = round(t_first_c, 2)
    out["easy_crowded_e2e_s"] = round(min(ts_c), 2)
    out["crowded_diff_rms_active"] = [
        float(np.sqrt(np.nanmean(np.asarray(diff_c)[act_c] ** 2))),
        ec["diff_rms_active"]]
    out["crowded_flux_scal"] = [float(fscal_c), ec["flux_scal"]]
    out["crowded_sol_l1"] = [
        float(np.sum(np.abs(np.asarray(sol_c)))), ec["sol_l1"]]
    log(f"[easy crowded on {platform}] first {t_first_c:.2f}s, warm "
        f"best-of-3 {min(ts_c):.2f}s; diff RMS(active) "
        f"{out['crowded_diff_rms_active'][0]:.5f} (golden CPU "
        f"{ec['diff_rms_active']:.5f})")


if __name__ == "__main__":
    main()
