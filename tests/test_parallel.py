"""Survey-mode parallelism: mesh batching + multi-task scheduler semantics."""

import time

import numpy as np
import pytest

import sfft_tpu  # noqa: F401
import jax


def test_batched_subtract_on_mesh(rng):
    from sfft_tpu.config import SFFTConfig, BasisSpec
    from sfft_tpu.parallel.batch import batched_subtract, make_data_mesh
    from tests.test_engine import make_pair, base_cfg
    from sfft_tpu.core.engine import ElementalSFFT

    n_dev = jax.device_count()
    assert n_dev == 8, "conftest should provide 8 virtual cpu devices"
    cfg = base_cfg(N0=32, N1=32, w=1)
    Is, Js = [], []
    for k in range(8):
        I, J = make_pair(rng, N0=32, N1=32)
        Is.append(I)
        Js.append(J)
    I = np.stack(Is)
    J = np.stack(Js)
    mesh = make_data_mesh(8)
    sols, diffs, rms = batched_subtract(I, J, I, J, cfg, mesh)
    assert sols.shape == (8, cfg.NEQ)
    # batched result matches single-pair result
    sol0, diff0 = ElementalSFFT.ESS(Is[0], Js[0], cfg, Subtract=True)
    np.testing.assert_allclose(np.asarray(sols[0]), np.asarray(sol0),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(diffs[0]), np.asarray(diff0),
                               rtol=1e-7, atol=1e-9)


def test_scheduler_status_and_failures():
    from sfft_tpu.parallel.scheduler import (
        MultiTaskScheduler, STATUS_OK, STATUS_FAIL, STATUS_PREP_FAIL)

    def prep_fn(tid):
        if tid == 2:
            raise RuntimeError("prep boom")
        return {"data": tid * 10}

    def subtract_fn(tid, prep):
        if tid == 3:
            raise RuntimeError("sub boom")
        return prep["data"] + 1

    sched = MultiTaskScheduler(5, prep_fn, subtract_fn,
                               NUM_THREADS_4PREPROC=2,
                               NUM_THREADS_4SUBTRACT=2, VERBOSE_LEVEL=0)
    status, products = sched.run()
    assert status[0] == STATUS_OK and products[0]["result"] == 1
    assert status[1] == STATUS_OK and products[1]["result"] == 11
    assert status[2] == STATUS_PREP_FAIL
    assert status[3] == STATUS_FAIL
    assert status[4] == STATUS_OK and products[4]["result"] == 41


def test_scheduler_timeout():
    from sfft_tpu.parallel.scheduler import (
        MultiTaskScheduler, STATUS_OK, STATUS_FAIL)

    def prep_fn(tid):
        return tid

    def subtract_fn(tid, prep):
        if tid == 0:
            t0 = time.time()
            while time.time() - t0 < 10:  # interruptible busy loop
                sum(range(1000))
        return "done"

    sched = MultiTaskScheduler(2, prep_fn, subtract_fn,
                               NUM_THREADS_4PREPROC=1,
                               NUM_THREADS_4SUBTRACT=1,
                               TIMEOUT_4SUBTRACT_EACHTASK=0.5,
                               VERBOSE_LEVEL=0)
    t0 = time.time()
    status, products = sched.run()
    assert time.time() - t0 < 8
    assert status[0] == STATUS_FAIL
    assert status[1] == STATUS_OK


def test_multiproc_threading_map():
    from sfft_tpu.utils.multiproc import MultiProc

    out = MultiProc.MP(list(range(20)), lambda t: t * t, nproc=4,
                       mode="threading")
    assert out == {t: t * t for t in range(20)}


def test_sharded_fft2_matches_local():
    rng = np.random.default_rng(5)
    import jax.numpy as jnp
    from sfft_tpu.parallel.batch import make_data_mesh
    from sfft_tpu.parallel.sharded_fft import sharded_fft2

    mesh = make_data_mesh(8)
    x = rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48))
    out = sharded_fft2(jnp.asarray(x), mesh)
    ref = np.fft.fft2(x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-10, atol=1e-8)


def test_sharded_subtract_step():
    rng = np.random.default_rng(6)
    from sfft_tpu.parallel.batch import make_data_mesh
    from sfft_tpu.parallel.sharded_fft import sharded_subtract_step
    from tests.test_engine import make_pair, base_cfg
    from sfft_tpu.core.engine import ElementalSFFT

    mesh = make_data_mesh(8)
    cfg = base_cfg(N0=64, N1=64, w=1)
    I, J = make_pair(rng, N0=64, N1=64)
    run = sharded_subtract_step(cfg, mesh)
    sol, diff = run(I, J, I, J)
    sol_ref, diff_ref = ElementalSFFT.ESS(I, J, cfg, Subtract=True)
    np.testing.assert_allclose(np.asarray(sol), np.asarray(sol_ref),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(diff), np.asarray(diff_ref),
                               rtol=1e-7, atol=1e-9)
