"""Why is packed e2e at 35 MB/s when the tunnel caps at ~50 MB/s?

Hypotheses about the axon RPC channel ordering, each timed at 4K packed
(67 MB/pair) fast-mode pairs:
  transfer-only   back-to-back puts, one final sync: the pure tunnel rate.
  put-then-fetch  current bench loop: dispatch k, put k+1, blocking fetch k
                  (fetch may FIFO-queue behind the 67 MB put).
  fetch-then-put  dispatch k, copy_to_host_async(k), put k+1, fetch k
                  (tiny D2H enters the channel before the big H2D).
  depth3          two pairs in flight ahead of the sync point.

Run on hardware: python tools/diag_e2e_overlap.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    import jax.numpy as jnp

    from bench import make_pair
    from sfft_tpu.config import make_config
    from sfft_tpu.core.engine import solve_and_subtract_fn
    from sfft_tpu.utils.jitconst import jit_const_args
    from sfft_tpu.utils.pack import pack_i16, unpack_i16

    n, w, blk = 4096, 5, 64
    I, J = make_pair(n)
    cfg = make_config(n, n, w, dtype="float64", greek_chunk=0, mode="fast")
    step = solve_and_subtract_fn(cfg)

    def _step_packed(qi, si, qj, sj):
        I64 = unpack_i16(qi, si, n, blk)
        J64 = unpack_i16(qj, sj, n, blk)
        _sol, diff = step(I64, J64, I64, J64)
        return jnp.sqrt(jnp.mean(diff.astype(jnp.float32) ** 2))

    f = jit_const_args(_step_packed)

    pairs = []
    for k in range(4):
        pI = pack_i16(np.ascontiguousarray(I, np.float32), blk)
        pJ = pack_i16(np.ascontiguousarray(
            np.roll(J, 41 * k, axis=1), np.float32), blk)
        pairs.append((pI.q, pI.scales, pJ.q, pJ.scales))
    mb = sum(a.nbytes for a in pairs[0]) / 1e6
    wu.wait()

    # warm executable + lane
    wref = [jax.device_put(a) for a in pairs[0]]
    float(np.asarray(f(*wref)))
    del wref
    nrep = 6

    # 1) transfer-only
    t0 = time.time()
    last = None
    for k in range(nrep):
        last = [jax.device_put(a) for a in pairs[k % 4]]
    float(np.asarray(jnp.sum(last[0][:2, :2])))
    dt = time.time() - t0
    print(f"transfer-only : {dt/nrep*1000:7.0f} ms/pair "
          f"({mb/(dt/nrep):5.1f} MB/s)", flush=True)

    # 2) put-then-fetch (current bench order)
    t0 = time.time()
    nxt = [jax.device_put(a) for a in pairs[0]]
    for k in range(nrep):
        cur = nxt
        r = f(*cur)
        if k + 1 < nrep:
            nxt = [jax.device_put(a) for a in pairs[(k + 1) % 4]]
        float(np.asarray(r))
    dt = time.time() - t0
    print(f"put-then-fetch: {dt/nrep*1000:7.0f} ms/pair "
          f"({nrep/dt:5.2f} pairs/s)", flush=True)

    # 3) fetch-then-put (async D2H issued before the big H2D)
    t0 = time.time()
    nxt = [jax.device_put(a) for a in pairs[0]]
    for k in range(nrep):
        cur = nxt
        r = f(*cur)
        try:
            r.copy_to_host_async()
        except Exception:
            pass
        if k + 1 < nrep:
            nxt = [jax.device_put(a) for a in pairs[(k + 1) % 4]]
        float(np.asarray(r))
    dt = time.time() - t0
    print(f"fetch-then-put: {dt/nrep*1000:7.0f} ms/pair "
          f"({nrep/dt:5.2f} pairs/s)", flush=True)

    # 4) depth-3 pipeline
    t0 = time.time()
    bufs = [[jax.device_put(a) for a in pairs[0]],
            [jax.device_put(a) for a in pairs[1]]]
    for k in range(nrep):
        cur = bufs.pop(0)
        r = f(*cur)
        if k + 2 < nrep:
            bufs.append([jax.device_put(a) for a in pairs[(k + 2) % 4]])
        float(np.asarray(r))
    dt = time.time() - t0
    print(f"depth-3       : {dt/nrep*1000:7.0f} ms/pair "
          f"({nrep/dt:5.2f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
