"""Diagnose the axon H2D tunnel ceiling (VERDICT r3 weak #5).

End-to-end survey throughput is ~0.25-0.31 pairs/s/chip vs 5.2
device-resident: a 134 MB f32 pair costs ~3.4 s of tunnel time against
0.22 s of compute. Questions this tool answers on hardware:

  1. Is the ~40 MB/s tunnel PER-STREAM or GLOBAL?  -> time 1/2/4 concurrent
     device_put threads on disjoint arrays.
  2. Does chunking one array into k concurrent device_puts help?
  3. Is bandwidth dtype/shape dependent (f32 vs int8 vs f64)?
  4. What would lossless compression buy IF device-side decode existed:
     host-side zlib(level=1) + byte-shuffle ratio/throughput on a realistic
     sky-dominated f32 frame (documents the ceiling; device-side DEFLATE is
     not implementable in XLA, so this is a bound, not a plan).

Run: python tools/diag_h2d_streams.py
"""

import sys
import threading
import time
import zlib

import numpy as np

sys.path.insert(0, "/root/repo")


def bw(nbytes, secs):
    return nbytes / max(secs, 1e-9) / 1e6


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from sfft_tpu.utils.warmup import start_device_warmup

    wu = start_device_warmup()
    import jax.numpy as jnp

    from bench import make_pair

    print(f"platform: {jax.default_backend()}", file=sys.stderr, flush=True)
    n = 4096
    I, _ = make_pair(n)
    F32 = I.astype(np.float32)
    wu.wait()

    def put_sync(arrs):
        ds = [jax.device_put(a) for a in arrs]
        for d in ds:
            d.block_until_ready()
        # block_until_ready is a no-op on axon: force a real sync by
        # reducing to a scalar and fetching it
        s = float(np.asarray(jnp.sum(ds[0][:2, :2])))
        return ds, s

    # warm the lane
    put_sync([F32[:256, :256].copy()])

    # 1) single stream
    for rep in range(2):
        a = F32 + rep  # defeat any content caching
        t0 = time.time()
        put_sync([a])
        dt = time.time() - t0
        print(f"single stream {a.nbytes/1e6:.0f} MB: {dt:.2f}s "
              f"({bw(a.nbytes, dt):.1f} MB/s)", flush=True)

    # 2) k concurrent threads, disjoint arrays
    for k in (2, 4):
        arrs = [F32 + 10 + i for i in range(k)]
        outs = [None] * k

        def worker(i):
            d = jax.device_put(arrs[i])
            outs[i] = d

        t0 = time.time()
        ths = [threading.Thread(target=worker, args=(i,)) for i in range(k)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        # sync all
        s = float(np.asarray(sum(jnp.sum(d[:2, :2]) for d in outs)))
        dt = time.time() - t0
        total = sum(a.nbytes for a in arrs)
        print(f"{k} threads x {arrs[0].nbytes/1e6:.0f} MB: {dt:.2f}s "
              f"aggregate {bw(total, dt):.1f} MB/s", flush=True)

    # 3) one array split into k chunked concurrent puts
    for k in (2, 4, 8):
        chunks = np.array_split(F32 + 20 + k, k, axis=0)
        outs = [None] * k

        def worker(i):
            outs[i] = jax.device_put(chunks[i])

        t0 = time.time()
        ths = [threading.Thread(target=worker, args=(i,)) for i in range(k)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        s = float(np.asarray(sum(jnp.sum(d[:2, :2]) for d in outs)))
        dt = time.time() - t0
        print(f"chunked x{k} ({F32.nbytes/1e6:.0f} MB total): {dt:.2f}s "
              f"({bw(F32.nbytes, dt):.1f} MB/s)", flush=True)

    # 4) dtype dependence
    for name, arr in [("int8", (F32.view(np.uint8)[: n * n].copy())),
                      ("f64", F32.astype(np.float64))]:
        t0 = time.time()
        put_sync([arr])
        dt = time.time() - t0
        print(f"dtype {name} {arr.nbytes/1e6:.0f} MB: {dt:.2f}s "
              f"({bw(arr.nbytes, dt):.1f} MB/s)", flush=True)

    # 5) compression bound (host side only)
    raw = F32.tobytes()
    t0 = time.time()
    shuf = np.frombuffer(raw, np.uint8).reshape(-1, 4).T.copy().tobytes()
    comp = zlib.compress(shuf, 1)
    t_c = time.time() - t0
    print(f"zlib(1)+byteshuffle: ratio {len(raw)/len(comp):.2f}x, host "
          f"compress {bw(len(raw), t_c):.0f} MB/s "
          f"(bound only: no device-side inflate exists)", flush=True)


if __name__ == "__main__":
    main()
