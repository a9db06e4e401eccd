"""Phase timing + profiler integration.

Reference: wall-clock segment timers printed at VERBOSE_LEVEL 2 with labeled
phases a-k (sfft/sfftcore/SFFTSubtract.py:172-178, 416-425, 465-470). Here a
small context-manager based phase timer with the same reporting style, plus a
jax.profiler trace hook for TPU-level profiling.

On accelerators, naive wall-clock timing of jitted code is meaningless (async
dispatch; on the axon runtime even block_until_ready does not synchronize and
device-to-host transfers are slow). PhaseTimer.sync forces a scalar on-device
reduction + tiny fetch, the only reliable synchronization point.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


def sync(x) -> float:
    """Force execution of a jax array; returns a cheap scalar."""
    import jax.numpy as jnp

    leaf = x
    try:
        import jax

        leaves = jax.tree_util.tree_leaves(x)
        leaf = leaves[0] if leaves else x
    except Exception:
        pass
    if hasattr(leaf, "ravel"):
        return float(np.asarray(jnp.sum(jnp.abs(leaf.ravel()[:1]))))
    return 0.0


class PhaseTimer:
    """Collects labeled phase durations; prints the reference's report style."""

    def __init__(self, verbose_level: int = 2):
        self.verbose_level = verbose_level
        self.phases: Dict[str, float] = {}
        self._order = []

    @contextlib.contextmanager
    def phase(self, label: str, sync_result=None):
        t0 = time.time()
        box = {}
        try:
            yield box
        finally:
            if "result" in box:
                sync(box["result"])
            elif sync_result is not None:
                sync(sync_result)
            dt = time.time() - t0
            if label not in self.phases:
                self._order.append(label)
                self.phases[label] = 0.0
            self.phases[label] += dt

    def report(self):
        if self.verbose_level >= 2:
            total = sum(self.phases.values())
            for i, label in enumerate(self._order):
                tag = chr(ord("a") + i)
                print(f"/////   {tag}   ///// {label:40s} ({self.phases[label]:.4f}s)")
            print(f"MeLOn CheckPoint: TOTAL [{total:.4f}s]")
        return dict(self.phases)


@contextlib.contextmanager
def tpu_trace(logdir: str = "/tmp/sfft_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
