"""Per-process device-connection warm-up for slow-attach runtimes (axon).

Measured on the axon v5e tunnel (2026-08-17, tools/diag_firsttouch.py): the
FIRST blocking dispatch of a fresh process pays an 80-350 s (worst observed
1388 s) session-establishment cost that is INDEPENDENT of payload — a 4-byte
program pays the same as a 268 MB pair upload, and afterwards H2D runs at
~52 MB/s and dispatches are millisecond-scale. The setup is lazy: nothing
starts until the first blocking RPC, so issuing transfers "early" does not
help by itself.

`start_device_warmup()` fires that first RPC from a daemon thread immediately
(the RPC wait releases the GIL), so session establishment overlaps everything
the host does next: FITS reads, source extraction, trace, compile. A survey
process that calls this at startup hides its prep time inside the attach
window; long-lived processes (the scheduler) pay it exactly once.
"""

from __future__ import annotations

import threading
import time
from typing import Optional


class DeviceWarmup:
    """Handle for the background first-touch; `wait()` joins and returns the
    attach duration in seconds (0.0 if warm-up was a no-op)."""

    def __init__(self):
        self.seconds: float = 0.0
        self.error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None

    def _run(self):
        t0 = time.time()
        try:
            import jax
            import jax.numpy as jnp
            import numpy as np

            x = jax.device_put(jnp.zeros((8,), jnp.float32))
            # block_until_ready does not synchronize on axon; a scalar fetch
            # through a jitted reduce is the reliable sync (CLAUDE.md).
            float(np.asarray(jax.jit(jnp.sum)(x)))
        except BaseException as exc:  # noqa: BLE001 - recorded, not raised
            self.error = exc
        self.seconds = time.time() - t0

    def start(self) -> "DeviceWarmup":
        self._thread = threading.Thread(
            target=self._run, name="sfft-device-warmup", daemon=True)
        self._thread.start()
        return self

    def wait(self, timeout: Optional[float] = None) -> Optional[float]:
        """Join the warm-up thread; returns the attach duration in seconds,
        or None if `timeout` expired with the attach STILL IN FLIGHT (so a
        timed-out wait can never be mistaken for a 0-cost attach — the very
        first-touch mis-measurement this module exists to prevent)."""
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                return None
        return self.seconds


def start_device_warmup() -> DeviceWarmup:
    """Begin establishing the device session in the background. Call right
    after `import jax` (and platform/x64 config); overlap host-side prep with
    the attach, then `wait()` before timing anything on-device."""
    return DeviceWarmup().start()
