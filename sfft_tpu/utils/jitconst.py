"""jit with closure constants lifted to runtime arguments.

Why: the exact-grade contract engine builds large static tables (sliced-int8
DFT stage matrices, partial-iDFT phase matrices) as numpy constants inside
the traced function, so they are EMBEDDED in the XLA executable. On the axon
runtime the executable ships to the TPU at FIRST DISPATCH at well under
1 MB/s — measured 620 s for a single 4K transform whose code section carried
92 MB of constants (BENCH_r02's 420 s contract cold start). Lifting every
traced constant to a runtime argument keeps the executable small (pure code,
2.2 MB for the full 4K contract step) and moves the table upload onto the
47 MB/s H2D array lane, paid once per process.

Mechanism: `jax.make_jaxpr` splits the function into (jaxpr, consts); the
consts are deduped by content, device_put once, and the jaxpr is re-evaluated
under jit with the consts passed as leading runtime arguments — XLA sees them
as parameters, not literals. The jit is compiled with AUTO input layouts and
the consts are pre-placed in the compiler-chosen layouts: without this, XLA
re-lays-out every table at every call (measured +630 ms per 4K contract call
for 325 MB of argument tables). Results are cached per (shape, dtype)
signature exactly like jit's own trace cache.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # jax >= 0.4.x moved eval_jaxpr around; keep both routes
    from jax.core import eval_jaxpr as _eval_jaxpr
except ImportError:  # pragma: no cover
    from jax._src.core import eval_jaxpr as _eval_jaxpr


def _dedupe_device_put(consts):
    """device_put each const once per distinct content."""
    uniq = {}
    out = []
    for c in consts:
        a = np.asarray(c)
        key = (a.dtype.str, a.shape, hashlib.sha1(a.tobytes()).digest())
        if key not in uniq:
            uniq[key] = jax.device_put(c)
        out.append(uniq[key])
    return out


class _Executable:
    """Compiled program + pre-laid-out constants; call with the user args."""

    def __init__(self, compiled, consts):
        self._compiled = compiled
        self._consts = consts

    def memory_analysis(self):
        return self._compiled.memory_analysis()

    def __call__(self, *args):
        return self._compiled(self._consts, *args)


class ConstArgsJit:
    """Callable wrapping `fn` so traced constants become runtime arguments."""

    def __init__(self, fn: Callable):
        self._fn = fn
        self._cache: Dict[Any, _Executable] = {}

    def _sig(self, args):
        return tuple((jnp.asarray(a).shape, str(jnp.asarray(a).dtype))
                     for a in args)

    def _build(self, args) -> _Executable:
        closed = jax.make_jaxpr(self._fn)(*args)
        # Complex consts cannot ride as runtime arguments: the axon runtime
        # rejects any USE of a device-put complex array with UNIMPLEMENTED
        # (measured 2026-08-17 backend; complex values INSIDE programs are
        # fine). Ship real/imag planes and recombine with lax.complex.
        specs = []
        reals = []
        for c in closed.consts:
            a = np.asarray(c)
            if np.iscomplexobj(a):
                specs.append((True, len(reals)))
                reals.append(np.ascontiguousarray(a.real))
                reals.append(np.ascontiguousarray(a.imag))
            else:
                specs.append((False, len(reals)))
                reals.append(a)
        consts = _dedupe_device_put(reals)
        jaxpr = closed.jaxpr
        n_out = len(jaxpr.outvars)

        def run(consts_, *args_):
            cs = [jax.lax.complex(consts_[i], consts_[i + 1]) if cplx
                  else consts_[i] for cplx, i in specs]
            out = _eval_jaxpr(jaxpr, cs, *args_)
            return out[0] if n_out == 1 else tuple(out)

        # NOTE: compiling with AUTO input layouts (jax.experimental.layout)
        # and pre-placing the consts in the compiler-chosen tiled layouts
        # looked like the clean fix for per-call parameter re-layout, but on
        # the axon runtime executing such a program wedges for tens of
        # minutes (measured). Default layouts + device-derived int8 tables
        # (exact_fft._slice_static_dev) achieve the same effect portably.
        compiled = jax.jit(run).lower(consts, *args).compile()
        return _Executable(compiled, consts)

    def _entry(self, args) -> _Executable:
        key = self._sig(args)
        if key not in self._cache:
            self._cache[key] = self._build(args)
        return self._cache[key]

    def lower(self, *args):
        return _Lowered(self, args)

    def __call__(self, *args):
        return self._entry(args)(*args)


class _Lowered:
    """Minimal .lower()/.compile() shim matching jit's AOT timing protocol
    (the expensive build happens in compile(), like jit)."""

    def __init__(self, owner: ConstArgsJit, args):
        self._owner = owner
        self._args = args

    def compile(self) -> _Executable:
        return self._owner._entry(self._args)


def jit_const_args(fn: Callable) -> ConstArgsJit:
    """Drop-in jit replacement that passes traced constants as runtime args
    in compiler-chosen layouts. Use for programs whose traced bodies embed
    large numpy tables (the exact contract engine); plain `jax.jit` ships
    those tables inside the executable at every process start."""
    return ConstArgsJit(fn)
