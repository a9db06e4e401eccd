"""Pin the Pallas double-float moment kernel via the interpreter on CPU.

core/pallas_moments.moments_pallas is the TPU hot path for the peeled
assembly's exact moment contractions (core/peel.py routes big f64 planes
through it). On hardware it runs as a Mosaic kernel; interpret=True runs
the IDENTICAL kernel body through the Pallas interpreter on CPU.

Precision caveat (measured): the interpreter lowers the kernel body to
regular XLA:CPU, whose algebraic simplifier cancels part of the compensated
error terms (the same effect CLAUDE.md's copysign fences exist for in
core/exact_fft) — interpret-mode accuracy is ~1e-8 rel, while Mosaic on
hardware preserves the compensation (~1e-14, the kernel's design point).
So the interpret tests pin the PLUMBING (splitting, padding, blocking,
masking, accumulation, S>16 chunking) at f32-grade tolerance, and the
error-free-transformation MATH is pinned separately with pure-numpy f32
arithmetic, which no compiler rewrites.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _oracle(W, G):
    return np.asarray(W, np.float64) @ np.asarray(G, np.float64)


@pytest.mark.parametrize("S,N0,N1", [(3, 300, 257), (16, 512, 130), (20, 256, 129)])
def test_moments_pallas_interpret_matches_f64(S, N0, N1):
    from sfft_tpu.core.pallas_moments import moments_pallas

    rng = np.random.default_rng(5)
    # smooth + rough content with large dynamic range (the cancellation-
    # sensitive case the kernel exists for)
    W = rng.normal(0, 1, (S, N0)) * np.logspace(0, 6, N0)[None, :]
    G = rng.normal(0, 1, (N0, N1)) + 1e4
    out = np.asarray(moments_pallas(jnp.asarray(W), jnp.asarray(G),
                                    bx=128, by=128, interpret=True))
    ref = _oracle(W, G)
    rel = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    # f32-grade bound: XLA:CPU algsimp cancels part of the compensation in
    # interpret mode (measured ~1e-8; Mosaic on TPU holds ~1e-14). Any
    # indexing/padding/chunking bug would blow far past this.
    assert rel < 1e-6, f"interpreted contraction rel err {rel:.3e}"


def test_moments_pallas_interpret_under_jit():
    from sfft_tpu.core.pallas_moments import moments_pallas

    rng = np.random.default_rng(6)
    W = rng.normal(0, 1, (4, 256))
    G = rng.normal(0, 1, (256, 200))
    f = jax.jit(lambda w, g: moments_pallas(w, g, bx=128, by=128,
                                            interpret=True))
    out = np.asarray(f(jnp.asarray(W), jnp.asarray(G)))
    ref = _oracle(W, G)
    assert np.max(np.abs(out - ref)) / np.max(np.abs(ref)) < 1e-6


def test_split_f64_residual_below_2pow48():
    from sfft_tpu.core.pallas_moments import split_f64

    x = jnp.asarray(np.random.default_rng(7).normal(0, 1e8, (64,)))
    hi, lo = split_f64(x)
    res = np.asarray(hi, np.float64) + np.asarray(lo, np.float64) - np.asarray(x)
    # lo itself rounds to f32, so the pair carries ~48 bits of x, not 53
    # (measured residual ~8e-16 rel) — the kernel's documented design point
    assert np.max(np.abs(res)) / np.max(np.abs(np.asarray(x))) < 2.0 ** -47


def test_eft_building_blocks_exact_in_pure_f32():
    """Dekker TwoProd / Knuth TwoSum are EXACT in correctly-rounded f32
    with no compiler rewriting — pinned with numpy f32 arithmetic, which
    evaluates each op as written (unlike XLA:CPU, which algebraically
    simplifies the compensation away in interpret mode)."""
    from sfft_tpu.core.pallas_moments import _two_prod, _two_sum

    rng = np.random.default_rng(8)
    a = rng.normal(0, 1e4, 4096).astype(np.float32)
    b = rng.normal(0, 1e-3, 4096).astype(np.float32)
    p, e = _two_prod(a, b)
    np.testing.assert_array_equal(
        p.astype(np.float64) + e.astype(np.float64),
        a.astype(np.float64) * b.astype(np.float64))
    s, e2 = _two_sum(a, b)
    np.testing.assert_array_equal(
        s.astype(np.float64) + e2.astype(np.float64),
        a.astype(np.float64) + b.astype(np.float64))


def test_phase_timer_smoke(capsys):
    """utils/profiling.PhaseTimer: labeled a-k style phase report (the
    reference's VERBOSE_LEVEL=2 segment timers, sfft/sfftcore/
    SFFTSubtract.py:172-178)."""
    from sfft_tpu.utils.profiling import PhaseTimer

    t = PhaseTimer(verbose_level=2)
    with t.phase("setup"):
        pass
    with t.phase("work") as box:
        box["result"] = jnp.asarray([1.0, 2.0])
    got = t.report()
    out = capsys.readouterr().out
    assert "setup" in out and "work" in out and "TOTAL" in out
    assert set(got) == {"setup", "work"} and all(v >= 0 for v in got.values())
