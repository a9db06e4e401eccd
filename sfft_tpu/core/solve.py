"""Dense solve of the SFFT normal equations, with TPU-aware backends.

Reference: stripe removal + LU (sfft/sfftcore/SFFTConfigure.py:690-732,
sfft/sfftcore/SFFTSubtract.py:732-757). The ConstPhotRatio "forbidden stripes"
(the kernel-sum dof of every non-constant spatial term) are removed by a static
gather and the solution re-extended by a static scatter — both indices are
numpy constants per config.

Solver backends:
  'lu'    jnp.linalg.solve (LAPACK on CPU; fine where f64 LU compiles)
  'cho'   Cholesky — the system is a Gram matrix (symmetric positive definite
          in exact arithmetic), so this is valid and faster
  'host'  jax.pure_callback to numpy LAPACK — the float64 TPU route (on-device
          f64 LU does not compile on TPU); the system is tiny (NEQ ~ a few
          thousand) so the round-trip is cheap relative to the image-size work
  'blocked_cho'  on-device blocked Cholesky built from f64 matmuls (XLA
          double-float emulation) — keeps everything on-chip
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sfft_tpu.config import SFFTConfig
from sfft_tpu.core.indices import stripe_indices


def _host_solve(lhs: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Opt-in solver='host': LAPACK f64 LU via pure_callback. Exact, but the
    system round-trips to the host per call — and host callbacks inside jit
    are UNSUPPORTED on the axon TPU runtime (CLAUDE.md), so this is a
    CPU/GPU-backend option only; the on-TPU exact route is solver='exact'."""
    def _np_solve(args):
        a, b = args
        return np.linalg.solve(np.asarray(a), np.asarray(b)).astype(a.dtype)

    return jax.pure_callback(
        _np_solve,
        jax.ShapeDtypeStruct(rhs.shape, rhs.dtype),
        (lhs, rhs),
        vmap_method="sequential",
    )


def sliced_exact_dot(A: jnp.ndarray, B: jnp.ndarray = None,
                     nsl: int = 9, kmax: int = 8) -> jnp.ndarray:
    """f64-grade matmul of RUNTIME f64 operands via Ozaki int8 slicing.

    A (m, k) @ B (k, n) -> (m, n) f64. B=None computes the symmetric A @ A.T
    (SYRK) reusing one slicing of A. Each operand rides as an f32 (hi, lo)
    pair split into `nsl` 6-bit integer slices with per-row power-of-2 scales
    (exact_fft._slice_pair_real); slice products with i + j <= kmax
    accumulate EXACTLY in int32 on the MXU and recombine through the
    compensated f32 chain -> ~2^-48-relative output, 5+ orders better than
    XLA's fast f64 emulation (~1e-7) at int8 speed instead of the ~0.03 TF
    exact slow route. Used for the trailing updates of the blocked Cholesky
    (the n^3 part of the contract solve); the refinement iterations absorb
    the 2^-48-vs-2^-53 factor-grade gap exactly as they absorb the library
    panel factorizations (see _blocked_cholesky).

    Accumulation-depth bound: |slice| <= 2^6 so |prod| <= 2^12; one dot sums
    k <= 2^19 - safe terms in int32 and the per-group dot-sum is split into
    exact f32 parts by _accum(big=True) before the chain."""
    from sfft_tpu.core.exact_fft import _accum, _slice_pair_real

    syrk = B is None
    Ah = A.astype(jnp.float32)
    Al = (A - Ah.astype(A.dtype)).astype(jnp.float32)
    Asl, sa = _slice_pair_real(Ah, Al, nsl, rowwise=True)   # (nsl,m,k),(m,1)
    if syrk:
        Bsl, sbT = Asl, sa                                   # rows of A == cols of A.T
    else:
        Bt = B.T
        Bh = Bt.astype(jnp.float32)
        Bl = (Bt - Bh.astype(B.dtype)).astype(jnp.float32)
        Bsl, sbT = _slice_pair_real(Bh, Bl, nsl, rowwise=True)  # (nsl,n,k),(n,1)

    # ONE dot per weight group: the group's slice pairs concatenate along K
    # (sum_{i+j=s} A_i @ B_j^T == concat_i(A_i) @ concat_j(B_j)^T), so the
    # whole GEMM is <= kmax+1 MXU dispatches instead of ~45 — measured
    # 2026-08-19: 45 separate int8 dots cost ~0.6 ms of dispatch overhead
    # EACH (30.8 ms for one 1484x256 SYRK vs ~1 ms of actual traffic).
    # Depth bound: K_group <= nsl*k, |prod| <= 2^12 -> k <= 2^19/nsl safe.
    Asl8 = Asl.astype(jnp.int8)
    Bsl8 = Asl8 if syrk else Bsl.astype(jnp.int8)
    # int32 exactness guard: a group concatenates <= nsl slice pairs along K,
    # each |product| <= 64*33 < 2^12, so the deepest dot sums nsl*k terms of
    # magnitude < 2^12 — that must stay under 2^31 or the accumulator WRAPS
    # silently and corrupts the factor (k <= ~58k at nsl=9; no current caller
    # is near it, but _tri_inverse_blocked contracts k up to the system size).
    assert nsl * A.shape[-1] * (64 * 33) < 2 ** 31, (
        f"sliced_exact_dot int32 depth bound exceeded: nsl={nsl}, "
        f"k={A.shape[-1]} — split the K axis")
    groups, weights = [], []
    for s in range(min(kmax, 2 * nsl - 2) + 1):
        combos = [(i, s - i) for i in range(max(0, s - nsl + 1),
                                            min(nsl - 1, s) + 1)]
        Acat = jnp.concatenate([Asl8[i] for i, _ in combos], axis=-1)
        Bcat = jnp.concatenate([Bsl8[j] for _, j in combos], axis=-1)
        groups.append(jax.lax.dot_general(
            Acat, Bcat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32))
        weights.append(2.0 ** (-6 * (s + 2)))
    h, l = _accum(groups, weights, np.float32(1.0), big=True)
    out = h.astype(A.dtype) + l.astype(A.dtype)
    return out * sa.astype(A.dtype) * sbT.astype(A.dtype).T


def _blocked_cholesky(A: jnp.ndarray, nb: int = 256,
                      precision=None, trailing: str = "dot") -> jnp.ndarray:
    """Lower Cholesky factor via right-looking blocked algorithm.

    Panel factorization and triangular solves stay small (nb x nb); the trailing
    update is a matmul — the only f64 primitive that is fast(ish) on TPU.
    precision=HIGHEST forces the exact (slow) f64 dot route for every
    contraction — required when the factor feeds the f64 solution contract
    (the fast f64 emulation is ~1e-7 and gets amplified by conditioning).
    trailing='sliced' replaces the trailing-update dots with the Ozaki int8
    SYRK (sliced_exact_dot) — same f64 factor grade, int8-MXU speed.
    """
    n = A.shape[0]
    nblk = -(-n // nb)
    npad = nblk * nb
    Ap = jnp.zeros((npad, npad), A.dtype).at[:n, :n].set(A)
    # keep padded diagonal nonsingular
    Ap = Ap.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    L = jnp.zeros_like(Ap)

    def chol_small(M):
        # unblocked Cholesky of an nb x nb block via fori over columns
        def body(j, Lc):
            d = jnp.sqrt(M2[j, j] - jnp.dot(Lc[j, :], Lc[j, :],
                                            precision=precision))
            col = (M2[:, j] - jnp.dot(Lc, Lc[j, :], precision=precision)) / d
            mask = jnp.arange(M.shape[0]) > j
            Lc = Lc.at[:, j].set(jnp.where(mask, col, 0.0))
            Lc = Lc.at[j, j].set(d)
            return Lc

        M2 = M
        return jax.lax.fori_loop(0, M.shape[0], body, jnp.zeros_like(M))

    def tri_solve_lower(Ld, B):
        # solve Ld @ X^T = B^T i.e. X @ Ld^T = B, row block of L
        return jax.scipy.linalg.solve_triangular(Ld, B.T, lower=True).T

    Acur = Ap
    for k in range(nblk):
        s = k * nb
        diag = Acur[s : s + nb, s : s + nb]
        if precision is not None:
            # library panel factorization: the nb x nb diagonal blocks of the
            # equilibrated system are locally well-conditioned, so XLA's f64
            # Cholesky (fast ~1e-7-grade internals) is fine for the PANELS —
            # refinement absorbs it — while the column-by-column fori panel
            # costs ~0.5 s of sequential scalar steps at NEQ=1740 (measured:
            # 1204 ms -> 654 ms total solve, identical 6e-8 accuracy)
            Lkk = jnp.linalg.cholesky(diag)
        else:
            Lkk = chol_small(diag)
        below = Acur[s + nb :, s : s + nb]
        if below.shape[0] and trailing == "sliced":
            # panel solve as (trail, nb) @ inv(Lkk).T: one small library
            # inverse + a HIGHEST matmul replaces the library triangular
            # solve's serial panel chain (same local panel grade)
            Lkkinv = jax.scipy.linalg.solve_triangular(
                Lkk, jnp.eye(nb, dtype=Lkk.dtype), lower=True)
            Lbk = jnp.dot(below, Lkkinv.T, precision=precision)
        elif below.shape[0]:
            Lbk = tri_solve_lower(Lkk, below)
        else:
            Lbk = below
        L = L.at[s : s + nb, s : s + nb].set(Lkk)
        if below.shape[0]:
            L = L.at[s + nb :, s : s + nb].set(Lbk)
            if trailing == "sliced":
                # Ozaki int8 SYRK: f64-grade trailing update at int8-MXU
                # speed instead of the ~0.03 TF exact f64 slow route (the
                # n^3 bulk of the contract solve); refinement absorbs the
                # 2^-48-vs-2^-53 factor-grade gap (see sliced_exact_dot)
                upd = sliced_exact_dot(Lbk)
            else:
                upd = jnp.dot(Lbk, Lbk.T, precision=precision)
            Acur = Acur.at[s + nb :, s + nb :].add(-upd)
    return L[:n, :n]


def _blocked_trisolve(L: jnp.ndarray, b: jnp.ndarray, lower: bool,
                      nb: int = 256) -> jnp.ndarray:
    """Triangular solve with HIGHEST-precision off-diagonal updates.

    XLA's TriangularSolve on TPU runs its internal f64 matmuls through the
    fast ~1e-7 emulation; at cond ~3e8 that alone floors the solution at
    ~1e-5 (measured on hardware) and refinement against it stalls. Blocked
    substitution keeps the nb x nb panel solves (well-conditioned, local) on
    the library path and forces every off-diagonal contraction through the
    exact f64 route."""
    n = L.shape[0]
    hp = jax.lax.Precision.HIGHEST
    nblk = -(-n // nb)
    x = jnp.zeros_like(b)
    order = range(nblk) if lower else range(nblk - 1, -1, -1)
    for k in order:
        s, e = k * nb, min((k + 1) * nb, n)
        rhs = b[s:e]
        if lower and s > 0:
            rhs = rhs - jnp.dot(L[s:e, :s], x[:s], precision=hp)
        if not lower and e < n:
            rhs = rhs - jnp.dot(L[s:e, e:], x[e:], precision=hp)
        xk = jax.scipy.linalg.solve_triangular(L[s:e, s:e], rhs, lower=lower)
        x = x.at[s:e].set(xk)
    return x


def _diag_block_inverses(L: jnp.ndarray, nb: int = 256) -> jnp.ndarray:
    """Explicit inverses of the nb x nb diagonal blocks of lower-triangular L
    via ONE batched triangular solve against I (shape (nblk, nb, nb)).

    Why: each library `solve_triangular` dispatch costs ~4-12 ms on this TPU
    regardless of size, and a blocked trisolve chains 2*nblk of them — the
    three substitution passes of _exact_solve (initial + 2 refinements) spent
    ~150 ms in panel-solve latency at NEQ=1740. With the inverses
    precomputed once, every panel solve becomes a matvec. Accuracy is the
    same panel-grade as the library solve it replaces (locally
    well-conditioned equilibrated blocks; refinement absorbs it — see
    _blocked_cholesky). Padding blocks carry an identity diagonal, so the
    padded inverse's top-left corner is the true block inverse."""
    n = L.shape[0]
    nblk = -(-n // nb)
    npad = nblk * nb
    Lp = jnp.zeros((npad, npad), L.dtype).at[:n, :n].set(L)
    Lp = Lp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    blocks = jnp.stack([Lp[k * nb : (k + 1) * nb, k * nb : (k + 1) * nb]
                        for k in range(nblk)])
    eye = jnp.eye(nb, dtype=L.dtype)
    return jax.vmap(
        lambda M: jax.scipy.linalg.solve_triangular(M, eye, lower=True)
    )(blocks)


def _blocked_trisolve_inv(L: jnp.ndarray, Linv: jnp.ndarray, b: jnp.ndarray,
                          lower: bool, nb: int = 256) -> jnp.ndarray:
    """Blocked triangular substitution using precomputed diagonal-block
    inverses (_diag_block_inverses): HIGHEST-precision off-diagonal updates
    (the accuracy-critical part, same as _blocked_trisolve) + matvec panel
    application. lower=False solves L.T x = b with the SAME L/Linv."""
    n = L.shape[0]
    hp = jax.lax.Precision.HIGHEST
    nblk = -(-n // nb)
    x = jnp.zeros_like(b)
    order = range(nblk) if lower else range(nblk - 1, -1, -1)
    for k in order:
        s, e = k * nb, min((k + 1) * nb, n)
        rhs = b[s:e]
        if lower and s > 0:
            rhs = rhs - jnp.dot(L[s:e, :s], x[:s], precision=hp)
        if not lower and e < n:
            # (L.T)[s:e, e:] = L[e:, s:e].T
            rhs = rhs - jnp.dot(x[e:], L[e:, s:e], precision=hp)
        inv = Linv[k][: e - s, : e - s]
        xk = jnp.dot(inv if lower else inv.T, rhs, precision=hp)
        x = x.at[s:e].set(xk)
    return x


def _tri_inverse_blocked(L: jnp.ndarray, Dinv: jnp.ndarray,
                         nb: int = 256) -> jnp.ndarray:
    """Explicit inverse of lower-triangular L via blocked substitution with
    sliced exact GEMMs for the off-diagonal work.

    X[i,i] = Dinv_i;  X[i, :i] = -Dinv_i @ (L[i, :i] @ X[:i, :i])
    sequential over row blocks (one sliced GEMM each, ~n^3/3 total on the
    int8 MXU). With X = L^-1 in hand, every triangular solve in the exact
    solver becomes two HIGHEST-precision f64 MATVECs (~0.2 ms at NEQ=1740)
    instead of a chain of 2*nblk sequential panel dispatches (~44 ms per
    refinement pass measured in r3) — the refinement latency disappears.
    Error ~ cond(L) * 2^-48 = sqrt(cond_eq) grade, absorbed by the exact-
    residual refinement exactly like the library panel factorizations."""
    n = L.shape[0]
    nblk = -(-n // nb)
    npad = nblk * nb
    Lp = jnp.zeros((npad, npad), L.dtype).at[:n, :n].set(L)
    Lp = Lp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    X = jnp.zeros((npad, npad), L.dtype)
    X = X.at[:nb, :nb].set(Dinv[0][: nb, : nb])
    for i in range(1, nblk):
        s = i * nb
        # (nb, s) = L-row-block @ X[:s, :s]
        prod = sliced_exact_dot(Lp[s : s + nb, :s], X[:s, :s])
        row = -jnp.dot(Dinv[i], prod, precision=jax.lax.Precision.HIGHEST)
        X = X.at[s : s + nb, :s].set(row)
        X = X.at[s : s + nb, s : s + nb].set(Dinv[i])
    return X[:n, :n]


def _exact_solve(A: jnp.ndarray, b: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """f64-contract solve on TPU: Jacobi equilibration + blocked Cholesky with
    HIGHEST-precision (exact, slow-route) f64 contractions + exact-residual
    refinement. Unlike the f32-LU refinement, the iteration matrix here has
    spectral radius cond * eps64 (~1e-7 even at cond 3e8), so two refinement
    steps reach the f64 floor: err after the direct solve ~cond*eps64 ~ 7e-8,
    one refinement squares it to ~5e-15, the second lands on the floor
    (measured: bench parity identical at iters=2 vs 4, 88 ms cheaper — each
    refinement pass costs ~44 ms of sequential blocked-trisolve panels).
    Cost at NEQ=1740 is otherwise dominated by the ~n^3/3 exact-f64 trailing
    updates (~150 ms on v5e)."""
    d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A)) + jnp.finfo(A.dtype).tiny)
    As = A * d[:, None] * d[None, :]
    bs = b * d
    hp = jax.lax.Precision.HIGHEST
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    # sliced int8 trailing updates on TPU (CPU/GPU have real f64 dots)
    L = _blocked_cholesky(As, precision=hp,
                          trailing="sliced" if on_tpu else "dot")
    Dinv = _diag_block_inverses(L)

    if on_tpu:
        # full L^-1 (sliced GEMMs): substitution passes collapse to two
        # HIGHEST matvecs each — removes the ~44 ms/pass panel-chain latency
        Li = _tri_inverse_blocked(L, Dinv)

        def solve_tri(r):
            return jnp.dot(Li.T, jnp.dot(Li, r, precision=hp), precision=hp)
    else:

        def solve_tri(r):
            y = _blocked_trisolve_inv(L, Dinv, r, lower=True)
            return _blocked_trisolve_inv(L, Dinv, y, lower=False)

    x = solve_tri(bs)
    bnorm = jnp.linalg.norm(bs)

    def body(state):
        k, x, _ = state
        r = bs - jnp.dot(As, x, precision=hp)
        return k + 1, x + solve_tri(r), jnp.linalg.norm(r)

    def cond(state):
        k, _, rn = state
        return jnp.logical_and(k < iters, rn > 1e-15 * bnorm)

    state = (jnp.int32(0), x, bnorm)
    _, x, _ = jax.lax.while_loop(cond, body, state)
    return x * d


def _tri_inverse_f32(L: jnp.ndarray, nb: int = 1024) -> jnp.ndarray:
    """Memory-bounded explicit inverse of a large lower-triangular f32 factor.

    X[i,i] = inv(L[i,i]); X[i,:i] = -X[i,i] (L[i,:i] @ X[:i,:i]) — one f32
    GEMM per row block, diagonal-block inverses via ONE batched triangular
    solve against I. Row blocks are padded to full width and concatenated
    (no (n, n)-sized dynamic-update-slices: XLA's lowering of a single
    triangular solve against I at n=13k materializes ~38 GB of update-slice
    temps and fails to compile on a 16 GB chip). Peak transients: the
    (s, n) previous-rows concat (<= the result itself) + one (nb, n) GEMM
    output. Error ~ eps32 * cond(L) — the same preconditioner grade as the
    library triangular solves it replaces; refinement absorbs it."""
    n = L.shape[0]
    nblk = -(-n // nb)
    npad = nblk * nb
    Lp = jnp.zeros((npad, npad), L.dtype).at[:n, :n].set(L)
    Lp = Lp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    Dinv = _diag_block_inverses(Lp, nb=nb)
    rows = [jnp.pad(Dinv[0], ((0, 0), (0, npad - nb)))]
    for i in range(1, nblk):
        s = i * nb
        prev = rows[0] if i == 1 else jnp.concatenate(rows, axis=0)
        # explicit full-f32 precision: the TPU's DEFAULT f32 matmul runs
        # bf16-grade passes — measured ||I - Li L|| 0.963 (vs 2e-4 on CPU)
        # with default dots, which silently destroyed the preconditioner
        hpf = jax.lax.Precision.HIGHEST
        prod = jnp.dot(Lp[s : s + nb, :s], prev[:, :s], precision=hpf)
        row = -jnp.dot(Dinv[i], prod, precision=hpf)
        row = jnp.pad(row, ((0, 0), (0, npad - s)))
        rows.append(row.at[:, s : s + nb].set(Dinv[i]))
    X = jnp.concatenate(rows, axis=0) if nblk > 1 else rows[0]
    return X[:n, :n]


_RESID_NSL = 12   # 72-bit capture: below eps64 against the row scale
_RESID_KMAX = 11


def _sliced_residual_setup(A: jnp.ndarray, d: jnp.ndarray,
                           nsl: int = _RESID_NSL, row_chunk: int = None):
    """One-time int8 slicing of the equilibrated system for exact-grade
    refinement residuals (TPU): returns (Ah, Asl_flat, sa) where Ah is the
    f32 hi part (fed straight to the f32 Cholesky — it IS the f32 rounding
    of the equilibrated matrix) and Asl_flat (nsl*n, n) int8 + per-row
    pow-2 scales sa represent the matrix to ~2^-72 of the row scale (exact
    3-way f32 split + 12 slices; see _slice_triple_real for why a pair is
    not enough)."""
    from sfft_tpu.core.exact_fft import _slice_triple_real

    n = A.shape[0]

    def slice_rows(args):
        Ac, dc = args
        As = Ac * dc[:, None] * d[None, :]
        Ah = As.astype(jnp.float32)
        rem = As - Ah.astype(As.dtype)
        Am = rem.astype(jnp.float32)
        Al = (rem - Am.astype(As.dtype)).astype(jnp.float32)
        Asl, sa = _slice_triple_real(Ah, Am, Al, nsl, rowwise=True)
        return Ah, Asl, sa

    if row_chunk is None and n < 4096:
        Ah, Asl, sa = slice_rows((A, d))
        return Ah, Asl.reshape(nsl * n, n), sa, None

    # large systems: stream the (row-independent) slicing through lax.map
    # row chunks, and keep the map's CHUNK-MAJOR slice layout
    # (nc, nsl, ch, n) — both the unrolled slicing chain over the full
    # (13207, 13207) array AND the (nsl, n) transpose that would convert to
    # slice-major cost ~700 s of axon compile each (measured 2026-08-19,
    # tools/diag_solve13k_compile.py / setup bisect: map-only compiles in
    # 5.5 s), so _sliced_matvec consumes the chunked layout directly. The
    # pad rows carry d=0 -> all-zero slices, harmless.
    ch = row_chunk or 512
    nc = -(-n // ch)
    npad = nc * ch
    Ap = jnp.zeros((npad, n), A.dtype).at[:n, :].set(A)
    dp = jnp.zeros((npad,), d.dtype).at[:n].set(d)
    Ah_c, Asl_c, sa_c = jax.lax.map(
        slice_rows, (Ap.reshape(nc, ch, n), dp.reshape(nc, ch)))
    Ah = Ah_c.reshape(npad, n)[:n]
    sa = sa_c.reshape(npad, 1)[:n]
    return Ah, Asl_c.reshape(nc * nsl * ch, n), sa, ch


def _sliced_matvec(Asl_flat: jnp.ndarray, sa: jnp.ndarray, x: jnp.ndarray,
                   nsl: int = _RESID_NSL, kmax: int = _RESID_KMAX,
                   chunk: int = None) -> jnp.ndarray:
    """Exact-grade f64 matvec of the sliced equilibrated matrix against a
    runtime f64 vector — the refinement residual's workhorse on TPU.

    Why: the HIGHEST-precision (exact slow route) f64 matvec costs 142.8 ms
    at n=13207 on v5e (measured, tools/diag_solve13k.py) — the slow route
    runs skinny contractions at ~0.002 TF, and 5-6 refinement residuals made
    it the dominant term of the 13k-dof NIRCam solve (996 ms of the 1.5 s
    step). Here the vector is sliced per call (cheap, (nsl, n)) and ONE int8
    GEMM (nsl*n, n) @ (n, 64-padded) computes every slice-pair product with
    EXACT int32 accumulation (|prod| <= 2^12, depth n -> < 2^26 per element,
    group sums < 2^29), then the <= kmax+1 weight groups recombine through
    the compensated f32 chain. ~5 ms/call at n=13207.

    Accuracy: representation floor ~2^-54-relative (same slicing grade as
    sliced_exact_dot) — the backward-error floor it imposes on refinement is
    the same table-grade floor the contract carries everywhere else."""
    from sfft_tpu.core.exact_fft import _slice_triple_real

    n = x.shape[0]
    xh = x.astype(jnp.float32)
    xrem = x - xh.astype(x.dtype)
    xm = xrem.astype(jnp.float32)
    xl = (xrem - xm.astype(x.dtype)).astype(jnp.float32)
    xsl, sx = _slice_triple_real(xh, xm, xl, nsl)      # (nsl, n), pow-2
    X8 = jnp.zeros((n, 64), jnp.int8).at[:, :nsl].set(
        xsl.astype(jnp.int8).T)
    prod = jax.lax.dot_general(
        Asl_flat, X8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if chunk is None:
        prod = prod.reshape(nsl, n, 64)            # slice-major rows

        def take(i, j):
            return prod[i, :, j]
    else:
        nc = Asl_flat.shape[0] // (nsl * chunk)    # chunk-major rows
        prodc = prod.reshape(nc, nsl, chunk, 64)

        def take(i, j):
            return prodc[:, i, :, j].reshape(nc * chunk)[:n]

    # recombine in f64 directly: the group sums are EXACT int32 and the
    # output is only an (n,) vector, so an f64 weighted sum costs nothing
    # and keeps eps64 grade (_accum's compensated f32 pair would cap the
    # result at ~2^-48 relative — measured 2e-13 vs 2e-16 for this matvec
    # against a longdouble oracle)
    out = jnp.zeros((n,), x.dtype)
    for s in range(min(kmax, 2 * nsl - 2) + 1):
        combos = [(i, s - i) for i in range(max(0, s - nsl + 1),
                                            min(nsl - 1, s) + 1)]
        g = take(*combos[0])
        for i, j in combos[1:]:
            g = g + take(i, j)
        out = out + g.astype(x.dtype) * (2.0 ** (-6 * (s + 2)))
    return out * sa[:, 0].astype(x.dtype) * sx.astype(x.dtype)


def _refined_solve_f64(A: jnp.ndarray, b: jnp.ndarray,
                       iters: int = 12) -> jnp.ndarray:
    """f64-contract solve for LARGE (NEQ >= 8k) systems: f32 Cholesky factor
    + EXACT-f64-residual refinement to the f64 floor.

    Valid because the Tikhonov-regularized big B-spline systems are far
    better conditioned than the raw polynomial ones: measured on the
    flagship NIRCam 13,226-dof system, cond(equilibrated) ~ 1.1e7 so
    cond*eps32 ~ 0.65 < 1 and each refinement step contracts the error ~60x
    (5 steps: 2.9e-4 -> 1.1e-11 max-rel vs the f64 LU oracle —
    tools/diag_nircam_f64.py). The residual matvecs run HIGHEST-precision
    (exact f64 route, ~n^2 work — cheap); the n^3 factorization stays f32 on
    the fast MXU path, unlike _exact_solve's slow exact-f64 trailing updates
    which would cost tens of seconds at this size. The while_loop stops at
    the residual floor, so extra iterations are free when converged early.
    Reference bar: full-f64 LU (sfft/BSplineSFFT.py:3702-3787).

    Validity domain: the equilibrated system must be numerically positive
    definite IN f32 — cond_eq alone does not decide this; the spectrum shape
    does. A synthetic n=13207 system with a dense logspace(0,-7) spectrum
    breaks the f32 factor (LAPACK agrees: minor 10707 not PD) while the real
    regularized NIRCam system at the same cond_eq ~1.1e7 factors fine. On
    breakdown the factor is NaN and the returned solution is all-NaN (NaN
    sticks through every x update; the sliced residual of a NaN x is finite
    garbage so the loop runs its full iteration budget, but x itself can
    never recover) — loudly visible, never silently wrong. The production
    gate (solve_system: NEQ >= 8192
    requires Tikhonov regularization ON) keeps user systems in the valid
    class; raising regularize_lambda is the documented recovery."""
    d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A)) + jnp.finfo(A.dtype).tiny)
    bs = b * d
    hp = jax.lax.Precision.HIGHEST
    on_tpu = jax.default_backend() not in ("cpu", "gpu")

    if on_tpu:
        # TPU: (1) the equilibrated system rides as int8 slices + its f32 hi
        # part — the f64 (n, n) equilibrated matrix exists only as a
        # transient inside the slicing; residual matvecs go through
        # _sliced_matvec (~5 ms vs 142.8 ms for the HIGHEST f64 matvec at
        # 13k, measured 2026-08-19). (2) explicit L^-1: each refinement
        # application becomes two f32 MATVECs instead of two big library
        # triangular solves whose serial panel chains dominated the 13k-dof
        # solve latency. Built BLOCKED (_tri_inverse_f32): a single library
        # solve_triangular against I at n=13k lowers to ~38 GB of
        # dynamic-update-slice HLO temps and fails compile on a 16 GB v5e.
        # CPU keeps the f64-matvec trisolve route so the parity-oracle path
        # is an independent implementation.
        Ah, Asl_flat, sa, chk = _sliced_residual_setup(A, d)
        L32 = jnp.linalg.cholesky(Ah)
        Li32 = _tri_inverse_f32(L32)

        def f32_solve(r):
            # precision=HIGHEST: TPU DEFAULT f32 dots are bf16-grade
            y = jnp.dot(Li32, r.astype(jnp.float32), precision=hp)
            return jnp.dot(Li32.T, y, precision=hp).astype(b.dtype)

        def residual(x):
            return bs - _sliced_matvec(Asl_flat, sa, x, chunk=chk)
    else:
        As = A * d[:, None] * d[None, :]
        L32 = jnp.linalg.cholesky(As.astype(jnp.float32))

        def f32_solve(r):
            y = jax.scipy.linalg.solve_triangular(
                L32, r.astype(jnp.float32), lower=True)
            return jax.scipy.linalg.solve_triangular(
                L32.T, y, lower=False).astype(b.dtype)

        def residual(x):
            return bs - jnp.dot(As, x, precision=hp)

    x = f32_solve(bs)
    bnorm = jnp.linalg.norm(bs)

    def body(state):
        k, x, _ = state
        r = residual(x)
        return k + 1, x + f32_solve(r), jnp.linalg.norm(r)

    def cond(state):
        k, _, rn = state
        return jnp.logical_and(k < iters, rn > 1e-15 * bnorm)

    _, x, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), x, bnorm))
    return x * d


def _legendre_congruence(degree: int) -> np.ndarray:
    """Static change of basis C for the triangular 2-D monomial terms
    {x^i y^j : i+j <= degree} (enumeration of indices.ref_basis_exponents)
    into tensor products of SHIFTED Legendre polynomials on [0,1].

    column ij of C holds the monomial coefficients of the Legendre term, so
    for spatial-basis values U (npix, Fij): U_legendre = U @ C. Shifted
    Legendre polynomials have INTEGER coefficients (P~0=1, P~1=2t-1,
    P~2=6t^2-6t+1, P~3=20t^3-30t^2+12t-1), so C is an exact integer matrix
    and the congruence T' A T is computed backward-stably in f64.

    Why: the monomial spatial terms are nearly collinear over the image
    domain — measured on the real 512^2 bench system they contribute a
    factor ~600x to cond(equilibrated) (3.4e8 raw -> 5.6e5 after this
    congruence; tools/diag_cond_structure.py). In the Legendre basis the
    normal system is well-enough conditioned that an f32 Cholesky factor +
    exact-f64-residual refinement converges to the f64 floor (cond*eps32
    ~0.03 << 1), replacing the exact-f64 blocked factorization's long
    sequential dispatch chain with a handful of library ops."""
    P1 = {
        0: [1],
        1: [-1, 2],
        2: [1, -6, 6],
        3: [-1, 12, -30, 20],
    }
    terms = [(i, j) for i in range(degree + 1) for j in range(degree + 1 - i)]
    F = len(terms)
    C = np.zeros((F, F))
    for col, (p, q) in enumerate(terms):
        cp, cq = P1[p], P1[q]
        for row, (r, s) in enumerate(terms):
            if r < len(cp) and s < len(cq):
                C[row, col] = cp[r] * cq[s]
    return C


def _transformed_solve(cfg: SFFTConfig, lhs: jnp.ndarray, rhs: jnp.ndarray,
                       iters: int = 10) -> jnp.ndarray:
    """Contract-grade solve of the FULL (untweaked) polynomial ENTANGLED
    system via a static Legendre congruence + f32-Cholesky refinement, with a
    certified fallback to the unconditional exact solver.

    Pipeline (all structured ops — reshapes, (Fij x Fij) einsums, library
    f32 factorizations; no O(NEQ) sequential dispatch chains):
      1. y-space change of variables x = S z. S mixes the spatial index of
         every kernel dof through the integer Legendre matrix C
         (_legendre_congruence) and the background dofs through C_bkg. The
         ConstPhotRatio constraint (x_{ij,center}=0 for ij>=1, reference
         "forbidden stripes", sfft/sfftcore/SFFTSubtract.py:525-532) is kept
         EXACTLY: because C z|_center must equal (t,0,...,0), the center-ab
         column block of S degenerates to the single passthrough column
         e_{(0,center)}, and the ij>=1 center columns are zero — their rows/
         cols of S'AS vanish identically and are diagonal-pinned to 1.
      2. A~ = S'AS, b~ = S'b in f64 (HIGHEST): backward-stable since C is a
         small integer matrix — forward effect <= cond(A~_eq) * depth*eps64
         ~1e-8, inside the f64 band of the original solve.
      3. Jacobi equilibration, f32 Cholesky + explicit f32 L^-1 (two library
         ops), exact-f64-residual refinement to the f64 floor (measured on
         the real 512^2 system: 2 refinements reach 2.9e-8 max-rel vs the
         original-basis LAPACK solution — identical to the exact solver's
         conditioning floor cond*eps64).
      4. Certificate: if the final exact residual hasn't converged
         (||r|| > 1e-12 ||b~||, or NaN — e.g. images whose kernel-shift
         collinearity pushes cond(A~_eq)*eps32 past 1 so the f32-factor
         iteration stalls), lax.cond into _exact_solve on the SAME
         transformed system — the unconditional sliced-f64 route. The
         contract therefore never depends on the conditioning win.
    Returns the NEQ solution in the ORIGINAL basis (removed dofs exactly 0).
    """
    from sfft_tpu.core.indices import kernel_sum_dof_index

    Fij, Fab, Fijab, Fpq = cfg.Fij, cfg.Fab, cfg.Fijab, cfg.Fpq
    c = cfg.center_ab
    hp = jax.lax.Precision.HIGHEST
    C = _legendre_congruence(cfg.kernel_basis.degree)
    if Fpq > 1 and cfg.bg_basis.kind == "polynomial":
        Cb = _legendre_congruence(cfg.bg_basis.degree)
    else:
        Cb = np.eye(max(Fpq, 1))
    removed = (kernel_sum_dof_index(cfg)[1:].astype(np.int32)
               if cfg.const_phot_ratio else np.zeros((0,), np.int32))
    Cj = jnp.asarray(C, lhs.dtype)
    Cbj = jnp.asarray(Cb, lhs.dtype)

    def S_cols(M):
        # M (r, NEQ) -> M @ S
        r = M.shape[0]
        K = M[:, :Fijab].reshape(r, Fij, Fab)
        K2 = jnp.einsum("ria,ij->rja", K, Cj, precision=hp)
        if removed.size:
            K2 = K2.at[:, 1:, c].set(0.0)
            K2 = K2.at[:, 0, c].set(K[:, 0, c])
        parts = [K2.reshape(r, Fijab)]
        if Fpq:
            parts.append(jnp.dot(M[:, Fijab:], Cbj, precision=hp))
        return jnp.concatenate(parts, axis=1)

    def S_vec(z):
        # x = S z (back to the original basis)
        Zk = z[:Fijab].reshape(Fij, Fab)
        X = jnp.einsum("ja,ij->ia", Zk, Cj, precision=hp)
        if removed.size:
            X = X.at[1:, c].set(0.0)
            X = X.at[0, c].set(Zk[0, c])
        parts = [X.reshape(Fijab)]
        if Fpq:
            parts.append(jnp.dot(Cbj, z[Fijab:], precision=hp))
        return jnp.concatenate(parts)

    At = S_cols(S_cols(lhs).T)
    bt = S_cols(rhs[None, :])[0]
    if removed.size:
        At = At.at[removed, removed].set(1.0)
        bt = bt.at[removed].set(0.0)  # exact zeros already; keep explicit

    d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(At)) + jnp.finfo(At.dtype).tiny)
    As = At * d[:, None] * d[None, :]
    bs = bt * d
    L32 = jnp.linalg.cholesky(As.astype(jnp.float32))
    Li32 = jax.scipy.linalg.solve_triangular(
        L32, jnp.eye(L32.shape[0], dtype=jnp.float32), lower=True)

    def f32_solve(r):
        # precision=HIGHEST: TPU DEFAULT f32 dots are bf16-grade
        y = jnp.dot(Li32, r.astype(jnp.float32), precision=hp)
        return jnp.dot(Li32.T, y, precision=hp).astype(bt.dtype)

    x = f32_solve(bs)
    bnorm = jnp.linalg.norm(bs)

    def body(state):
        k, x, _ = state
        r = bs - jnp.dot(As, x, precision=hp)
        return k + 1, x + f32_solve(r), jnp.linalg.norm(r)

    def cond_fn(state):
        k, _, rn = state
        return jnp.logical_and(k < iters, rn > 1e-15 * bnorm)

    _, x, _ = jax.lax.while_loop(cond_fn, body, (jnp.int32(0), x, bnorm))
    rn = jnp.linalg.norm(bs - jnp.dot(As, x, precision=hp))
    ok = rn <= 1e-12 * bnorm  # False on NaN -> fallback

    y = jax.lax.cond(ok, lambda _: x * d,
                     lambda _: _exact_solve(At, bt), None)
    return S_vec(y)


def _refined_solve(A: jnp.ndarray, b: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Equilibrated float32 LU + float64-residual iterative refinement.

    The TPU story: on-device f64 LU does not compile and true-f64 Cholesky is
    slow, but f32 LU is fast and f64 matvecs are exact. Jacobi equilibration
    tames the wildly different column scales of the SFFT system (polynomial
    coordinate powers), then each refinement step recovers ~7 digits until the
    f64 residual floor. Converges when cond(D A D) * eps32 << 1."""
    d = 1.0 / jnp.sqrt(jnp.abs(jnp.diagonal(A)) + jnp.finfo(A.dtype).tiny)
    As = A * d[:, None] * d[None, :]
    bs = b * d
    A32 = As.astype(jnp.float32)
    if A.dtype == jnp.float32:
        As = A32  # f32-assembled system: residuals can't beat f32 anyway
    if A.shape[0] >= 8192:
        # XLA's f32 LU panel blows the 16MB scoped-VMEM limit above ~10k on
        # v5e; the system is a (regularized) Gram matrix, so Cholesky is valid
        L32 = jnp.linalg.cholesky(A32)

        def f32_solve(r):
            y = jax.scipy.linalg.solve_triangular(L32, r.astype(jnp.float32),
                                                  lower=True)
            return jax.scipy.linalg.solve_triangular(
                L32.T, y, lower=False).astype(b.dtype)
    else:
        lu, piv = jax.scipy.linalg.lu_factor(A32)

        def f32_solve(r):
            return jax.scipy.linalg.lu_solve(
                (lu, piv), r.astype(jnp.float32)).astype(b.dtype)

    # Fast-mode solver: its end-to-end accuracy is limited by the
    # mixed-precision TABLES well before the solver floor (bench fast-mode
    # parity is identical under plain refinement, 8-step PCG and 100-step
    # PCG — all stall at cond*eps32 > 1 anyway), so take the cheapest route.
    # The f64-contract path is solver='exact' (_exact_solve below).
    x = f32_solve(bs)
    for _ in range(iters):
        r = bs - As @ x
        x = x + f32_solve(r)
    return x * d


def _contig_segments(idx: np.ndarray):
    """Split a sorted index array into contiguous [start, stop) segments."""
    segs = []
    start = prev = int(idx[0])
    for v in idx[1:]:
        v = int(v)
        if v == prev + 1:
            prev = v
            continue
        segs.append((start, prev + 1))
        start = prev = v
    segs.append((start, prev + 1))
    return segs


def _select_rows_cols(M: jnp.ndarray, idx: np.ndarray) -> jnp.ndarray:
    """M[ix_(idx, idx)] via contiguous slice concatenation.

    The tweak removes only a handful of dofs, so idx is a few contiguous runs;
    slicing+concat lowers to bulk copies, where a 1.7e8-element fancy gather
    costs seconds on TPU."""
    segs = _contig_segments(np.asarray(idx))
    rows = jnp.concatenate([M[a:b, :] for a, b in segs], axis=0)
    return jnp.concatenate([rows[:, a:b] for a, b in segs], axis=1)


def _tweak_plan(cfg: SFFTConfig):
    """Static tweak indices per scaling mode (reference TweakLS/Restore_Solution,
    sfft/BSplineSFFT.py:2170-2338).

    Returns (pres_idx, aggregate, ij00):
      pres_idx: LS indices kept in the tweaked system (None = no tweak)
      aggregate: True for the B-spline SEPARATE-CONSTANT case, where the key
        center dof becomes the SUM over all Fij center dofs (the B-spline basis
        has no constant member, but is a partition of unity, so constant
        scaling = equal coefficients aggregated into one dof).
    """
    from sfft_tpu.core.indices import kernel_sum_dof_index

    ij00 = kernel_sum_dof_index(cfg)
    mode = cfg.scaling_mode
    if mode == "ENTANGLED":
        if not cfg.const_phot_ratio:
            return None, False, ij00
        pres = stripe_indices(cfg)
        return (None if len(pres) == cfg.NEQ else pres), False, ij00
    if mode == "SEPARATE-CONSTANT":
        pres = np.setdiff1d(np.arange(cfg.NEQ), ij00[1:]).astype(np.int32)
        return pres, cfg.kernel_basis.kind == "bspline", ij00
    # SEPARATE-VARYING
    if cfg.ScaFij == cfg.Fij:
        return None, False, ij00
    pres = np.setdiff1d(np.arange(cfg.NEQ), ij00[cfg.ScaFij :]).astype(np.int32)
    return pres, False, ij00


def solve_system(
    cfg: SFFTConfig, lhs: jnp.ndarray, rhs: jnp.ndarray
) -> jnp.ndarray:
    """Solve, honoring the scaling-mode system tweak. Returns the NEQ-length
    solution with removed dofs re-inserted (zeros, or the shared constant for
    aggregated B-spline scaling)."""
    if (cfg.solver in ("exact", "transformed")
            and lhs.dtype == jnp.float64
            and cfg.scaling_mode == "ENTANGLED"
            and cfg.kernel_basis.kind == "polynomial"
            and (cfg.solver == "transformed"
                 or jax.default_backend() not in ("cpu", "gpu"))):
        # polynomial ENTANGLED f64 contract on TPU: Legendre congruence +
        # f32-factor refinement with certified exact fallback — the tweak
        # (stripe removal) is carried exactly inside the transform. The CPU
        # 'exact' route stays on the reduced blocked-f64 path so the parity
        # oracle is an independent implementation; solver='transformed'
        # forces this path on any backend (tests).
        return _transformed_solve(cfg, lhs, rhs)

    pres, aggregate, ij00 = _tweak_plan(cfg)
    reduced = pres is not None
    if reduced:
        A = _select_rows_cols(lhs, pres)
        b = rhs[pres]
        if aggregate:
            key = int(ij00[0])  # pres_idx[key] == key (indices below unchanged)
            rowsum = jnp.sum(lhs[np.ix_(ij00, pres)], axis=0)
            colsum = jnp.sum(lhs[np.ix_(pres, ij00)], axis=1)
            allsum = jnp.sum(lhs[np.ix_(ij00, ij00)])
            A = A.at[key, :].set(rowsum)
            A = A.at[:, key].set(colsum)
            A = A.at[key, key].set(allsum)
            b = b.at[key].set(jnp.sum(rhs[ij00]))
    else:
        A, b = lhs, rhs
    idx = pres

    if cfg.solver == "lu":
        x = jnp.linalg.solve(A, b)
    elif cfg.solver == "cho":
        c, low = jax.scipy.linalg.cho_factor(A, lower=True)
        x = jax.scipy.linalg.cho_solve((c, low), b)
    elif cfg.solver == "host":
        x = _host_solve(A, b)
    elif cfg.solver == "refined":
        x = _refined_solve(A, b)
    elif cfg.solver == "exact":
        if A.dtype == jnp.float32:
            # f32-assembled system (non-contract fast configs): residuals
            # cannot beat f32 anyway
            x = _refined_solve(A, b)
        elif A.shape[0] >= 8192 and cfg.regularize_lambda > 0 and cfg.reg_xy:
            # large f64 systems (13k-dof NIRCam): f32 factor + exact-f64
            # residual refinement reaches the f64 floor (see docstring).
            # Gated on Tikhonov regularization being ON — that is what keeps
            # cond(equilibrated) ~1e7 so the f32-factor iteration converges
            # (cond*eps32 < 1). An unregularized giant system can reach
            # cond_eq ~3e8 where this iteration stalls, so it takes the
            # slow-but-unconditional exact route below instead.
            x = _refined_solve_f64(A, b)
        else:
            x = _exact_solve(A, b)
    elif cfg.solver == "transformed":
        raise ValueError(
            "solver='transformed' requires an f64 polynomial ENTANGLED config")
    elif cfg.solver == "blocked_cho":
        L = _blocked_cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
        x = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
    else:
        raise ValueError(f"unknown solver {cfg.solver!r}")

    if reduced:
        sol = jnp.zeros((cfg.NEQ,), x.dtype).at[idx].set(x)
        if aggregate:
            sol = sol.at[ij00[1:]].set(x[int(ij00[0])])
    else:
        sol = x
    return sol
