"""Independent numpy oracle for the SFFT linear model.

Builds the *explicit dense design matrix* of the SFFT least-squares problem in
the spatial domain (circular shifts, no FFTs, no correlation identities) and
solves the normal equations directly. Completely independent of the engine's
Fourier/gather machinery, so agreement validates all of the engine's index and
scale bookkeeping.

Model (from the reference's Construct_FDIFF semantics,
sfft/sfftcore/SFFTConfigure.py:734-809):

  J ~ sum_{ij,ab} a_ijab * SCALE * X_ijab + sum_pq b_pq * T_pq
  X_ijab = roll(I * beta_ij, (a, b)) - I * beta_ij   for (a, b) != (0, 0)
  X_ij00 = I * beta_ij

with beta_ij(x, y) = cx^i * cy^j, cx = (row+1)/N0, cy = (col+1)/N1.
"""

from __future__ import annotations

import numpy as np


def poly_exponents(d: int) -> list:
    return [(i, j) for i in range(d + 1) for j in range(d + 1 - i)]


def ab_offsets(w0: int, w1: int) -> list:
    return [(ap - w0, bp - w1) for ap in range(2 * w0 + 1) for bp in range(2 * w1 + 1)]


def basis_planes_np(N0, N1, d):
    cx = (np.arange(N0, dtype=np.float64) + 1.0) / N0
    cy = (np.arange(N1, dtype=np.float64) + 1.0) / N1
    return np.stack([np.outer(cx**i, cy**j) for (i, j) in poly_exponents(d)])


def design_matrix(I, N0, N1, w0, w1, DK, DB):
    SCALE = 1.0 / (N0 * N1)
    Bk = basis_planes_np(N0, N1, DK)
    Tq = basis_planes_np(N0, N1, DB)
    cols = []
    for SIij in Bk * I[None]:
        for (a, b) in ab_offsets(w0, w1):
            if a == 0 and b == 0:
                cols.append(SCALE * SIij)
            else:
                cols.append(SCALE * (np.roll(SIij, (a, b), axis=(0, 1)) - SIij))
    for T in Tq:
        cols.append(T)
    return np.stack([c.ravel() for c in cols], axis=1)  # (P, NEQ)


def stripe_free_indices(w0, w1, DK, DB):
    L0, L1 = 2 * w0 + 1, 2 * w1 + 1
    Fab = L0 * L1
    Fij = len(poly_exponents(DK))
    Fpq = len(poly_exponents(DB))
    neq = Fij * Fab + Fpq
    center = w0 * L1 + w1
    forbidden = [ij * Fab + center for ij in range(1, Fij)]
    mask = np.ones(neq, dtype=bool)
    mask[forbidden] = False
    return np.where(mask)[0]


def solve_oracle(I, J, w0, w1, DK=2, DB=2, const_phot_ratio=True):
    """Solve the normal equations of the explicit design matrix."""
    N0, N1 = I.shape
    X = design_matrix(I, N0, N1, w0, w1, DK, DB)
    keep = (
        stripe_free_indices(w0, w1, DK, DB)
        if const_phot_ratio
        else np.arange(X.shape[1])
    )
    Xk = X[:, keep]
    A = Xk.T @ Xk
    b = Xk.T @ J.ravel()
    sol_k = np.linalg.solve(A, b)
    sol = np.zeros(X.shape[1])
    sol[keep] = sol_k
    return sol


def model_image(I, solution, w0, w1, DK=2, DB=2):
    N0, N1 = I.shape
    X = design_matrix(I, N0, N1, w0, w1, DK, DB)
    return (X @ solution).reshape(N0, N1)
