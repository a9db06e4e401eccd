"""Where does the contract system's cond_eq ~3e8 live?

Decomposes the conditioning of the (reduced, equilibrated) normal system at a
given size into its two structural sources:
  * spatial-term collinearity (monomial x^p y^q near-collinearity across ij
    for a fixed kernel dof) — fixable by a STATIC change of basis
    (Legendre-like congruence I_ab (x) C_poly);
  * kernel-shift collinearity (smooth images make neighboring kernel shifts
    nearly identical) — image-dependent, not fixable statically.

Prints cond (2-norm) of: raw equilibrated; after I(x)C_poly congruence
(+re-equilibration); the ij=0 kernel sub-block alone; the ab=center spatial
sub-block alone. Run on CPU: python tools/diag_cond_structure.py [n]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def legendre_c(degree: int) -> np.ndarray:
    """Upper-triangular C mapping monomial coeffs -> shifted-Legendre basis
    on [0,1]^2, total degree <= degree, term order matching config's ij
    enumeration (p-major, same as reference's Create_Spatial_Terms)."""
    from numpy.polynomial import legendre as L

    # 1-D shifted Legendre P_k(2t-1) as monomial coefficient columns
    deg1 = degree + 1
    C1 = np.zeros((deg1, deg1))
    for k in range(deg1):
        c = L.leg2poly([0.0] * k + [1.0])          # P_k in monomial basis of x
        # substitute x = 2t - 1
        poly = np.polynomial.Polynomial(c)(
            np.polynomial.Polynomial([-1.0, 2.0]))
        C1[: k + 1, k] = poly.coef[: k + 1]
    # 2-D tensor terms (p, q) with p + q <= degree, enumeration p-major
    terms = [(p, q) for p in range(deg1) for q in range(deg1 - p)]
    F = len(terms)
    C = np.zeros((F, F))
    for col, (p, q) in enumerate(terms):
        for row, (r, s) in enumerate(terms):
            C[row, col] = C1[r, p] * C1[s, q]
    return C


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from bench import make_pair, cpu_tables
    from sfft_tpu.config import make_config
    from sfft_tpu.core.solve import _tweak_plan

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    w = 8
    I_np, J_np = make_pair(n)
    _, lhs, rhs = cpu_tables(w, n, I_np, J_np,
                             lambda *a: print(*a, flush=True))
    cfg = make_config(n, n, w, dtype="float64")
    pres, agg, ij00 = _tweak_plan(cfg)
    A = lhs[np.ix_(pres, pres)] if pres is not None else lhs
    print(f"n={n} NEQ={cfg.NEQ} reduced={A.shape[0]} Fij={cfg.Fij} "
          f"Fab={cfg.Fab} Fpq={cfg.Fpq}", flush=True)

    def eq(M):
        d = 1.0 / np.sqrt(np.abs(np.diagonal(M)))
        return M * d[:, None] * d[None, :]

    def cond(M, tag):
        s = np.linalg.svd(M, compute_uv=False)
        print(f"  cond {tag:34s} {s[0] / s[-1]:.3e}", flush=True)
        return s[0] / s[-1]

    As = eq(A)
    cond(As, "equilibrated (raw)")

    # sub-block conditioning: ij=0 kernel block (all ab, first Fab dofs)
    cond(As[: cfg.Fab, : cfg.Fab], "kernel block ij=0 (Fab x Fab)")

    # spatial block: ab = center, dofs ij*Fab + center (ij=0 only survives
    # reduction; use a non-center ab instead to see Fij x Fij collinearity)
    ab = 0  # corner kernel dof, present for all ij
    # map original indices -> reduced positions
    pos = {int(v): i for i, v in enumerate(pres)} if pres is not None else None
    sp_idx = [pos[ij * cfg.Fab + ab] if pos else ij * cfg.Fab + ab
              for ij in range(cfg.Fij)]
    cond(As[np.ix_(sp_idx, sp_idx)], "spatial block ab=corner (Fij x Fij)")

    # static Legendre congruence on the spatial index of the kernel dofs
    C_poly = legendre_c(cfg.kernel_basis.degree)
    NEQr = A.shape[0]
    T = np.eye(NEQr)
    # kernel dofs: reduced index of (ij, ab); build blockwise for each ab
    for abk in range(cfg.Fab):
        ids = []
        for ij in range(cfg.Fij):
            orig = ij * cfg.Fab + abk
            if pos is None:
                ids.append(orig)
            elif orig in pos:
                ids.append(pos[orig])
        if len(ids) == cfg.Fij:
            T[np.ix_(ids, ids)] = C_poly
    # background dofs: same congruence on the Fpq monomials (if same degree)
    if cfg.Fpq == cfg.Fij:
        bidx = [(pos[cfg.Fijab + k] if pos else cfg.Fijab + k)
                for k in range(cfg.Fpq)]
        T[np.ix_(bidx, bidx)] = C_poly
    At = T.T @ A @ T
    cond(eq(At), "I(x)C_legendre + re-equilibrated")

    # how much of the remainder is kernel-shift collinearity: compare with a
    # fully random well-spread kernel basis would require a basis change on
    # ab — report the ij=0 block of the transformed system for reference
    cond(eq(At)[: cfg.Fab, : cfg.Fab], "kernel block after congruence")


if __name__ == "__main__":
    main()
