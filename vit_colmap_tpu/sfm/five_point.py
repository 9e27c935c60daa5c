"""Batched five-point essential-matrix solver (Nister's minimal problem).

COLMAP estimates E from calibrated pairs with the 5-point minimal solver
(the reference consumes the resulting two-view configs,
``vit_colmap/utils/metrics.py:120-132``).  Round 2 shipped an 8-point
essential RANSAC; the minimal 5-sample solver raises RANSAC's per-sample
success probability from w^8 to w^5 — decisive at low inlier ratios.

Classic implementations run a Gröbner/Gauss-Jordan elimination with
hardcoded Maple-generated tables and extract roots from a companion-matrix
eigendecomposition — both hostile to TPUs (data-dependent pivots, complex
eigensolves).  This implementation is a *hidden-variable resultant* design
built for batched XLA execution:

1. the 4-dim right-nullspace of the 5x9 epipolar matrix comes from blocked
   inverse iteration with Cholesky solves (no SVD — see
   ``sfm/geometry._smallest_eigvec_sym`` for why),
2. ``E = x*X + y*Y + z*Z + W`` is expanded through the 10 cubic constraints
   (det E = 0 and 2*E*Et*E - tr(E*Et)*E = 0) **symbolically at trace time**:
   a tiny polynomial class over (x, y) monomials with z-coefficient vectors
   builds the 10x10x4 coefficient tensor of M(z) with plain fused
   multiply-adds — no runtime bookkeeping,
3. ``det M(z)`` is a degree-10 polynomial in z (column-degree argument:
   4 cubic-monomial columns carry z-degree 0, the quadratic/linear/constant
   columns carry 1/2/3 -> 3*1 + 2*2 + 1*3 = 10).  Its coefficients are
   recovered *exactly* by evaluating the determinant at 16 static Chebyshev
   nodes (unrolled partial-pivot elimination — pure arithmetic) and
   applying a precomputed pseudo-inverse Vandermonde (a static 11x16
   matmul),
4. real roots come from a tan-spaced sign-change sweep plus fixed-depth
   bisection (every hypothesis takes the same, fully-vectorized path),
5. each root's (x, y) is read from the nullvector of M(z*) (Cholesky
   inverse iteration again) and the candidate E is projected onto the
   essential manifold.

Spurious resultant roots and w≈0 solutions are harmless by construction:
candidates are scored by inlier count inside RANSAC, so a wrong candidate
merely loses.  Up to 10 candidates are returned per sample with a validity
mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.sfm.geometry import (
    _smallest_eigvec_sym,
    project_to_essential,
)

# ---------------------------------------------------------------------------
# Trace-time polynomial algebra: (x, y) monomials with z-coefficient vectors.
# ---------------------------------------------------------------------------

_ZD = 4  # z-degree slots (degree <= 3)


def _zmul(a, b):
    """Product of two z-polynomials (..., 4) x (..., 4) -> (..., 4).

    Exact: every term produced here has total degree <= 3, so the
    truncation never drops a nonzero coefficient.
    """
    out = [None] * _ZD
    for i in range(_ZD):
        for j in range(_ZD - i):
            t = a[..., i] * b[..., j]
            out[i + j] = t if out[i + j] is None else out[i + j] + t
    return jnp.stack([o for o in out], axis=-1)


class _Poly:
    """Polynomial in (x, y) whose coefficients are z-polynomials.

    ``terms`` maps (px, py) -> (..., 4) array.  All arithmetic happens at
    trace time; XLA sees only the flat multiply-add graph.
    """

    __slots__ = ("terms",)

    def __init__(self, terms):
        self.terms = terms

    def __add__(self, other):
        t = dict(self.terms)
        for k, v in other.terms.items():
            t[k] = t[k] + v if k in t else v
        return _Poly(t)

    def __sub__(self, other):
        t = dict(self.terms)
        for k, v in other.terms.items():
            t[k] = t[k] - v if k in t else -v
        return _Poly(t)

    def __mul__(self, other):
        t = {}
        for (p1, q1), a in self.terms.items():
            for (p2, q2), b in other.terms.items():
                k = (p1 + p2, q1 + q2)
                v = _zmul(a, b)
                t[k] = t[k] + v if k in t else v
        return _Poly(t)

    def scale(self, s):
        return _Poly({k: v * s for k, v in self.terms.items()})


def _entry_poly(X, Y, Z, W, i, j):
    """E_ij as a _Poly: x*X_ij + y*Y_ij + (z*Z_ij + W_ij)."""
    zeros = jnp.zeros_like(W[..., i, j])

    def zvec(c0, c1):
        return jnp.stack([c0, c1, zeros, zeros], axis=-1)

    return _Poly({
        (1, 0): zvec(X[..., i, j], zeros),
        (0, 1): zvec(Y[..., i, j], zeros),
        (0, 0): zvec(W[..., i, j], Z[..., i, j]),
    })


# The 10 (x, y)-monomials of a cubic: this ordering fixes M(z)'s columns.
_MONOMIALS = [
    (3, 0), (2, 1), (1, 2), (0, 3),  # cubic in (x, y): z-degree 0
    (2, 0), (1, 1), (0, 2),          # quadratic:       z-degree <= 1
    (1, 0), (0, 1),                  # linear:          z-degree <= 2
    (0, 0),                          # constant:        z-degree <= 3
]
_MONO_INDEX = {m: i for i, m in enumerate(_MONOMIALS)}
_IDX_X = _MONO_INDEX[(1, 0)]
_IDX_Y = _MONO_INDEX[(0, 1)]
_IDX_1 = _MONO_INDEX[(0, 0)]
_IDX_X2 = _MONO_INDEX[(2, 0)]
_IDX_XY = _MONO_INDEX[(1, 1)]
_IDX_Y2 = _MONO_INDEX[(0, 2)]


def _constraint_tensor(X, Y, Z, W):
    """The 10 cubic constraints as a (..., 10, 10, 4) tensor.

    Axis -3: equation (det E, then the 9 trace-constraint entries).
    Axis -2: (x, y) monomial (``_MONOMIALS`` order).
    Axis -1: z-coefficients.
    """
    E = [[_entry_poly(X, Y, Z, W, i, j) for j in range(3)] for i in range(3)]

    polys = []
    # det(E) = 0.
    det = (
        E[0][0] * (E[1][1] * E[2][2] - E[1][2] * E[2][1])
        - E[0][1] * (E[1][0] * E[2][2] - E[1][2] * E[2][0])
        + E[0][2] * (E[1][0] * E[2][1] - E[1][1] * E[2][0])
    )
    polys.append(det)

    # 2 E Et E - tr(E Et) E = 0 (all 9 entries).
    G = [[None] * 3 for _ in range(3)]  # E Et
    for i in range(3):
        for j in range(3):
            G[i][j] = E[i][0] * E[j][0] + E[i][1] * E[j][1] + E[i][2] * E[j][2]
    tr = G[0][0] + G[1][1] + G[2][2]
    two = jnp.full((), 2.0, dtype=W.dtype)
    for i in range(3):
        for j in range(3):
            ge = G[i][0] * E[0][j] + G[i][1] * E[1][j] + G[i][2] * E[2][j]
            polys.append(ge.scale(two) - tr * E[i][j])

    # Assemble the coefficient tensor.
    zeros = jnp.zeros(jnp.broadcast_shapes(W[..., 0, 0].shape) + (_ZD,),
                      W.dtype)
    rows = []
    for p in polys:
        cols = [p.terms.get(m, zeros) for m in _MONOMIALS]
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)  # (..., 10, 10, 4)


# ---------------------------------------------------------------------------
# Determinant of M(z) -> degree-10 polynomial via static-node interpolation.
# ---------------------------------------------------------------------------

_N_NODES = 16
_DET_DEG = 10
# Static Chebyshev nodes and the pseudo-inverse Vandermonde (f64 -> f32).
_NODES = np.cos((2 * np.arange(_N_NODES) + 1) / (2.0 * _N_NODES) * np.pi)
_VAND = np.stack([_NODES**k for k in range(_DET_DEG + 1)], axis=1)  # 16x11
_VAND_PINV = np.linalg.pinv(_VAND).astype(np.float32)  # 11x16


def _det10(M):
    """Determinant of batched (..., 10, 10) via unrolled partial-pivot
    Gaussian elimination — pure arithmetic, no LU custom call."""
    n = M.shape[-1]
    det = jnp.ones(M.shape[:-2], M.dtype)
    for k in range(n - 1):
        col = jnp.abs(M[..., k:, k])  # (..., n-k)
        p = jnp.argmax(col, axis=-1)  # pivot offset within remaining rows
        onehot = jax.nn.one_hot(p, n - k, dtype=M.dtype)  # (..., n-k)
        # Swap row k with row k+p via one-hot mixing.
        rows = M[..., k:, :]  # (..., n-k, n)
        pivot_row = jnp.einsum("...r,...rc->...c", onehot, rows)
        # Row that moves down into the pivot's old slot.
        rk = rows[..., 0, :]
        rows = rows - onehot[..., None] * (pivot_row - rk)[..., None, :]
        rows = rows.at[..., 0, :].set(pivot_row)
        det = det * jnp.where(p > 0, -1.0, 1.0)
        piv = rows[..., 0, k]
        det = det * piv
        safe = jnp.where(jnp.abs(piv) > 1e-30, piv, 1e-30)
        factors = rows[..., 1:, k] / safe[..., None]
        rows = rows.at[..., 1:, :].add(
            -factors[..., None] * rows[..., 0:1, :]
        )
        M = M.at[..., k:, :].set(rows)
    return det * M[..., n - 1, n - 1]


def _det_poly_coeffs(C):
    """(..., 10, 10, 4) constraint tensor -> (..., 11) coefficients of
    det M(z), lowest degree first."""
    nodes = jnp.asarray(_NODES, C.dtype)  # (16,)
    zpow = jnp.stack([nodes**k for k in range(_ZD)], axis=-1)  # (16, 4)
    # M at each node: (..., 16, 10, 10)
    Mn = jnp.einsum("...eqk,nk->...neq", C, zpow)
    dets = _det10(Mn)  # (..., 16)
    return jnp.einsum("cn,...n->...c", jnp.asarray(_VAND_PINV, C.dtype), dets)


# ---------------------------------------------------------------------------
# Real roots of a degree-10 polynomial: tan-grid sweep + fixed bisection.
# ---------------------------------------------------------------------------

_N_GRID = 512
_THETA_MAX = 1.55  # |z| <= tan(1.55) ~ 48
_GRID = np.tan(np.linspace(-_THETA_MAX, _THETA_MAX, _N_GRID)).astype(
    np.float32
)
_MAX_ROOTS = 10
_BISECT_ITERS = 40


def _polyval(coeffs, z):
    """Evaluate (..., 11) coefficients (lowest first) at z (broadcast)."""
    acc = coeffs[..., -1]
    for k in range(coeffs.shape[-1] - 2, -1, -1):
        acc = acc * z + coeffs[..., k]
    return acc


def _real_roots(coeffs):
    """(..., 11) -> (roots (..., 10), valid (..., 10)) via sign changes on
    the tan grid and fixed-depth bisection."""
    grid = jnp.asarray(_GRID, coeffs.dtype)
    vals = _polyval(coeffs[..., None, :], grid)  # (..., 512)
    s = jnp.sign(vals)
    change = (s[..., :-1] * s[..., 1:]) < 0  # (..., 511)
    big = jnp.int32(_N_GRID)
    pos = jnp.where(change, jnp.arange(_N_GRID - 1, dtype=jnp.int32), big)
    # First 10 sign-change cells, ascending.
    neg_topk, _ = jax.lax.top_k(-pos, _MAX_ROOTS)
    cells = -neg_topk[..., ::-1]
    valid = cells < big
    cells = jnp.minimum(cells, _N_GRID - 2)
    lo = grid[cells]
    hi = grid[cells + 1]
    flo = _polyval(coeffs[..., None, :], lo)
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        fmid = _polyval(coeffs[..., None, :], mid)
        go_left = (flo * fmid) <= 0
        hi = jnp.where(go_left, mid, hi)
        lo = jnp.where(go_left, lo, mid)
        flo = jnp.where(go_left, flo, fmid)
    return 0.5 * (lo + hi), valid


# ---------------------------------------------------------------------------
# Public solver.
# ---------------------------------------------------------------------------


def _nullspace_basis_4(Q):
    """Orthonormal 4-dim right-nullspace basis of (..., 5, 9) -> (..., 9, 4)
    via blocked inverse iteration with Cholesky solves + modified
    Gram-Schmidt (no SVD/QR custom calls)."""
    Q = Q / jnp.maximum(jnp.linalg.norm(Q, axis=-1, keepdims=True), 1e-12)
    A = jnp.einsum("...ni,...nj->...ij", Q, Q)  # (..., 9, 9) PSD, rank<=5
    tr = jnp.trace(A, axis1=-2, axis2=-1)[..., None, None]
    shift = 1e-6 * jnp.abs(tr) + 1e-12
    L = jnp.linalg.cholesky(A + shift * jnp.eye(9, dtype=A.dtype))
    bad = jnp.isnan(L).any(axis=(-2, -1), keepdims=True)
    L2 = jnp.linalg.cholesky(
        A + (1e-3 * jnp.abs(tr) + 1e-8) * jnp.eye(9, dtype=A.dtype)
    )
    L = jnp.where(bad, L2, L)

    # Deterministic full-rank start: 4 fixed unit directions.
    V = jnp.broadcast_to(
        jnp.eye(9, dtype=A.dtype)[:, :4], A.shape[:-2] + (9, 4)
    )
    for _ in range(8):
        Yv = jax.scipy.linalg.solve_triangular(L, V, lower=True)
        V = jax.scipy.linalg.solve_triangular(L, Yv, lower=True, trans=1)
        # Modified Gram-Schmidt over the 4 columns.
        cols = []
        for c in range(4):
            v = V[..., c]
            for u in cols:
                v = v - jnp.sum(v * u, axis=-1, keepdims=True) * u
            v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                                1e-30)
            cols.append(v)
        V = jnp.stack(cols, axis=-1)
    return V


def fit_essential_5pt(pts1n: jax.Array, pts2n: jax.Array):
    """Minimal 5-point essential solver, batched.

    Args: pts1n, pts2n — (..., 5, 2) *normalized* (K⁻¹) correspondences.
    Returns: (E (..., 20, 3, 3), valid (..., 20)) candidate essential
    matrices (unit Frobenius norm, on-manifold) with a validity mask.

    Two affine charts of the nullspace are solved (w = 1 with basis order
    (X, Y, Z, W) and with (W, Z, Y, X)): the w = 1 normalization is
    ill-conditioned in float32 when the true solution's component on W is
    small, and the two orthonormal charts have near-disjoint failure sets.
    """
    x1, y1 = pts1n[..., 0], pts1n[..., 1]
    x2, y2 = pts2n[..., 0], pts2n[..., 1]
    one = jnp.ones_like(x1)
    # Epipolar rows: p2ᵀ E p1 = 0 with E raveled row-major.
    Q = jnp.stack([
        x2 * x1, x2 * y1, x2,
        y2 * x1, y2 * y1, y2,
        x1, y1, one,
    ], axis=-1)  # (..., 5, 9)

    V = _nullspace_basis_4(Q)  # (..., 9, 4)
    basis = jnp.swapaxes(V, -1, -2).reshape(V.shape[:-2] + (4, 3, 3))
    X, Y, Z, W = (basis[..., k, :, :] for k in range(4))

    E1, v1 = _solve_chart(X, Y, Z, W)
    E2, v2 = _solve_chart(W, Z, Y, X)
    return (
        jnp.concatenate([E1, E2], axis=-3),
        jnp.concatenate([v1, v2], axis=-1),
    )


def _solve_chart(X, Y, Z, W):
    """Solve one affine chart E = x X + y Y + z Z + W -> 10 candidates."""
    C = _constraint_tensor(X, Y, Z, W)  # (..., 10, 10, 4)
    # Row-normalize each equation (pure conditioning, z-independent).
    rn = jnp.sqrt(jnp.sum(C * C, axis=(-2, -1), keepdims=True))
    C = C / jnp.maximum(rn, 1e-30)

    coeffs = _det_poly_coeffs(C)  # (..., 11)
    roots, valid = _real_roots(coeffs)  # (..., 10)

    # M(z*) for each root -> nullvector -> (x, y).
    zpow = jnp.stack([roots**k for k in range(_ZD)], axis=-1)  # (..., 10, 4)
    Mr = jnp.einsum("...eqk,...rk->...req", C, zpow)  # (..., 10, 10, 10)
    m = _smallest_eigvec_sym(
        jnp.einsum("...ne,...nq->...eq", Mr, Mr)
    )  # (..., 10, 10) nullvector per root (monomial vector)

    # x, y from monomial ratios; prefer the constant-normalized read, fall
    # back to degree-2/degree-1 ratios when the constant entry is tiny.
    c0 = m[..., _IDX_1]
    use_c = jnp.abs(c0) > 1e-5
    safe_c = jnp.where(use_c, c0, 1.0)
    x_c, y_c = m[..., _IDX_X] / safe_c, m[..., _IDX_Y] / safe_c
    xl = m[..., _IDX_X]
    yl = m[..., _IDX_Y]
    safe_x = jnp.where(jnp.abs(xl) > 1e-12, xl, 1e-12)
    safe_y = jnp.where(jnp.abs(yl) > 1e-12, yl, 1e-12)
    x_f = m[..., _IDX_X2] / safe_x
    y_f = m[..., _IDX_XY] / safe_x
    y_f2 = m[..., _IDX_Y2] / safe_y
    x_alt = jnp.where(jnp.abs(xl) > jnp.abs(yl), x_f,
                      m[..., _IDX_XY] / safe_y)
    y_alt = jnp.where(jnp.abs(xl) > jnp.abs(yl), y_f, y_f2)
    x = jnp.where(use_c, x_c, x_alt)
    y = jnp.where(use_c, y_c, y_alt)

    E = (
        x[..., None, None] * X[..., None, :, :]
        + y[..., None, None] * Y[..., None, :, :]
        + roots[..., None, None] * Z[..., None, :, :]
        + W[..., None, :, :]
    )
    finite = jnp.isfinite(E).all(axis=(-2, -1))
    E = jnp.where(finite[..., None, None], E, jnp.eye(3, dtype=E.dtype))
    E = project_to_essential(E)
    E = E / jnp.maximum(
        jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12
    )
    return E, valid & finite
