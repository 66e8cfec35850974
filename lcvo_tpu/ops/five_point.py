"""Batched Nistér five-point minimal solver for the essential matrix.

TPU-native equivalent of the minimal solver inside ``cv2.findEssentialMat``
(reference ``src/vo_pipeline.py:156`` uses the 5-point + RANSAC path). The 8-point
DLT (:mod:`lcvo_tpu.ops.epipolar`) remains the default easy-mode solver; this module
provides exact minimal-sample parity with the reference: 5 correspondences → up to
10 essential-matrix solutions.

Everything is fixed-shape and batched over hypotheses so RANSAC maps onto the MXU/VPU
with no data-dependent control flow:

1. null space of the 5x9 epipolar constraint matrix (batched SVD) →
   ``E = x E1 + y E2 + z E3 + E4``;
2. the 10 cubic constraints (det(E)=0 and 2 E Eᵀ E − tr(E Eᵀ) E = 0) expanded over
   the 20-monomial basis of degree ≤3 in (x, y, z) via constant sparse
   multiplication tensors (einsum — compiles to matmuls);
3. Gauss-Jordan reduction (batched 10x10 solve) and Nistér's row elimination →
   a degree-10 polynomial in z;
4. roots via fixed-iteration Durand-Kerner in complex64 (TPU has no nonsymmetric
   eigensolver — same trick as the P3P quartic, :func:`lcvo_tpu.ops.pnp.quartic_roots`);
5. back-substitution of (x, y) from the 3x3 polynomial system at each real root.

Spurious/non-converged roots are masked, not branched on — RANSAC scoring ignores
them via the validity mask.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Monomial bases and multiplication tensors (built once at import, constants)
# ---------------------------------------------------------------------------

# degree-≤1 monomials in (x, y, z): exponent triples, order (x, y, z, 1)
_D1 = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0)]
# degree-≤2 monomials
_D2 = [
    (2, 0, 0), (0, 2, 0), (0, 0, 2), (1, 1, 0), (1, 0, 1),
    (0, 1, 1), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]
# degree-≤3 monomials, Nistér's column order: the first 10 get eliminated by
# Gauss-Jordan; the last 10 factor as {x, y, 1} x polynomials in z.
_D3 = [
    (3, 0, 0), (0, 3, 0), (2, 1, 0), (1, 2, 0), (2, 0, 1),
    (2, 0, 0), (0, 2, 1), (0, 2, 0), (1, 1, 1), (1, 1, 0),
    (1, 0, 2), (1, 0, 1), (1, 0, 0), (0, 1, 2), (0, 1, 1),
    (0, 1, 0), (0, 0, 3), (0, 0, 2), (0, 0, 1), (0, 0, 0),
]


def _mult_tensor(a_basis, b_basis, out_basis):
    out_index = {e: i for i, e in enumerate(out_basis)}
    T = np.zeros((len(a_basis), len(b_basis), len(out_basis)), np.float32)
    for i, ea in enumerate(a_basis):
        for j, eb in enumerate(b_basis):
            T[i, j, out_index[tuple(np.add(ea, eb))]] = 1.0
    return T


_M11 = jnp.asarray(_mult_tensor(_D1, _D1, _D2))   # deg1 * deg1 -> deg2
_M21 = jnp.asarray(_mult_tensor(_D2, _D1, _D3))   # deg2 * deg1 -> deg3


def _conv_tensor(la, lb):
    T = np.zeros((la, lb, la + lb - 1), np.float32)
    for i in range(la):
        for j in range(lb):
            T[i, j, i + j] = 1.0
    return jnp.asarray(T)


# 1-D polynomial products (coefficients highest-degree first) used by det(B)
_C44 = _conv_tensor(4, 4)
_C45 = _conv_tensor(4, 5)
_C54 = _conv_tensor(5, 4)
_C48 = _conv_tensor(4, 8)
_C57 = _conv_tensor(5, 7)


def _pmul(a, b, T):
    return jnp.einsum("...i,...j,ijk->...k", a, b, T)


def _polyval(c, z):
    """Horner evaluation of coefficient array c (..., L), highest-degree first."""
    res = jnp.zeros(jnp.broadcast_shapes(c[..., 0].shape, z.shape), z.dtype)
    for i in range(c.shape[-1]):
        res = res * z + c[..., i]
    return res


# ---------------------------------------------------------------------------
# Constraint-matrix construction
# ---------------------------------------------------------------------------


def _constraint_matrix(Ec: jnp.ndarray) -> jnp.ndarray:
    """Ec (..., 3, 3, 4): each entry of E as a degree-1 polynomial over (x,y,z,1).
    Returns the 10x20 cubic-constraint matrix over the Nistér monomial basis."""

    def m(i, j):
        return Ec[..., i, j, :]

    def p11(a, b):
        return _pmul(a, b, _M11)

    def p21(a, b):
        return _pmul(a, b, _M21)

    # det(E) = 0
    c0 = p11(m(1, 1), m(2, 2)) - p11(m(1, 2), m(2, 1))
    c1 = p11(m(1, 0), m(2, 2)) - p11(m(1, 2), m(2, 0))
    c2 = p11(m(1, 0), m(2, 1)) - p11(m(1, 1), m(2, 0))
    det = p21(c0, m(0, 0)) - p21(c1, m(0, 1)) + p21(c2, m(0, 2))

    # 2 E Eᵀ E − tr(E Eᵀ) E = 0 (nine equations)
    EEt = [[sum(p11(m(i, k), m(j, k)) for k in range(3)) for j in range(3)] for i in range(3)]
    tr = EEt[0][0] + EEt[1][1] + EEt[2][2]
    rows = [det]
    for i in range(3):
        for j in range(3):
            acc = sum(p21(EEt[i][k], m(k, j)) for k in range(3))
            rows.append(2.0 * acc - p21(tr, m(i, j)))
    return jnp.stack(rows, axis=-2)  # (..., 10, 20)


# ---------------------------------------------------------------------------
# Degree-10 root solve (Durand-Kerner, fixed iterations)
# ---------------------------------------------------------------------------

_DK_ITERS = 100


def poly_roots_deg10(coeffs: jnp.ndarray) -> jnp.ndarray:
    """All 10 complex roots of a degree-10 polynomial, batched. coeffs (..., 11)
    real, highest-degree first. Fixed-iteration Durand-Kerner in complex64.

    f32-safe: the variable is rescaled by a Fujiwara-type root bound so every root
    of the scaled polynomial lies in ~the unit disk — Horner then never overflows
    (a naive Cauchy-bound seeding puts |z|~1e4 for near-degenerate leading
    coefficients and z^10 overflows f32, stalling the iteration)."""
    c = coeffs.astype(jnp.complex64)
    c = c / jnp.maximum(jnp.max(jnp.abs(c), axis=-1, keepdims=True), 1e-30)
    lead = c[..., :1]
    lead = jnp.where(jnp.abs(lead) > 1e-10, lead, 1e-10 + 0j)
    p = c / lead  # monic, (..., 11)

    # Fujiwara bound: 2 * max_k |p_k|^(1/k) bounds every root magnitude
    k = jnp.arange(1, 11, dtype=jnp.float32)
    mag = jnp.abs(p[..., 1:]) ** (1.0 / k)
    s = 2.0 * jnp.max(mag, axis=-1, keepdims=True)
    s = jnp.maximum(s, 1e-6).astype(jnp.complex64)
    # substitute z = s*u: q_k = p_k / s^k is monic with all roots |u| <= 1
    q = p / s ** jnp.arange(0, 11, dtype=jnp.float32)

    seed = jnp.asarray([1.3 * (0.4 + 0.9j) ** k for k in range(1, 11)], jnp.complex64)
    u = jnp.broadcast_to(seed, q.shape[:-1] + (10,))
    eye = jnp.eye(10, dtype=jnp.complex64)

    def body(_, u):
        pu = _polyval(q[..., None, :], u)
        diff = u[..., :, None] - u[..., None, :] + eye
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) > 1e-18, denom, 1e-18 + 0j)
        delta = pu / denom
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0 + 0j)
        return u - delta

    u = jax.lax.fori_loop(0, _DK_ITERS, body, u)
    return u * s


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------


def five_point(x1: jnp.ndarray, x2: jnp.ndarray):
    """Nistér 5-point solutions, batched over leading dims.

    x1, x2: (..., 5, 2) *normalized* coordinates with x2ᵀ E x1 = 0.
    Returns (E (..., 10, 3, 3), valid (..., 10)): up to 10 unit-Frobenius essential
    matrices per sample; invalid slots (complex roots, degenerate samples) masked.
    """
    dtype = x1.dtype
    ones = jnp.ones(x1.shape[:-1] + (1,), dtype)
    h1 = jnp.concatenate([x1, ones], axis=-1)
    h2 = jnp.concatenate([x2, ones], axis=-1)
    A = (h2[..., :, None] * h1[..., None, :]).reshape(*h1.shape[:-2], 5, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)          # Vt (..., 9, 9)
    basis = Vt[..., 5:9, :].reshape(*Vt.shape[:-2], 4, 3, 3)  # E1..E4
    Ec = jnp.moveaxis(basis, -3, -1)                          # (..., 3, 3, 4)

    C = _constraint_matrix(Ec)                                # (..., 10, 20)
    # Gauss-Jordan: reduce to [I | G]; degenerate samples produce NaN → masked below
    G = jnp.linalg.solve(C[..., :, :10], C[..., :, 10:])      # (..., 10, 10)
    bad = ~jnp.all(jnp.isfinite(G), axis=(-2, -1))
    G = jnp.nan_to_num(G)

    # Nistér elimination: rows 4..9 carry monomials x²z, x², y²z, y², xyz, xy.
    # (row_a − z·row_b) cancels the leading monomial, leaving a polynomial row over
    # the last-10 columns, which factor as x·(z²,z,1), y·(z²,z,1), (z³,z²,z,1).
    def combo(a, b):
        Ga, Gb = G[..., a, :], G[..., b, :]
        bx = jnp.stack([-Gb[..., 0], Ga[..., 0] - Gb[..., 1], Ga[..., 1] - Gb[..., 2], Ga[..., 2]], axis=-1)
        by = jnp.stack([-Gb[..., 3], Ga[..., 3] - Gb[..., 4], Ga[..., 4] - Gb[..., 5], Ga[..., 5]], axis=-1)
        b1 = jnp.stack(
            [-Gb[..., 6], Ga[..., 6] - Gb[..., 7], Ga[..., 7] - Gb[..., 8], Ga[..., 8] - Gb[..., 9], Ga[..., 9]],
            axis=-1,
        )
        return bx, by, b1

    bxk, byk, b1k = combo(4, 5)
    bxl, byl, b1l = combo(6, 7)
    bxm, bym, b1m = combo(8, 9)

    # det of the 3x3 polynomial system B(z)·(x, y, 1)ᵀ = 0 → degree-10 in z
    p1 = _pmul(byl, b1m, _C45) - _pmul(b1l, bym, _C54)
    p2 = _pmul(bxl, b1m, _C45) - _pmul(b1l, bxm, _C54)
    p3 = _pmul(bxl, bym, _C44) - _pmul(byl, bxm, _C44)
    det10 = _pmul(bxk, p1, _C48) - _pmul(byk, p2, _C48) + _pmul(b1k, p3, _C57)  # (..., 11)

    roots = poly_roots_deg10(det10)                           # (..., 10) complex
    zr = roots.real.astype(dtype)
    realish = jnp.abs(roots.imag) < 1e-2 * (1.0 + jnp.abs(roots.real))

    # back-substitute (x, y): evaluate B(z) and take the best cross-product null vector
    BX = jnp.stack([bxk, bxl, bxm], axis=-2)                  # (..., 3, 4)
    BY = jnp.stack([byk, byl, bym], axis=-2)
    B1 = jnp.stack([b1k, b1l, b1m], axis=-2)                  # (..., 3, 5)
    zb = zr[..., :, None]                                     # (..., 10, 1)
    Bxv = _polyval(BX[..., None, :, :], zb)                   # (..., 10, 3)
    Byv = _polyval(BY[..., None, :, :], zb)
    B1v = _polyval(B1[..., None, :, :], zb)
    M = jnp.stack([Bxv, Byv, B1v], axis=-1)                   # (..., 10, 3rows, 3cols)
    v01 = jnp.cross(M[..., 0, :], M[..., 1, :])
    v02 = jnp.cross(M[..., 0, :], M[..., 2, :])
    v12 = jnp.cross(M[..., 1, :], M[..., 2, :])
    vs = jnp.stack([v01, v02, v12], axis=-2)                  # (..., 10, 3, 3)
    nrm = jnp.linalg.norm(vs, axis=-1)
    pick = jnp.argmax(nrm, axis=-1)
    v = jnp.take_along_axis(vs, pick[..., None, None], axis=-2)[..., 0, :]
    w = v[..., 2]
    safe_w = jnp.where(jnp.abs(w) > 1e-9, w, 1e-9)
    xs = v[..., 0] / safe_w
    ys = v[..., 1] / safe_w

    coeff = jnp.stack([xs, ys, zr, jnp.ones_like(zr)], axis=-1)          # (..., 10, 4)
    E = jnp.einsum("...rc,...cij->...rij", coeff, basis)                 # (..., 10, 3, 3)
    fro = jnp.linalg.norm(E, axis=(-2, -1), keepdims=True)
    E = E / jnp.maximum(fro, 1e-12)

    valid = realish & (jnp.abs(w) > 1e-9) & jnp.isfinite(E).all(axis=(-2, -1)) & ~bad[..., None]
    return E, valid
