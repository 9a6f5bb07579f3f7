"""Small-matrix linear algebra as unrolled, XLA-fusible jnp ops.

TPU reality check (measured on v5e): ``jnp.linalg.cholesky`` /
``cho_solve`` / ``lu_factor`` lower to custom loops and triangular-solve
HLOs that cost milliseconds *per call* inside a ``lax.scan`` body, and LU
decomposition is not even implemented for f64 on TPU.  The reference's
per-stage blocks are tiny (nx, nu of a few to a few dozen --
hqp/Hqp_IpLQDOCP.C factors Guu of size nu per stage), so the TPU-native
answer is factorizations unrolled over the *static* dimension: pure
mul/add/div/sqrt graphs that XLA fuses and that batch over huge leading
axes ([K] stages, [P] partitions, [B] scenarios).

All routines operate on the last two axes and broadcast over any leading
batch axes.  They are pivot-free (Cholesky for SPD blocks); the IP layers
iterative refinement on top (hqp/Hqp_IpMatrix.C) exactly as the reference
does for its pivot-tolerant sparse BKP.
"""

from __future__ import annotations

import jax.numpy as jnp

_UNROLL_LIMIT = 48


def chol(A, floor_rel=None):
    """Cholesky factor (lower) of SPD blocks, unrolled over the static n.

    ``floor_rel``: modified-Cholesky pivot safeguard (the reference's
    spMODCHOLfac role, hqp/meschext_hl.C, used by Hqp_IpSpSC.C:46-48):
    each pivot d^2 is clamped below at ``floor_rel * max|diag(A)|``, so
    blocks that are PSD up to roundoff (e.g. a 1e10 equality penalty
    against 1e-6 true curvature -- cond ~ 1e16, where elimination pivots
    go negative by rounding alone) factor to a NEARBY SPD system instead
    of producing NaN; the caller's iterative refinement against the true
    system absorbs the perturbation."""
    n = A.shape[-1]
    if n > _UNROLL_LIMIT:
        return jnp.linalg.cholesky(A)
    if floor_rel is not None:
        dmax = jnp.max(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)),
                       axis=-1)
        floor = floor_rel * jnp.maximum(dmax, 1e-300)
    cols = []
    for j in range(n):
        v = A[..., j:, j]
        for k in range(j):
            v = v - cols[k][..., j - k:] * cols[k][..., j - k, None]
        d2 = v[..., 0]
        if floor_rel is not None:
            d2 = jnp.maximum(d2, floor)
        d = jnp.sqrt(d2)
        cols.append(
            jnp.concatenate([d[..., None], v[..., 1:] / d[..., None]],
                            axis=-1))
    L = jnp.zeros_like(A)
    for j in range(n):
        L = L.at[..., j:, j].set(cols[j])
    return L


def tri_lower_solve(L, b):
    """Solve L x = b with L lower triangular; b is [..., n] or [..., n, m]."""
    n = L.shape[-1]
    if n == 0:
        return b
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    if n > _UNROLL_LIMIT:
        import jax.lax.linalg as lxl
        x = lxl.triangular_solve(L, b, left_side=True, lower=True)
        return x[..., 0] if vec else x
    xs = []
    for i in range(n):
        v = b[..., i, :]
        for k in range(i):
            v = v - L[..., i, k, None] * xs[k]
        xs.append(v / L[..., i, i, None])
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def tri_upper_solve(L, b):
    """Solve L' x = b with L lower triangular (i.e. upper system)."""
    n = L.shape[-1]
    if n == 0:
        return b
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    if n > _UNROLL_LIMIT:
        import jax.lax.linalg as lxl
        x = lxl.triangular_solve(L, b, left_side=True, lower=True,
                                 transpose_a=True)
        return x[..., 0] if vec else x
    xs = [None] * n
    for i in reversed(range(n)):
        v = b[..., i, :]
        for k in range(i + 1, n):
            v = v - L[..., k, i, None] * xs[k]
        xs[i] = v / L[..., i, i, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def cho_solve(L, b):
    """Solve A x = b given L = chol(A)."""
    return tri_upper_solve(L, tri_lower_solve(L, b))


def spd_solve(A, b):
    """Solve SPD A x = b by unrolled Cholesky."""
    return cho_solve(chol(A), b)


def lu_nopiv(A):
    """Unrolled LU WITHOUT pivoting (Doolittle), for small well-conditioned
    systems (integrator stage matrices I/(gamma h) - J, Newton matrices).
    Returns a single packed matrix (L below diagonal, U on/above)."""
    n = A.shape[-1]
    if n > _UNROLL_LIMIT:
        raise ValueError("lu_nopiv: n too large to unroll")
    M = A
    for k in range(n):
        piv = M[..., k, k]
        lcol = M[..., k + 1:, k] / piv[..., None]
        M = M.at[..., k + 1:, k].set(lcol)
        upd = lcol[..., :, None] * M[..., k, k + 1:][..., None, :]
        M = M.at[..., k + 1:, k + 1:].add(-upd)
    return M


def lu_nopiv_solve(M, b):
    """Solve with the packed factor from :func:`lu_nopiv`."""
    n = M.shape[-1]
    if n == 0:
        return b
    vec = b.ndim == M.ndim - 1
    if vec:
        b = b[..., None]
    # forward: L y = b (unit diagonal)
    ys = []
    for i in range(n):
        v = b[..., i, :]
        for k in range(i):
            v = v - M[..., i, k, None] * ys[k]
        ys.append(v)
    # backward: U x = y
    xs = [None] * n
    for i in reversed(range(n)):
        v = ys[i]
        for k in range(i + 1, n):
            v = v - M[..., i, k, None] * xs[k]
        xs[i] = v / M[..., i, i, None]
    x = jnp.stack(xs, axis=-2)
    return x[..., 0] if vec else x


def solve_nopiv(A, b):
    """Solve general small A x = b by unrolled pivot-free LU."""
    return lu_nopiv_solve(lu_nopiv(A), b)


def inv_nopiv(A):
    """Inverse of small matrices by unrolled pivot-free LU, as pure jnp
    ops -- usable where the backend has no f64 LU custom call (TPU: the
    LuDecomposition op is f32-only, but elementwise/matmul f64 emulation
    works, so an f64 interior factorization can run on device through
    this path; see PartitionedKKT factor_dtype)."""
    n = A.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return lu_nopiv_solve(lu_nopiv(A), eye)
