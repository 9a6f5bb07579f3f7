"""Symmetric positive definite block-tridiagonal factor/solve.

Block-Cholesky of  T = tridiag(U', S, U)  with SPD diagonal blocks:
    Ltilde_0 = chol(S_0);  W_k = Ltilde_k^-1 U_k;
    Ltilde_{k+1} = chol(S_{k+1} - W_k' W_k)
All inner factorizations/solves are the unrolled small-matrix kernels
(:mod:`hqp_tpu.ops.smalllin`), so the scan bodies are pure fused
arithmetic -- the TPU-native replacement for the banded BKP kernels
(hqp/bdBKP.C, meschach/bdfactor.c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hqp_tpu.ops import smalllin as sl


def equilibrate(S, U):
    """Jacobi scaling d = diag(S)^(-1/2) for a block-tridiagonal SPD
    system; returns (S', U', d) with S' = D S D etc.  The role of the
    reference's diagonal scaling of the KKT factorization
    (hqp/Hqp_IpRedSpBKP.C:299-313) -- robustifies the Cholesky when block
    scales differ by many orders (e.g. 1e-8 Hessian floors against the
    1e10 fixed-variable penalty)."""
    d = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(S, axis1=-2, axis2=-1),
                                1e-300, None))
    Ss = S * d[..., :, None] * d[..., None, :]
    Us = U * d[..., :-1, :, None] * d[..., 1:, None, :]
    return Ss, Us, d


def solve_scaled(L, W, d, rhs):
    """Solve the original system given factors of the equilibrated one."""
    return d * solve(L, W, d * rhs)


def factor(S, U):
    """S: [N, n, n] SPD diagonal blocks; U: [N-1, n, n] upper couplings
    (block (k, k+1)).  Returns (L, W): per-block Cholesky factors and
    eliminated couplings W_k = L_k^-1 U_k."""
    n = S.shape[-1]

    def body(carry, inp):
        Wprev = carry          # [n, n], zeros initially
        Sk, Uk = inp
        Stil = Sk - Wprev.T @ Wprev
        Lk = sl.chol(Stil)
        Wk = sl.tri_lower_solve(Lk, Uk)
        return Wk, (Lk, Wk)

    U_pad = jnp.concatenate([U, jnp.zeros((1, n, n), S.dtype)], axis=0)
    _, (L, W) = jax.lax.scan(body, jnp.zeros((n, n), S.dtype), (S, U_pad))
    return L, W[:-1]


def solve(L, W, rhs):
    """Solve T x = rhs given factor(S, U) -> (L, W); rhs: [N, n]."""
    n = L.shape[-1]

    def fwd(carry, inp):
        yprev = carry
        Lk, Wprev, rk = inp
        yk = sl.tri_lower_solve(Lk, rk - Wprev.T @ yprev)
        return yk, yk

    W_pad = jnp.concatenate([jnp.zeros((1, n, n), L.dtype), W], axis=0)
    _, y = jax.lax.scan(fwd, jnp.zeros((n,), L.dtype), (L, W_pad, rhs))

    def bwd(carry, inp):
        xnext = carry
        Lk, Wk, yk = inp
        xk = sl.tri_upper_solve(Lk, yk - Wk @ xnext)
        return xk, xk

    W_pad_b = jnp.concatenate([W, jnp.zeros((1, n, n), L.dtype)], axis=0)
    _, x_r = jax.lax.scan(bwd, jnp.zeros((n,), L.dtype),
                          (L[::-1], W_pad_b[::-1], y[::-1]))
    return x_r[::-1]
