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

#: modified-Cholesky pivot floor (relative to the block's diagonal) for
#: the master factorizations: masters mixing 1e10 equality penalties with
#: tiny true curvature (cond ~ 1e16) have elimination pivots that go
#: negative by roundoff alone; clamping factors a nearby SPD system and
#: the caller's iterative refinement absorbs the difference (the
#: reference's spMODCHOLfac layering, hqp/Hqp_IpSpSC.C:46-48)
MOD_CHOL_FLOOR = 1e-14


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
        Lk = sl.chol(Stil, floor_rel=MOD_CHOL_FLOOR)
        Wk = sl.tri_lower_solve(Lk, Uk)
        return Wk, (Lk, Wk)

    U_pad = jnp.concatenate([U, jnp.zeros((1, n, n), S.dtype)], axis=0)
    # init carry derived from S so its varying-manual-axes (vma) type under
    # shard_map matches the scan output (a fresh jnp.zeros is 'unvarying')
    _, (L, W) = jax.lax.scan(body, S[0] * 0.0, (S, U_pad))
    return L, W[:-1]


# ---------------------------------------------------------------------------
# Block cyclic reduction: log-depth factor/solve for the master system.
#
# The sequential block-Cholesky scan above costs O(N) kernel-latency steps
# on TPU (~60us per 2x2 block step measured on v5e); cyclic reduction
# eliminates all odd-indexed blocks at once per level (batched einsums +
# batched unrolled Cholesky), so an N-block system needs only ~log2(N)
# levels.  This is the parallel-scan answer SURVEY.md section 5
# ("long-context") prescribes for the stage axis; SPD is preserved because
# each level is block Gaussian elimination under a symmetric permutation.
# ---------------------------------------------------------------------------


def cr_factor(S, U):
    """Cyclic-reduction factorization of SPD tridiag(U', S, U).

    Returns an opaque pytree (nested tuples) consumed by cr_solve.
    Level structure, with the level padded to an odd block count
    N = 2M+1 (identity diagonal pad, zero coupling pad):
        A_m = U[2m]   couples even 2m   -> odd 2m+1      [M, n, n]
        B_m = U[2m+1] couples odd 2m+1  -> even 2m+2     [M, n, n]
        Lo  = chol(D_odd)                                 [M, n, n]
        R_m = A_m D_odd_m^-1,  S_m = D_odd_m^-1 B_m
    Reduced system: D' = D_even - [m>=1] B'S - [m<M] R A',
    U'_m = -R_m B_m.
    """
    levels = []
    D, Uc = S, U
    n = S.shape[-1]
    while D.shape[0] > 2:
        N = D.shape[0]
        if N % 2 == 0:  # pad to odd with an identity block, zero coupling
            D = jnp.concatenate([D, jnp.eye(n, dtype=D.dtype)[None]], 0)
            Uc = jnp.concatenate([Uc, jnp.zeros((1, n, n), D.dtype)], 0)
            N += 1
        M = N // 2
        Dodd = D[1::2]
        A = Uc[0::2]
        B = Uc[1::2]
        Lo = sl.chol(Dodd, floor_rel=MOD_CHOL_FLOOR)
        # R = A Dodd^-1  (= cho_solve(Lo, A')' by symmetry)
        R = jnp.swapaxes(sl.cho_solve(Lo, jnp.swapaxes(A, -1, -2)), -1, -2)
        Sm = sl.cho_solve(Lo, B)
        Dn = D[0::2]
        Dn = Dn.at[:M].add(-jnp.einsum("mij,mkj->mik", R, A))
        Dn = Dn.at[1:].add(-jnp.einsum("mji,mjk->mik", B, Sm))
        Un = -jnp.einsum("mij,mjk->mik", R, B)
        levels.append((Lo, R, Sm, A, B))
        D, Uc = Dn, Un
    # base: N in {1, 2} -- direct block Cholesky
    base = factor(D, Uc)
    return (tuple(levels), base)


def cr_solve(fac, rhs):
    """Solve with cr_factor output; rhs: [N, n]."""
    levels, base = fac
    n = rhs.shape[-1]
    stack = []
    b = rhs
    for (Lo, R, Sm, A, B) in levels:
        N = b.shape[0]
        if N % 2 == 0:
            b = jnp.concatenate([b, jnp.zeros((1, n), b.dtype)], 0)
        M = b.shape[0] // 2
        bodd = b[1::2]
        todd = sl.cho_solve(Lo, bodd)
        bn = b[0::2]
        bn = bn.at[:M].add(-jnp.einsum("mij,mj->mi", A, todd))
        bn = bn.at[1:].add(-jnp.einsum("mji,mj->mi", B, todd))
        stack.append((todd, N))
        b = bn
    x = solve(base[0], base[1], b)
    for (Lo, R, Sm, A, B), (todd, N) in zip(reversed(levels),
                                            reversed(stack)):
        xe = x
        xodd = (todd
                - jnp.einsum("mji,mj->mi", R, xe[:-1])
                - jnp.einsum("mij,mj->mi", Sm, xe[1:]))
        M = xodd.shape[0]
        out = jnp.zeros((2 * M + 1, n), x.dtype)
        out = out.at[0::2].set(xe)
        out = out.at[1::2].set(xodd)
        x = out[:N]
    return x


def cr_solve_scaled(fac, d, rhs):
    """Equilibrated wrapper (same contract as solve_scaled)."""
    return d * cr_solve(fac, d * rhs)


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
