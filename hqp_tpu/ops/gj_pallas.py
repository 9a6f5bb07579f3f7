"""Batched interior-block factorization as a Pallas TPU kernel.

The partitioned KKT backend needs, per horizon partition p:
    Minv_p  = MII_p^-1                       (s x s interior saddle)
    W_p     = Minv_p MIB_p                   (boundary couplings)
    Schur_p = MIB_p' W_p                     (2nx x 2nx boundary Schur)

XLA's route (LU factor + triangular solves) lowers to sequential
column loops with dispatch overhead per column; this kernel runs a
Gauss-Jordan inversion WITH PARTIAL PIVOTING (the robustness role of the
reference's Bunch-Kaufman pivot search, hqp/spBKP.C:369) entirely in
VMEM, in ONE launch, with the partition axis vectorized through every
step -- each of the s elimination steps is a handful of [P, s, s]
vector ops, so the fixed per-op cost amortizes over all partitions at
once.  The W and Schur products ride in the same launch.

f32, like every TPU factorization here; the caller's f64 iterative
refinement restores accuracy (hqp/Hqp_IpMatrix.C's own layering).
Row swaps are scatter-free rank-1 updates with one-hot vectors; the
pivot row index per partition is a max + first-index reduction.

On non-TPU backends the kernel runs in interpreter mode, so the CPU
test mesh exercises the identical code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: VMEM budget for one grid program (bytes); TPU scoped vmem is ~16M and
#: mosaic double-buffers blocks, so stay well under
VMEM_BUDGET = 6 * 2 ** 20


def _padded_bytes(s, cols):
    """f32 bytes of one [s, cols] tile after (8, 128) tiling."""
    return (-(-s // 8) * 8) * (-(-cols // 128) * 128) * 4


def _chunk(P, s, b):
    """Partitions per grid program under the VMEM budget (~6 live
    [Pc, s, s]-sized buffers: A, M, loop temporaries, W)."""
    per_part = 6 * _padded_bytes(s, s) + 2 * _padded_bytes(s, b)
    return max(1, min(P, VMEM_BUDGET // per_part))


def fits_vmem(P, s, b):
    """Usable at all (a single partition must fit)."""
    return _chunk(P, s, b) >= 1 and s <= 512


def _kernel(s, b, MII_ref, MIB_ref, Minv_ref, W_ref, Schur_ref):
    A0 = MII_ref[:]                      # [P, s, s]
    B = MIB_ref[:]                       # [P, s, b]
    eye = jnp.eye(s, dtype=A0.dtype)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1).astype(
        jnp.float32)                     # [1, s]
    M0 = jnp.broadcast_to(eye, A0.shape)

    # all indexing is mask-based (one-hot reductions), so the whole GJ
    # step works with a TRACED k -- a fori_loop body mosaic compiles
    # once, instead of s unrolled copies (which explode compile time)
    def step(k, carry):
        A, M = carry
        kf = k.astype(jnp.float32)
        ekd = jnp.where(idx == kf, 1.0, 0.0)             # [1, s]
        # pivot search in column k, rows >= k (first max by index)
        colk = jnp.abs(jnp.sum(A * ekd[:, None, :], axis=2))  # [P, s]
        below = jnp.where(idx >= kf, colk, -1.0)
        maxv = jnp.max(below, axis=1, keepdims=True)     # [P, 1]
        cand = jnp.where(below >= maxv, idx, float(s))
        psel = jnp.min(cand, axis=1, keepdims=True)      # [P, 1]
        ep = jnp.where(idx == psel, 1.0, 0.0)            # [P, s]
        # swap rows k <-> p (rank-1, scatter-free)
        prow = jnp.sum(ep[:, :, None] * A, axis=1)       # [P, s]
        mprow = jnp.sum(ep[:, :, None] * M, axis=1)
        rowk = jnp.sum(ekd[:, :, None] * A, axis=1)
        mrowk = jnp.sum(ekd[:, :, None] * M, axis=1)
        sw = ekd[:, :, None] - ep[:, :, None]            # [P, s, 1]
        A = A + sw * (prow - rowk)[:, None, :]
        M = M + sw * (mprow - mrowk)[:, None, :]
        # eliminate column k (row k is now prow/mprow)
        piv = jnp.sum(prow * ekd, axis=1)                # [P]
        inv_piv = 1.0 / piv
        ak = prow * inv_piv[:, None]                     # [P, s]
        mk_ = mprow * inv_piv[:, None]
        rcol = ekd[:, :, None]
        A = rcol * ak[:, None, :] + (1.0 - rcol) * A
        M = rcol * mk_[:, None, :] + (1.0 - rcol) * M
        colk2 = jnp.sum(A * ekd[:, None, :], axis=2)     # [P, s]
        col = (1.0 - ekd) * colk2
        A = A - col[:, :, None] * ak[:, None, :]
        M = M - col[:, :, None] * mk_[:, None, :]
        return A, M

    _, M = jax.lax.fori_loop(0, s, step, (A0, M0))

    W = jax.lax.dot_general(
        M, B, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [P, s, b]
    Schur = jax.lax.dot_general(
        B, W, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [P, b, b]
    Minv_ref[:] = M
    W_ref[:] = W
    Schur_ref[:] = Schur


@functools.partial(jax.jit, static_argnames=("interpret",))
def interior_factor(MII, MIB, interpret=None):
    """Fused batched (inverse, W, Schur) in one Pallas launch.

    MII: [P, s, s]; MIB: [P, s, b].  Returns (Minv [P,s,s] f32,
    W [P,s,b] f32, Schur [P,b,b] f32).
    """
    P, s, _ = MII.shape
    b = MIB.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dt = jnp.float32
    # chunk the partition axis so each grid program stays in VMEM while
    # still vectorizing the GJ steps across its chunk
    Pc = _chunk(P, s, b)
    G = -(-P // Pc)
    Ppad = G * Pc
    M32 = MII.astype(dt)
    B32 = MIB.astype(dt)
    if Ppad != P:
        pad = jnp.broadcast_to(jnp.eye(s, dtype=dt), (Ppad - P, s, s))
        M32 = jnp.concatenate([M32, pad], 0)
        B32 = jnp.concatenate([B32, jnp.zeros((Ppad - P, s, b), dt)], 0)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(_kernel, s, b),
            grid=(G,),
            out_shape=(jax.ShapeDtypeStruct((Ppad, s, s), dt),
                       jax.ShapeDtypeStruct((Ppad, s, b), dt),
                       jax.ShapeDtypeStruct((Ppad, b, b), dt)),
            in_specs=[
                pl.BlockSpec((Pc, s, s), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, s, b), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((Pc, s, s), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, s, b), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Pc, b, b), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(M32, B32)
    return tuple(o[:P] for o in out)
