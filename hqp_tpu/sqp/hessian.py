"""Hessian approximations for the SQP Lagrangian ("hela").

Re-implements the reference's exchangeable Hqp_HL hierarchy
(hqp/Hqp_HL.{h,C}, Hqp_HL_BFGS.C, Hqp_HL_Gerschgorin.C, Hqp_HL_DScale.C):

* scaled-identity / perturbed-gradient initialization with the four
  ``sqp_hela_scale`` modes (Hqp_HL.C:84-171),
* Gerschgorin diagonal-dominance repair ``posdef`` (Hqp_HL.C:256-311),
* block-diagonal damped BFGS with Powell's modification, step-length
  adaptive damping and eigenvalue control (Hqp_HL_BFGS.C:150-251).

TPU-native design: the Hessian is never a general sparse matrix.  Programs
expose their Hessian as a batch of dense diagonal blocks ``[B, nb, nb]``
(for a DOCP, B = K+1 stages and nb = nx+nu -- exactly the block partition
the reference's ``next_block`` auto-detection recovers from sparsity,
Hqp_HL_BFGS.C:257-292).  All block updates run batched under ``vmap``:
the reference's sequential per-block loop becomes one MXU-friendly batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hqp_tpu.utils.registry import modules


def gerschgorin_posdef(Qb: jnp.ndarray, eps: float) -> jnp.ndarray:
    """diag_i = max(diag_i, sum_j|offdiag_ij| + eps); Hqp_HL.C:256-311."""
    d = jnp.diagonal(Qb, axis1=-2, axis2=-1)
    absQ = jnp.abs(Qb)
    rowsum = jnp.sum(absQ, axis=-1) - jnp.abs(d)
    newd = jnp.maximum(d, rowsum + eps)
    return Qb + jnp.einsum("...i,ij->...ij", newd - d,
                           jnp.eye(Qb.shape[-1], dtype=Qb.dtype))


class HL:
    """Base Hessian strategy (Hqp_HL).  Subclasses implement update()."""

    def __init__(self, scale: int = 1, eps: float = 1e-8,
                 init_multipliers: bool = False):
        self.scale = scale
        self.eps = eps
        self.init_multipliers = init_multipliers

    # -- initialization (Hqp_HL::init, Hqp_HL.C:84-171) ----------------------

    def init(self, prg, x, y, z, Qb):
        """Return an initial block Hessian.

        If the program supplied a nonzero Q, only repair definiteness;
        otherwise build a (scaled) identity.  scale == 0: identity;
        scale == 1: per-component dgL_i/dx_i; scale == 2: 0.5*||dgL||/||dx||;
        scale >= 3: |dgL'dx| / dx'dx.  dgL is the Lagrangian-gradient change
        under the perturbation dx_i = |1e-4 x_i| + 1e-6 (Hqp_HL.C:79-81).
        """
        nonzero = jnp.max(jnp.abs(Qb)) > self.eps
        eye = jnp.broadcast_to(jnp.eye(Qb.shape[-1]), Qb.shape)

        if self.scale <= 0:
            Qinit = eye
        else:
            gL = prg.eval_grd_L(x, y, z)
            dx = jnp.abs(1e-4 * x) + 1e-6
            gLd = prg.eval_grd_L(x + dx, y, z)
            dgL = gLd - gL
            if self.scale == 1:
                val = jnp.maximum(dgL / dx, self.eps)
            elif self.scale == 2:
                nrm = jnp.sqrt(jnp.sum(dgL * dgL) / jnp.sum(dx * dx))
                val = jnp.maximum(0.5 * nrm, self.eps) * jnp.ones_like(x)
            else:
                r = jnp.abs(jnp.sum(dgL * dx) / jnp.sum(dx * dx))
                val = jnp.maximum(r, self.eps) * jnp.ones_like(x)
            vb = prg.split_blocks(val)
            Qinit = jnp.einsum("bi,ij->bij", vb, jnp.eye(Qb.shape[-1]))

        return jnp.where(nonzero, gerschgorin_posdef(Qb, self.eps), Qinit)

    def update(self, Qb, s_b, u_b, alpha):
        raise NotImplementedError

    def posdef(self, Qb):
        return gerschgorin_posdef(Qb, self.eps)


@modules.register("sqp_hela", "BFGS")
class BFGS(HL):
    """Block-diagonal damped BFGS (Hqp_HL_BFGS.C)."""

    def __init__(self, gamma: float = 0.1, eigen_control: bool = True,
                 **kw):
        super().__init__(**kw)
        self.gamma = gamma
        self.eigen_control = eigen_control

    def update(self, Qb, s_b, u_b, alpha):
        """Damped BFGS per block; Hqp_HL_BFGS.C:150-222 (update_b_Q).

        Qb: [B, nb, nb]; s_b, u_b: [B, nb]; alpha: step length taken.
        """
        gamma = self.gamma
        eps = self.eps
        eig = self.eigen_control

        def one(Q, s, u):
            sv = s @ u
            Qs = Q @ s
            sQs = s @ Qs

            if gamma >= 0.0:
                g = gamma
            else:
                g = -gamma
                g = g + (1.0 - g) * (1.0 - alpha)

            # Powell's modification (damping)
            theta = (1.0 - g) * sQs / jnp.where(sQs - sv != 0.0,
                                                sQs - sv, 1.0)
            damped = sv < g * sQs
            v = jnp.where(damped, theta * u + (1.0 - theta) * Qs, u)
            sv2 = jnp.where(damped, s @ v, sv)

            ok = (sv2 != 0.0) & (sQs != 0.0)
            denom_sQs = jnp.where(sQs != 0.0, sQs, 1.0)
            denom_sv = jnp.where(sv2 != 0.0, sv2, 1.0)
            Qn = Q - jnp.outer(Qs, Qs) / denom_sQs \
                + jnp.outer(v, v) / denom_sv
            Qn = jnp.where(ok, Qn, Q)

            if eig:
                # eigenvalue control (Hqp_HL_BFGS.C:203-221)
                th = jnp.where((sQs < eps * eps) & (sQs >= 0.0),
                               sQs, eps * eps)
                evs = jnp.linalg.eigvalsh(0.5 * (Qn + Qn.T))
                mn = jnp.min(evs) - th
                Qn = jnp.where(mn < 0.0,
                               Qn + (-mn) * jnp.eye(Q.shape[0]), Qn)
            return 0.5 * (Qn + Qn.T)

        return jax.vmap(one)(Qb, s_b, u_b)


@modules.register("sqp_hela", "DScale")
class DScale(HL):
    """Diagonal-only scaling update (Hqp_HL_DScale.C): keeps a diagonal
    Hessian whose entries track u_i/s_i with safeguards."""

    def update(self, Qb, s_b, u_b, alpha):
        d = jnp.diagonal(Qb, axis1=-2, axis2=-1)
        ok = (jnp.abs(s_b) > 1e-16) & (u_b * s_b > 0.0)
        newd = jnp.where(ok, u_b / jnp.where(ok, s_b, 1.0), d)
        newd = jnp.clip(newd, self.eps, 1.0 / self.eps)
        return jnp.einsum("bi,ij->bij", newd, jnp.eye(Qb.shape[-1]))


@modules.register("sqp_hela", "Gerschgorin")
class Gerschgorin(HL):
    """Exact user Hessian + per-iteration Gerschgorin regularization
    (Hqp_HL_Gerschgorin.C).  The program must provide exact Lagrangian
    Hessian blocks via ``prg.eval_hess_blocks``; update() re-evaluates."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self._prg = None
        self._xyz = None

    def bind(self, prg, x, y, z):
        self._prg = prg
        self._xyz = (x, y, z)

    def update(self, Qb, s_b, u_b, alpha):
        if self._prg is None or not hasattr(self._prg, "eval_hess_blocks"):
            return gerschgorin_posdef(Qb, self.eps)
        x, y, z = self._xyz
        Hb = self._prg.eval_hess_blocks(x, y, z)
        return gerschgorin_posdef(Hb, self.eps)


@modules.register("sqp_hela", "SparseBFGS")
class SparseBFGS(BFGS):
    """Partitioned BFGS over sparsity-discovered diagonal blocks
    (Hqp_HL_SparseBFGS.C): RCM-permute the Hessian sparsity pattern
    (setup, Hqp_HL_SparseBFGS.C:70-113, sp_symrcm), split the permuted
    pattern into its connected contiguous diagonal blocks (next_block,
    Hqp_HL_SparseBFGS.C:255-276), and run the Powell-damped BFGS update
    independently on each dense sub-block (update, :216-247), leaving
    everything outside the blocks exactly zero.

    For stage-structured programs the Hessian arrives pre-partitioned as
    ``[B, nb, nb]`` stage blocks -- the partition the reference's scan
    would discover -- so the update delegates to the batched BFGS.  For
    general NLPs (one dense block, docp/nlp.py) the partition is
    discovered once from the numeric pattern of the initial Hessian,
    playing the role of the reference's sparse-Q structure bookkeeping;
    partially-separable problems then get per-component curvature updates
    instead of one rank-2 correction smeared across the whole matrix."""

    def __init__(self, pattern_eps: float = 0.0, **kw):
        super().__init__(**kw)
        #: entries with |Q_ij| <= pattern_eps count as structural zeros
        self.pattern_eps = pattern_eps
        self._perm = None
        self._inv = None
        self._blocks = None

    def bind(self, prg, x, y, z):
        """Discover the partition from the program's exact Lagrangian
        Hessian pattern when available (the reference reads the pattern
        from the program-allocated sparse Q, Hqp_HL_SparseBFGS.C:75-78;
        our dense-QP programs start Q as a scaled identity, so the
        structural pattern must come from the model itself)."""
        if self._perm is None and hasattr(prg, "eval_hess_blocks"):
            Hb = prg.eval_hess_blocks(x, y, z)
            if Hb.shape[0] == 1:
                self._discover(Hb[0])

    def _discover(self, Q):
        """RCM + contiguous-block scan of the symmetric pattern."""
        import numpy as np
        import scipy.sparse as sp
        from hqp_tpu.native import rcm_order

        n = Q.shape[0]
        A = np.abs(np.asarray(Q)) > self.pattern_eps
        A = A | A.T
        np.fill_diagonal(A, True)
        pat = sp.csr_matrix(A.astype(np.float64))
        pat.sort_indices()
        perm = np.asarray(rcm_order(n, pat.indptr, pat.indices))
        P = pat[perm][:, perm].tocsr()
        P.sort_indices()
        blocks = []
        b = 0
        while b < n:
            offs = b
            end = b
            while b <= end:
                row = P.indices[P.indptr[b]:P.indptr[b + 1]]
                if len(row):
                    end = max(end, int(row.max()))
                b += 1
            blocks.append((offs, end - offs + 1))
        inv = np.empty_like(perm)
        inv[perm] = np.arange(n)
        self._perm, self._inv, self._blocks = perm, inv, blocks

    def update(self, Qb, s_b, u_b, alpha):
        if Qb.shape[0] != 1:
            # stage-partitioned layout: the partition is already given
            return super().update(Qb, s_b, u_b, alpha)
        Q = Qb[0]
        if self._perm is None or len(self._perm) != Q.shape[0]:
            self._discover(Q)
        perm, inv = self._perm, self._inv
        Qp = jnp.asarray(Q)[perm][:, perm]
        sp_ = s_b[0][perm]
        up_ = u_b[0][perm]
        out = Qp
        for offs, size in self._blocks:
            sl = slice(offs, offs + size)
            blk = super().update(out[sl, sl][None], sp_[sl][None],
                                 up_[sl][None], alpha)[0]
            out = out.at[sl, sl].set(blk)
        return out[inv][:, inv][None]


@modules.register("sqp_hela", "AugBFGS")
class AugBFGS(BFGS):
    """BFGS with per-block inertia correction (Hqp_HL_AugBFGS.C role):
    after the damped update, each block is shifted so its smallest
    eigenvalue is at least ``inertia_eps`` times its largest -- keeping
    every block uniformly positive definite even when curvature
    information is one-sided (augmented/partitioned problems)."""

    def __init__(self, inertia_eps: float = 1e-6, **kw):
        kw.setdefault("eigen_control", False)
        super().__init__(**kw)
        self.inertia_eps = inertia_eps

    def update(self, Qb, s_b, u_b, alpha):
        Qn = super().update(Qb, s_b, u_b, alpha)
        evs = jnp.linalg.eigvalsh(0.5 * (Qn + jnp.swapaxes(Qn, -1, -2)))
        lo = evs[..., 0]
        hi = jnp.maximum(evs[..., -1], self.eps)
        shift = jnp.maximum(self.inertia_eps * hi - lo, 0.0)
        return Qn + shift[..., None, None] * jnp.eye(Qn.shape[-1])


@modules.register("sqp_hela", "Gangster")
class Gangster(BFGS):
    """BFGS update projected onto a fixed sparsity pattern (the
    reference's 'gangster operator', Hqp_HL_Gangster.C): entries outside
    the pattern of the initial Hessian blocks are forced to zero after
    every update, preserving problem structure in the quasi-Newton
    approximation."""

    def __init__(self, **kw):
        kw.setdefault("eigen_control", False)
        super().__init__(**kw)
        self._pattern = None

    def init(self, prg, x, y, z, Qb):
        Q0 = super().init(prg, x, y, z, Qb)
        eye = jnp.eye(Q0.shape[-1], dtype=bool)
        self._pattern = (jnp.abs(Q0) > 0.0) | eye
        return Q0

    def update(self, Qb, s_b, u_b, alpha):
        Qn = super().update(Qb, s_b, u_b, alpha)
        if self._pattern is not None:
            Qn = jnp.where(self._pattern, Qn, 0.0)
            Qn = gerschgorin_posdef(Qn, self.eps)
        return Qn
