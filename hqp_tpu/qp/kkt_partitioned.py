"""Partitioned Schur-complement KKT backend ("SpSC").

The TPU-native successor of the reference's Schur-complement path
(hqp/Hqp_IpSpSC.C) combined with the stage-parallel decomposition
SURVEY.md section 2.7.3 calls for: the horizon is split into P partitions
of L stages; interior variables of every partition are eliminated **in
parallel** (batched pivoted LU over the partition axis), leaving a small
SPD block-tridiagonal master system in the P+1 partition-boundary states,
factored by an equilibrated block Cholesky (unrolled kernels).

The pivoted interior LU is the robustness backbone (the role of the
reference's Bunch-Kaufman pivoting, hqp/spBKP.C): stage Hessians mix
scales across many orders (quasi-Newton floors of 1e-8 against barrier
terms of 1e8), which defeats pivot-free range-space eliminations.  On
CPU the LU runs in f64; on TPU (which implements LuDecomposition only in
f32) it runs in f32 with f64 iterative refinement layered on top
(hqp/Hqp_IpMatrix.C's own strategy).

Structurally absent variables (x_mask False: padding and variables pinned
to statically-known fixed values) get identity rows; dynamically fixed
variables (lb == ub at runtime) are pinned by a large diagonal penalty
with multipliers recovered from stationarity, made exact by refinement.

Algebraically exact vs the dense full-KKT oracle: tests/test_kkt_partitioned.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


from hqp_tpu.ops import blocktri
from hqp_tpu.ops import gj_pallas
from hqp_tpu.ops import thomas_pallas
from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp.program import StageQP
from hqp_tpu.qp import kkt as K_

BIG = K_.FIX_BIG


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PartFactors:
    Minv: jnp.ndarray     # [P, s, s] inverse of the SCALED interior (f32)
    Dscale: jnp.ndarray   # [P, s] Ruiz scaling: MII^-1 ~= D Minv D
    MII: jnp.ndarray      # [P, s, s] f64 SCALED interior (inner refinement
                          # runs in the scaled space, see _interior_apply)
    W: jnp.ndarray        # [P, s, 2nx]  M_II^-1 M_IB (inner-refined)
    MIB: jnp.ndarray      # [P, s, 2nx]
    master: object        # cyclic-reduction factors of the boundary system
    dM: jnp.ndarray       # [P+1, nx] Jacobi scaling of the master
    LuuK: jnp.ndarray     # [nu, nu] terminal u-block Cholesky
    KgainK: jnp.ndarray   # [nu, nx]


def _interior_dim(L, nx, nu):
    nv = nx + nu
    return nu + (L - 1) * nv + L * nx


def _default_inner_rounds():
    """Inner-refinement rounds for interior applications.  The relative
    error of one scaled-f32-inverse application is q ~= cond * eps_f32;
    with dual_reg bounding cond at ~1/delta ~ 3e6, q ~= 0.2, and each
    inner round multiplies the error by q.  Five rounds put the interior
    solve at ~q^6 ~ 1e-4 relative, which the f64 outer refinement then
    contracts below 1e-10 -- measured necessary for late-barrier IP
    iterations (z/w spread 1e8+), where 2 rounds left a 1e-4 KKT residual
    that broke IP complementarity on TPU.  On f64 factor backends (CPU)
    the inverse is already exact; one safety round suffices."""
    return 5 if K_.lu_dtype() == jnp.float32 else 1


INNER_ROUNDS = None  # optional global override (tests/experiments)


def _inner_rounds():
    return INNER_ROUNDS if INNER_ROUNDS is not None \
        else _default_inner_rounds()


def _interior_apply(fac0, rho):
    """MII^-1 rho to f64 accuracy: scaled factor inverse + inner
    refinement carried ENTIRELY in the Ruiz-scaled space.
    rho: [P, s] or [P, s, m].

    The scaled space is essential, not cosmetic: the raw interior mixes
    barrier/penalty rows of 1e10 with dual-regularization rows of 1e-7
    (cond_raw ~ 1e16 at late barrier), so a raw-space residual
    rho - MII t carries O(eps64 * 1e10 * |t|) rounding -- O(1) absolute
    garbage that refinement then amplifies through MII^-1 (measured: KKT
    solve residual 6e5 at IP iteration 13 of the 60-stage DID).  After
    symmetric Ruiz equilibration the same system has cond ~ 1e4; the
    refinement loop below touches only scaled quantities (MII_s, unit-norm
    rows), and the diagonal back-scaling at entry/exit is exact.  This is
    the structured-backward-stability argument for IP KKT systems (M.
    Wright): errors land in components that the barrier makes irrelevant."""
    Minv, Dd, MII_s = fac0
    vec = rho.ndim == 2
    if vec:
        rho = rho[..., None]
    Ddc = Dd[:, :, None]
    rho_s = Ddc * rho                       # scaled rhs

    def apply_inv(r_s):
        return jnp.einsum("pij,pjm->pim", Minv,
                          r_s.astype(Minv.dtype)).astype(rho.dtype)

    t = apply_inv(rho_s)                    # scaled iterate
    for _ in range(_inner_rounds()):
        resid = rho_s - jnp.einsum("pij,pjm->pim", MII_s, t)
        t = t + apply_inv(resid)
    t = Ddc * t                             # back to raw space
    return t[..., 0] if vec else t


def _master_matvec(Sm, Um, x):
    """Equilibrated master block-tridiagonal matvec (f64)."""
    y = jnp.einsum("pij,pj->pi", Sm, x)
    y = y.at[:-1].add(jnp.einsum("pij,pj->pi", Um, x[1:]))
    y = y.at[1:].add(jnp.einsum("pji,pj->pi", Um, x[:-1]))
    return y


#: master backend: "cr" = f64 cyclic reduction (exact, default);
#: "thomas" = f32 single-launch Pallas Thomas + inner refinement
#: (faster per solve but measured rel. error ~1e-1 on cond-1e5 masters,
#: so it degrades the outer refinement -- keep for well-conditioned use)
MASTER_KERNEL = "cr"


def _master_solve(master, dM, rhs, nx):
    """Master solve: f64 CR (exact) or f32 Pallas Thomas + refinement."""
    if MASTER_KERNEL == "thomas" and nx <= thomas_pallas.MAX_BLOCK:
        Sm, Um = master
        r = dM * rhs
        x = thomas_pallas.thomas_solve(Sm, Um, r)
        for _ in range(_inner_rounds()):
            x = x + thomas_pallas.thomas_solve(
                Sm, Um, r - _master_matvec(Sm, Um, x))
        return dM * x
    return blocktri.cr_solve_scaled(master, dM, rhs)


class PartitionedKKT:
    """Stage-partitioned Schur-complement factorization of a StageQP KKT."""

    #: refinement loop style: the sharded subclass unrolls (see
    #: hqp_tpu.qp.kkt.refine on shard_map inside While)
    refine_unroll = False

    def __init__(self, L: int = 16, refine_eps: float = 1e-10,
                 refine_rounds: int = 8, dual_reg: float | None = None):
        self.L = L
        self.refine_eps = refine_eps
        self.refine_rounds = refine_rounds
        # Dual regularization +delta I on the interior multiplier block:
        # uncontrollable carry-through state chains (e.g. a free-final-time
        # parameter state, odc/Prg_Crane.C's x[0]) make the interior
        # dynamics rows linearly dependent -- their boundary couplings
        # telescope out of M_II.  The regularized Schur complement turns
        # the lost constraint into a 1/delta penalty between the partition
        # boundaries (exact in the limit); iterative refinement restores
        # full accuracy.
        #
        # delta also CONTROLS THE INTERIOR CONDITIONING (cond ~ 1/delta):
        # the f64 factor path (CPU) affords 1e-8, but the f32 path (TPU)
        # needs cond well under 1/eps_f32 for the factor to remain a
        # refinement preconditioner at all -- measured: delta=1e-8 gives
        # cond 1e8 and a divergent refinement, delta=1e-4 gives cond 1e4
        # and 5e-5 factor residual.  None = resolve by factor dtype.
        self.dual_reg = dual_reg

    # Value-based identity: jitted solver entry points take the backend as
    # a static argument (via the Mehrotra instance); hashing by config lets
    # a fresh-but-identical backend hit the in-memory trace cache instead
    # of re-tracing and re-loading executables (measured 1.4 s/executable
    # persistent-cache deserialization per new instance).  All fields are
    # set at construction and never mutated.
    def _config(self):
        return (type(self), self.L, self.refine_eps, self.refine_rounds,
                self.dual_reg)

    def __hash__(self):
        return hash(self._config())

    def __eq__(self, other):
        return isinstance(other, PartitionedKKT) and \
            self._config() == other._config()

    def _dual_reg(self):
        if self.dual_reg is not None:
            return self.dual_reg
        # f32 factor path: delta trades interior conditioning (cond ~
        # 1/delta, which the f32 inverse + inner refinement must beat:
        # q = cond * eps_f32 < 1) against the outer refinement's
        # contraction rate (~delta * ||M^-1||).  3e-7 keeps q ~ 0.2
        # (inner-convergent) while roughly halving the outer rounds
        # needed vs 1e-6 (measured on the 1000-stage DID KKT).
        return 3e-7 if K_.lu_dtype() == jnp.float32 else 1e-8

    def _choose_L(self, K, nx, nu):
        """A divisor of K close to the requested L, at least ceil(nx/nu)+1
        (below that the interior dynamics rows outnumber the interior
        columns and the interior saddle is structurally singular)."""
        Lmin = max(2, -(-nx // max(nu, 1)) + 1)
        for L in range(min(self.L, K), 0, -1):
            if K % L == 0 and L >= Lmin:
                return L
        for L in range(min(self.L, K) + 1, K + 1):
            if K % L == 0 and L >= Lmin:
                return L
        return K

    def _layout(self, qp: StageQP):
        """Static partition layout: (L, P, interior size, offsets).
        Interior order: [u_{pL} | v_{pL+1..pL+L-1} | y_{pL..pL+L-1}]."""
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        L = self._choose_L(qp.K, nx, nu)
        P = qp.K // L
        s = _interior_dim(L, nx, nu)
        off_u, off_v, off_y = 0, nu, nu + (L - 1) * nv
        return L, P, s, (off_u, off_v, off_y)

    @staticmethod
    def _coupling_masks(qp: StageQP, L, P):
        """Masks for the -I couplings: interior states (stages pL+1 ..
        pL+L-1) and partition-end boundary states (stages L, 2L, ...)."""
        xs = qp.var_mask[:, : qp.nx].astype(qp.A.dtype)   # [K1, nx]
        mm_int = xs[: qp.K].reshape(P, L, qp.nx)[:, 1:]
        mm_e = xs[L:: L]
        return mm_int, mm_e

    # -- assembly ------------------------------------------------------------

    @staticmethod
    def _partition_blocks(Hs, As, mm_int, mm_e, dims, dual_reg):
        """Per-partition interior saddle blocks MII and boundary couplings
        MIB from stage data (vmapped over the partition axis -- the inputs
        may be a local shard of the partitions under shard_map)."""
        L, s, nx, nu, nv, (off_u, off_v, off_y) = dims

        def build(Hp, Ap, mi, me):
            M = jnp.zeros((s, s))
            B = jnp.zeros((s, 2 * nx))          # cols: [x_s | x_e]

            # stationarity of u_{pL} (saddle sign convention [-H A'; A 0])
            M = M.at[off_u:off_u + nu, off_u:off_u + nu].set(
                -Hp[0, nx:, nx:])
            B = B.at[off_u:off_u + nu, :nx].set(-Hp[0, nx:, :nx])
            M = M.at[off_u:off_u + nu, off_y:off_y + nx].set(
                Ap[0, :, nx:].T)

            # interior stage variables v_j, j = 1..L-1
            for j in range(1, L):
                r = off_v + (j - 1) * nv
                M = M.at[r:r + nv, r:r + nv].set(-Hp[j])
                yj = off_y + j * nx
                M = M.at[r:r + nv, yj:yj + nx].set(Ap[j].T)
                yjm = off_y + (j - 1) * nx
                M = M.at[r:r + nx, yjm:yjm + nx].add(
                    -jnp.diag(mi[j - 1]))

            # dynamics rows y_j: A_j v_j - x_{j+1} = r2_j
            for j in range(L):
                yj = off_y + j * nx
                M = M.at[yj:yj + nx, yj:yj + nx].add(
                    dual_reg * jnp.eye(nx))
                if j == 0:
                    B = B.at[yj:yj + nx, :nx].set(Ap[0, :, :nx])
                    M = M.at[yj:yj + nx, off_u:off_u + nu].set(
                        Ap[0, :, nx:])
                else:
                    r = off_v + (j - 1) * nv
                    M = M.at[yj:yj + nx, r:r + nv].set(Ap[j])
                if j < L - 1:
                    r = off_v + j * nv
                    M = M.at[yj:yj + nx, r:r + nx].add(-jnp.diag(mi[j]))
                else:
                    B = B.at[yj:yj + nx, nx:].set(-jnp.diag(me))
            return M, B

        return jax.vmap(build)(Hs, As, mm_int, mm_e)

    def _dims(self, qp: StageQP):
        """Static dim tuple consumed by _partition_blocks."""
        L, P, s, offs = self._layout(qp)
        return L, P, (L, s, qp.nx, qp.nu, qp.nv, offs)

    def _split_stage_data(self, qp: StageQP, H, L, P):
        """Reshape stage data into per-partition blocks [P, L, ...] plus the
        replicated boundary/terminal blocks."""
        nv, nx = qp.nv, qp.nx
        Hs = H[:-1].reshape(P, L, nv, nv)
        As = qp.A_masked().reshape(P, L, nx, nv)
        mm_int, mm_e = self._coupling_masks(qp, L, P)
        Hb = H[::L][:, :nx, :nx]                 # [P+1, nx, nx] boundary
        return Hs, As, mm_int, mm_e, Hb, H[-1]

    def _interior_factor(self, MII, MIB, nx):
        """Ruiz-equilibrated interior inverse + couplings W (per partition;
        runs on a local shard under shard_map).  Returns (Minv, Dd, W)."""
        P, s = MII.shape[:2]
        # Symmetric RUIZ equilibration of the interior saddle IN F64
        # before any f32 factorization: the blocks mix the 1e-8 dual
        # regularization, O(1) Jacobians and barrier/penalty terms across
        # ~10 orders of magnitude, far beyond f32's reach (cond 1e8+
        # makes an unscaled f32 factor produce garbage boundary Schur
        # data and an indefinite master).  Diagonal-based Jacobi scaling
        # is wrong here -- dual rows have near-zero diagonals -- so use
        # row-max Ruiz iterations, which drive every row/column of the
        # symmetric saddle to unit infinity norm.  f64 iterative
        # refinement restores full accuracy on top (the reference's own
        # scaling + refinement layering, hqp/Hqp_IpRedSpBKP.C:299-313 +
        # Hqp_IpMatrix.C).
        Dd = jnp.ones(MII.shape[:2], MII.dtype)              # [P, s]
        MII_s = MII
        for _ in range(3):
            rmax = jnp.max(jnp.abs(MII_s), axis=2)           # [P, s]
            di = 1.0 / jnp.sqrt(jnp.maximum(rmax, 1e-12))
            Dd = Dd * di
            MII_s = MII_s * di[:, :, None] * di[:, None, :]
        MIB_s = MIB * Dd[:, :, None]
        # Inverse (+ raw W) fused in ONE Pallas launch (batched pivoted
        # Gauss-Jordan, hqp_tpu.ops.gj_pallas); the stored Minv is of the
        # SCALED system -- applications go through _interior_apply, which
        # layers ONE f64 inner-refinement round (einsum matvecs) so every
        # interior solve is f64-accurate FOR THE REGULARIZED interior.
        # Composed with the refined master below, the whole factorization
        # then equals the delta-regularized KKT to ~f64, and the outer
        # refinement's contraction is governed by delta alone.
        # the Pallas kernel is f32-only; on f64 backends (CPU) the plain
        # f64 inverse is both exact and supported, so use it there
        use_pallas = (K_.lu_dtype() == jnp.float32
                      and gj_pallas.fits_vmem(P, s, 2 * nx))
        if use_pallas:
            Minv, _, _ = gj_pallas.interior_factor(MII_s, MIB_s)
        else:
            Minv = jnp.linalg.inv(MII_s.astype(K_.lu_dtype()))
        fac0 = (Minv, Dd, MII_s)
        W = _interior_apply(fac0, MIB)
        return Minv, Dd, MII_s, W

    @staticmethod
    def _terminal(HK, nx):
        """Terminal stage u-elimination (same as RiccatiKKT terminal)."""
        LuuK = sl.chol(HK[nx:, nx:])
        KgainK = sl.cho_solve(LuuK, HK[nx:, :nx])
        PKxx = HK[:nx, :nx] - HK[:nx, nx:] @ KgainK
        return LuuK, KgainK, PKxx

    @staticmethod
    def _master_build(Schur, Hb, PKxx, nx):
        """Assemble + factor the boundary master block-tridiagonal system
        from the (full, gathered) per-partition Schur blocks."""
        D = -Hb
        D = D.at[-1].set(-PKxx)
        D = D.at[:-1].add(Schur[:, :nx, :nx])
        D = D.at[1:].add(Schur[:, nx:, nx:])
        Off = Schur[:, :nx, nx:]                 # couples x_p to x_{p+1}

        Sm, Um, dM = blocktri.equilibrate(-D, -Off)
        if MASTER_KERNEL == "thomas" and nx <= thomas_pallas.MAX_BLOCK:
            # single-launch Pallas block-Thomas: factor+solve fused per
            # application, so factor-time master work vanishes
            master = (Sm, Um)
        else:
            master = blocktri.cr_factor(Sm, Um)
        return master, dM

    def factor(self, qp: StageQP, z, w, mask):
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        H = self._hess(qp, z, w, mask)
        L, P, dims = self._dims(qp)
        Hs, As, mm_int, mm_e, Hb, HK = self._split_stage_data(qp, H, L, P)

        MII, MIB = self._partition_blocks(Hs, As, mm_int, mm_e, dims,
                                          self._dual_reg())
        Minv, Dd, MII_s, W = self._interior_factor(MII, MIB, nx)
        LuuK, KgainK, PKxx = self._terminal(HK, nx)
        # Schur in f64 from the inner-refined W: the master must be
        # assembled to f64 accuracy or it loses positive definiteness
        Schur = -jnp.einsum("psb,psc->pbc", MIB, W)   # [P, 2nx, 2nx]
        master, dM = self._master_build(Schur, Hb, PKxx, nx)
        return PartFactors(Minv=Minv, Dscale=Dd, MII=MII_s, W=W, MIB=MIB,
                           master=master, dM=dM, LuuK=LuuK, KgainK=KgainK)

    @staticmethod
    def _hess(qp: StageQP, z, w, mask):
        """Reduced stage Hessians with the fixed-variable and general
        stage-equality penalty blocks (hqp_tpu.qp.kkt.stage_eq_penalty)."""
        return K_._stage_hessians(qp, z, w, mask) + K_.stage_eq_penalty(qp)

    # -- solve ---------------------------------------------------------------

    @staticmethod
    def _rhs_partitions(gsp, r2p, dims):
        """Scatter the reduced rhs into per-partition interior vectors
        (vmapped; shard-local under shard_map)."""
        L, s, nx, nu, nv, (off_u, off_v, off_y) = dims

        def build_rhs(gp, rp):
            rho = jnp.zeros((s,))
            rho = rho.at[off_u:off_u + nu].set(gp[0, nx:])
            rho = rho.at[off_v:off_v + (L - 1) * nv].set(
                gp[1:].reshape(-1))
            rho = rho.at[off_y:off_y + L * nx].set(rp.reshape(-1))
            return rho

        return jax.vmap(build_rhs)(gsp, r2p)

    @staticmethod
    def _backsub(W, dims, t, xpair):
        """Back-substitute interior unknowns given boundary states
        (shard-local under shard_map); returns (u0, vint, dy_partitions)."""
        L, s, nx, nu, nv, (off_u, off_v, off_y) = dims
        zeta = t - jnp.einsum("psb,pb->ps", W, xpair)
        u0 = zeta[:, off_u:off_u + nu]                   # [P, nu]
        vint = zeta[:, off_v:off_v + (L - 1) * nv].reshape(-1, L - 1, nv)
        dy = zeta[:, off_y:off_y + L * nx].reshape(-1, L, nx)
        return u0, vint, dy

    def solve_reduced(self, fac: PartFactors, qp: StageQP, g, r2dyn):
        """Solve [-H A'; A 0][dx; dy] = [g; r2] via the partition Schur."""
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        L, P, dims = self._dims(qp)
        gx, gu = g[:, :nx], g[:, nx:]

        gsp = g[:-1].reshape(P, L, nv)
        r2p = r2dyn.reshape(P, L, nx)
        rhoI = self._rhs_partitions(gsp, r2p, dims)

        rhoB = gx[::L]
        rhoB = rhoB.at[-1].set(gx[-1] - fac.KgainK.T @ gu[-1])

        # condense interiors onto boundaries (batched MXU matmuls with
        # one f64 inner-refinement round)
        t = _interior_apply((fac.Minv, fac.Dscale, fac.MII), rhoI)
        corr = jnp.einsum("psb,ps->pb", fac.MIB, t)     # [P, 2nx]
        rhoB = rhoB.at[:-1].add(-corr[:, :nx])
        rhoB = rhoB.at[1:].add(-corr[:, nx:])

        xB = _master_solve(fac.master, fac.dM, -rhoB, nx)

        # back-substitute interiors (batched)
        xpair = jnp.concatenate([xB[:-1], xB[1:]], axis=1)   # [P, 2nx]
        u0, vint, dy = self._backsub(fac.W, dims, t, xpair)
        vfull = jnp.concatenate(
            [jnp.concatenate([xB[:-1], u0], axis=1)[:, None, :], vint],
            axis=1)                                       # [P, L, nv]
        duK = -(sl.cho_solve(fac.LuuK, gu[-1]) + fac.KgainK @ xB[-1])
        dx = jnp.concatenate(
            [vfull.reshape(P * L, nv),
             jnp.concatenate([xB[-1], duK])[None]], axis=0)
        return dx, dy.reshape(P * L, nx)

    def solve(self, fac, qp: StageQP, z, w, mask, r1, r2, r3, r4):
        def base(a1, a2, a3, a4):
            return K_.stage_base_solve(
                lambda g, r2d: self.solve_reduced(fac, qp, g, r2d),
                qp, z, w, mask, a1, a2, a3, a4)

        sol = base(r1, r2, r3, r4)
        if self.refine_rounds > 0:
            sol = K_.refine(base, qp, z, w, mask, r1, r2, r3, r4, sol,
                            eps=self.refine_eps,
                            max_rounds=self.refine_rounds,
                            unroll=self.refine_unroll)
        return sol


modules.register("qp_mat_solver", "SpSC")(PartitionedKKT)
