"""Partitioned Schur-complement KKT backend ("SpSC").

The TPU-native successor of the reference's Schur-complement path
(hqp/Hqp_IpSpSC.C: form Q+C'VC, sparse Cholesky, Schur complement for the
equality multipliers) and of the stage-parallel decomposition that
SURVEY.md section 2.7.3 calls for: instead of the strictly sequential
Riccati recursion (hqp/Hqp_IpLQDOCP.C:1328, O(K) serial chain), the horizon
is split into P partitions of L stages.  Interior variables of every
partition are eliminated **in parallel** (batched LU over the partition
axis -- large batched matmuls on the MXU), leaving a small block-tridiagonal
master system in the P+1 partition-boundary states, solved by a short scan.

Math: the reduced saddle system  [-H A'; A 0] [dx; dy] = [g; r2]  is
reordered into interior unknowns (u at partition starts, full stage
variables inside, all dynamics multipliers) and boundary unknowns (the
states x_{pL}).  With M_II block-diagonal over partitions,

    master Schur:  (M_BB - M_BI M_II^-1 M_IB) x_B = rho_B - M_BI M_II^-1 rho_I

Each partition couples only to its two boundary states, so the master is
block-tridiagonal with nx-size blocks.  Back-substitution is batched.

This backend is algebraically exact (same solution as RiccatiKKT /
FullStageKKT) -- verified in tests/test_kkt_partitioned.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from hqp_tpu.ops import blocktri
from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp.program import StageQP
from hqp_tpu.qp import kkt as K_


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PartFactors:
    lu: jnp.ndarray       # [P, s, s] LU of interior blocks
    piv: jnp.ndarray      # [P, s]
    W: jnp.ndarray        # [P, s, 2nx]  M_II^-1 M_IB
    MIB: jnp.ndarray      # [P, s, 2nx]
    # master: SPD block-tridiagonal Cholesky of -(boundary Schur system)
    Lb: jnp.ndarray       # [P+1, nx, nx]
    Wb: jnp.ndarray       # [P, nx, nx]
    LuuK: jnp.ndarray     # [nu, nu] terminal u-block Cholesky
    KgainK: jnp.ndarray   # [nu, nx]


def _interior_dim(L, nx, nu):
    nv = nx + nu
    return nu + (L - 1) * nv + L * nx


class PartitionedKKT:
    """Stage-partitioned Schur-complement factorization of a StageQP KKT."""

    def __init__(self, L: int = 16, refine_eps: float = 1e-10,
                 refine_rounds: int = 5):
        self.L = L
        self.refine_eps = refine_eps
        self.refine_rounds = refine_rounds

    def _choose_L(self, K, nx, nu):
        """Pick a partition length: a divisor of K, as close to the
        requested L as possible but at least ceil(nx/nu) + 1 -- below that
        the interior saddle is structurally singular (the L*nx interior
        dynamics rows outnumber the nu + (L-1)(nx+nu) interior columns)."""
        Lmin = max(2, -(-nx // max(nu, 1)))
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

    # -- assembly ------------------------------------------------------------

    def _assemble(self, qp: StageQP, H):
        """Build per-partition interior blocks and couplings.

        Interior variable order per partition p (stages k = pL .. pL+L-1):
          [ u_{pL} | v_{pL+1} ... v_{pL+L-1} | y_{pL} ... y_{pL+L-1} ]
        Boundary variables: x_{pL}, p = 0..P (x_K is the last boundary).
        """
        Kst, nx, nu, nv = qp.K, qp.nx, qp.nu, qp.nv
        L, P, s, (off_u, off_v, off_y) = self._layout(qp)

        Hs = H[:-1].reshape(P, L, nv, nv)       # stage Hessians, k < K
        As = qp.A.reshape(P, L, nx, nv)

        def build(Hp, Ap):
            M = jnp.zeros((s, s))
            B = jnp.zeros((s, 2 * nx))          # cols: [x_s | x_e]

            # stationarity of u_{pL}: -Huu u - Hux x_s + Au' y_0 = ...
            # (saddle sign convention: [-H A'; A 0])
            M = M.at[off_u:off_u + nu, off_u:off_u + nu].set(
                -Hp[0, nx:, nx:])
            B = B.at[off_u:off_u + nu, :nx].set(-Hp[0, nx:, :nx])
            M = M.at[off_u:off_u + nu, off_y:off_y + nx].set(
                Ap[0, :, nx:].T)

            # interior stage variables v_j, j = 1..L-1
            for j in range(1, L):
                r = off_v + (j - 1) * nv
                M = M.at[r:r + nv, r:r + nv].set(-Hp[j])
                # A_j' y_j
                yj = off_y + j * nx
                M = M.at[r:r + nv, yj:yj + nx].set(Ap[j].T)
                # -I' y_{j-1} on the x-part (x_j appears in dynamics j-1)
                yjm = off_y + (j - 1) * nx
                M = M.at[r:r + nx, yjm:yjm + nx].add(-jnp.eye(nx))

            # dynamics rows y_j: A_j v_j - x_{j+1} = r2_j
            for j in range(L):
                yj = off_y + j * nx
                if j == 0:
                    B = B.at[yj:yj + nx, :nx].set(Ap[0, :, :nx])
                    M = M.at[yj:yj + nx, off_u:off_u + nu].set(
                        Ap[0, :, nx:])
                else:
                    r = off_v + (j - 1) * nv
                    M = M.at[yj:yj + nx, r:r + nv].set(Ap[j])
                if j < L - 1:
                    r = off_v + j * nv
                    M = M.at[yj:yj + nx, r:r + nx].add(-jnp.eye(nx))
                else:
                    B = B.at[yj:yj + nx, nx:].set(-jnp.eye(nx))
            return M, B

        MII, MIB = jax.vmap(build)(Hs, As)
        return L, P, s, (off_u, off_v, off_y), MII, MIB

    def factor(self, qp: StageQP, z, w, mask):
        H = K_._stage_hessians(qp, z, w, mask)
        nx, nu = qp.nx, qp.nu
        L, P, s, offs, MII, MIB = self._assemble(qp, H)

        lu, piv = jax.vmap(lu_factor)(MII.astype(K_.lu_dtype()))
        W = jax.vmap(lambda l, p, b: lu_solve((l, p), b))(
            lu, piv, MIB.astype(lu.dtype)).astype(MIB.dtype)

        # terminal stage u-elimination (same as RiccatiKKT terminal)
        HK = H[-1]
        LuuK = sl.chol(HK[nx:, nx:])
        KgainK = sl.cho_solve(LuuK, HK[nx:, :nx])
        PKxx = HK[:nx, :nx] - HK[:nx, nx:] @ KgainK

        # master block-tridiagonal assembly
        # boundary stationarity rows: -Hxx(boundary) dx_B + couplings
        Hb = H[::L][:, :nx, :nx]                 # [P+1, nx, nx] (k = pL)
        D = -Hb
        D = D.at[-1].set(-PKxx)
        Schur = -jnp.einsum("psb,psc->pbc", MIB, W)   # [P, 2nx, 2nx]
        D = D.at[:-1].add(Schur[:, :nx, :nx])
        D = D.at[1:].add(Schur[:, nx:, nx:])
        Off = Schur[:, :nx, nx:]                 # couples x_p to x_{p+1}

        # The boundary Schur system is the negative of an SPD condensed
        # Hessian (inertia argument: all dynamics rows are interior, so the
        # Schur complement of the saddle onto the primal boundary block is
        # negative definite).  Factor -(D, Off) by SPD block-tridiagonal
        # Cholesky with unrolled kernels.
        Lb, Wb = blocktri.factor(-D, -Off)
        return PartFactors(lu=lu, piv=piv, W=W, MIB=MIB, Lb=Lb, Wb=Wb,
                           LuuK=LuuK, KgainK=KgainK)

    # -- solve ---------------------------------------------------------------

    def solve_reduced(self, fac: PartFactors, qp: StageQP, g, r2):
        """Solve [-H A'; A 0][dx; dy] = [g; r2] via the partition Schur."""
        Kst, nx, nu, nv = qp.K, qp.nx, qp.nu, qp.nv
        L, P, s, (off_u, off_v, off_y) = self._layout(qp)
        gx, gu = g[:, :nx], g[:, nx:]

        # interior rhs per partition
        gsp = g[:-1].reshape(P, L, nv)
        r2p = r2.reshape(P, L, nx)

        def build_rhs(gp, rp):
            rho = jnp.zeros((s,))
            rho = rho.at[off_u:off_u + nu].set(gp[0, nx:])
            rho = rho.at[off_v:off_v + (L - 1) * nv].set(
                gp[1:].reshape(-1))
            rho = rho.at[off_y:off_y + L * nx].set(rp.reshape(-1))
            return rho

        rhoI = jax.vmap(build_rhs)(gsp, r2p)

        # boundary rhs: stationarity of x_{pL}; terminal includes the
        # u-elimination correction
        rhoB = gx[::L]
        rhoB = rhoB.at[-1].set(gx[-1] - fac.KgainK.T @ gu[-1])

        # forward Schur: condense interior onto boundaries
        t = jax.vmap(lambda l, p, b: lu_solve((l, p), b))(
            fac.lu, fac.piv, rhoI.astype(fac.lu.dtype)).astype(rhoI.dtype)
        corr = jnp.einsum("psb,ps->pb", fac.MIB, t)     # [P, 2nx]
        rhoB = rhoB.at[:-1].add(-corr[:, :nx])
        rhoB = rhoB.at[1:].add(-corr[:, nx:])

        # master solve: the assembled system is -(SPD); flip the rhs sign
        xB = blocktri.solve(fac.Lb, fac.Wb, -rhoB)       # [P+1, nx]

        # back-substitute interiors (batched)
        xpair = jnp.concatenate([xB[:-1], xB[1:]], axis=1)   # [P, 2nx]
        zeta = t - jnp.einsum("psb,pb->ps", fac.W, xpair)

        # scatter back into (dx, dy)
        u0 = zeta[:, off_u:off_u + nu]                   # [P, nu]
        vint = zeta[:, off_v:off_v + (L - 1) * nv].reshape(P, L - 1, nv)
        vfull = jnp.concatenate(
            [jnp.concatenate([xB[:-1], u0], axis=1)[:, None, :], vint],
            axis=1)                                       # [P, L, nv]
        duK = -(sl.cho_solve(fac.LuuK, gu[-1]) + fac.KgainK @ xB[-1])
        dx = jnp.concatenate(
            [vfull.reshape(P * L, nv),
             jnp.concatenate([xB[-1], duK])[None]], axis=0)

        dy = zeta[:, off_y:off_y + L * nx].reshape(P * L, nx)
        # interior block solved [-H A'; A 0] directly; dy sign matches
        return dx, dy

    def solve(self, fac, qp: StageQP, z, w, mask, r1, r2, r3, r4):
        def base(a1, a2, a3, a4):
            g = K_.reduce_r1(qp, z, w, mask, a1, a3, a4)
            dx, dy = self.solve_reduced(fac, qp, g, a2)
            dz, dw = K_.recover_zw(qp, z, w, mask, dx, a3, a4)
            return dx, dy, dz, dw

        sol = base(r1, r2, r3, r4)
        if self.refine_rounds > 0:
            sol = K_.refine(base, qp, z, w, mask, r1, r2, r3, r4, sol,
                            eps=self.refine_eps,
                            max_rounds=self.refine_rounds)
        return sol


modules.register("qp_mat_solver", "SpSC")(PartitionedKKT)
