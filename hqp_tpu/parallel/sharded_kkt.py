"""Multi-device stage-partitioned KKT factorization (shard_map + collectives).

The TPU-native successor of the reference's two parallel-solve designs --
the shared-memory-parallel factorization (hqp/Hqp_IpPARDISO.h:65 `_ncpu`)
and the Schur-complement decomposition (hqp/Hqp_IpSpSC.C:46-48,351) -- and
the multi-host scaling path SURVEY.md section 2.7.3 prescribes: the horizon
is split into P partitions; each device owns P/n_dev of them and eliminates
their interiors locally (batched Gauss-Jordan in one Pallas launch on TPU);
the per-partition boundary Schur blocks (2nx x 2nx, tiny) are combined with
ONE ``all_gather`` over the ICI mesh axis; the boundary master system
((P+1) nx unknowns) is factored redundantly on every device -- cheaper than
communicating a distributed triangular solve at these sizes -- and interiors
back-substitute locally with a second ``all_gather`` of the boundary rhs.

Communication per factor+solve: two all_gathers of O(P nx^2) floats --
independent of the horizon length K, so scaling efficiency over the stage
axis approaches 1 as K grows.  All collectives ride the mesh axis given at
construction (lay the mesh out so this axis maps to ICI, not DCN).

Correctness vs the single-device PartitionedKKT: tests/test_sharded_kkt.py
(8-device CPU mesh, exact agreement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Ps

from hqp_tpu.qp.program import StageQP
from hqp_tpu.qp.kkt_partitioned import (
    PartitionedKKT, PartFactors, _interior_apply, _master_solve)
from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils.registry import modules


class ShardedPartitionedKKT(PartitionedKKT):
    """PartitionedKKT with the partition axis sharded over a device mesh."""

    #: refinement must run unrolled: shard_map inside a While body
    #: corrupts the heap on XLA:CPU (see hqp_tpu.qp.kkt.refine)
    refine_unroll = True

    def __init__(self, mesh: Mesh, axis: str = "sp", L: int = 16,
                 refine_rounds: int = 4, **kw):
        # block-Thomas is a Pallas kernel; inside shard_map keep the
        # einsum-based cyclic reduction (vmap/shard-friendly)
        kw.setdefault("master", "cr")
        super().__init__(L=L, refine_rounds=refine_rounds, **kw)
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]

    def _config(self):
        return super()._config() + (self.mesh, self.axis)

    # -- layout: P must divide evenly over the devices ------------------------

    def _choose_L(self, K, nx, nu):
        nd = self.ndev
        Lmin = max(2, -(-nx // max(nu, 1)) + 1)
        best = None
        for L in range(1, K + 1):
            if K % L or L < Lmin or (K // L) % nd:
                continue
            d = abs(L - self.L)
            if best is None or d < best[0]:
                best = (d, L)
        if best is None:
            raise ValueError(
                f"no partition length L >= {Lmin} divides K={K} into a "
                f"multiple of {nd} devices; pad the horizon")
        return best[1]

    # -- collectives -----------------------------------------------------------

    def _gather_replicated(self, local):
        """Gather per-partition blocks from every device into the full
        [P, ...] array, REPLICATED on each device: scatter the local shard
        into its slot of a zero array and ``psum`` over the mesh axis.
        Equivalent in cost to an all_gather, but the result's replication
        is statically visible to shard_map's varying-axes checker (psum
        output is unvarying; all_gather output is not)."""
        Pl = local.shape[0]
        i0 = jax.lax.axis_index(self.axis) * Pl
        full = jnp.zeros((Pl * self.ndev,) + local.shape[1:], local.dtype)
        full = jax.lax.dynamic_update_slice_in_dim(full, local, i0, 0)
        return jax.lax.psum(full, self.axis)

    # -- sharded factor --------------------------------------------------------

    def _local_factor(self, dims, Hs, As, mi, me, Hb, HK):
        """Per-device: build + factor the local partition interiors, then
        combine boundary Schur data with one all_gather and factor the
        (tiny) master redundantly."""
        nx = dims[2]
        MII, MIB = self._partition_blocks(Hs, As, mi, me, dims,
                                          self._dual_reg())
        Minv, Dd, MII, W = self._interior_factor(MII, MIB, nx)
        Schur_l = -jnp.einsum("psb,psc->pbc", MIB, W)   # [Pl, 2nx, 2nx]
        Schur = self._gather_replicated(Schur_l)        # [P, 2nx, 2nx]
        LuuK, KgainK, PKxx = self._terminal(HK, nx)
        master, dM = self._master_build(Schur, Hb, PKxx, nx,
                                        kernel=self.master)
        return Minv, Dd, MII, W, MIB, master, dM, LuuK, KgainK

    def factor(self, qp: StageQP, z, w, mask):
        H = self._hess(qp, z, w, mask)
        L, P, dims = self._dims(qp)
        Hs, As, mi, me, Hb, HK = self._split_stage_data(qp, H, L, P)

        sp, rep = Ps(self.axis), Ps()
        out = jax.shard_map(
            partial(self._local_factor, dims),
            mesh=self.mesh,
            in_specs=(sp, sp, sp, sp, rep, rep),
            out_specs=(sp, sp, sp, sp, sp, rep, rep, rep, rep),
            check_vma=True,
        )(Hs, As, mi, me, Hb, HK)
        Minv, Dd, MII, W, MIB, master, dM, LuuK, KgainK = out
        return PartFactors(Minv=Minv, Dscale=Dd, MII=MII, W=W, MIB=MIB,
                           master=master, dM=dM, LuuK=LuuK, KgainK=KgainK)

    # -- sharded solve ---------------------------------------------------------

    def _local_solve(self, dims, Pl, Minv, Dd, MII, W, MIB, master, dM,
                     gsp, r2p, rhoB0):
        """Per-device: condense local interiors onto the boundary, gather
        the boundary rhs, solve the replicated master, back-substitute the
        local interiors."""
        L, s, nx, nu, nv, offs = dims
        rhoI = self._rhs_partitions(gsp, r2p, dims)
        t = _interior_apply((Minv, Dd, MII), rhoI)
        corr_l = jnp.einsum("psb,ps->pb", MIB, t)        # [Pl, 2nx]
        corr = self._gather_replicated(corr_l)           # [P, 2nx]
        rhoB = rhoB0.at[:-1].add(-corr[:, :nx])
        rhoB = rhoB.at[1:].add(-corr[:, nx:])
        xB = _master_solve(master, dM, -rhoB, nx,
                           kernel=self.master)    # replicated [P+1, nx]

        i0 = jax.lax.axis_index(self.axis) * Pl
        xs = jax.lax.dynamic_slice_in_dim(xB, i0, Pl + 1, axis=0)
        xpair = jnp.concatenate([xs[:-1], xs[1:]], axis=1)   # [Pl, 2nx]
        u0, vint, dy = self._backsub(W, dims, t, xpair)
        vfull = jnp.concatenate(
            [jnp.concatenate([xs[:-1], u0], axis=1)[:, None, :], vint],
            axis=1)                                       # [Pl, L, nv]
        return vfull, dy, xB

    def solve_reduced(self, fac: PartFactors, qp: StageQP, g, r2dyn):
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        L, P, dims = self._dims(qp)
        Pl = P // self.ndev
        gx, gu = g[:, :nx], g[:, nx:]
        gsp = g[:-1].reshape(P, L, nv)
        r2p = r2dyn.reshape(P, L, nx)
        rhoB0 = gx[::L]
        rhoB0 = rhoB0.at[-1].set(gx[-1] - fac.KgainK.T @ gu[-1])

        sp, rep = Ps(self.axis), Ps()
        vfull, dy, xB = jax.shard_map(
            partial(self._local_solve, dims, Pl),
            mesh=self.mesh,
            in_specs=(sp, sp, sp, sp, sp, rep, rep, sp, sp, rep),
            out_specs=(sp, sp, rep),
            check_vma=True,
        )(fac.Minv, fac.Dscale, fac.MII, fac.W, fac.MIB,
          fac.master, fac.dM, gsp, r2p, rhoB0)

        duK = -(sl.cho_solve(fac.LuuK, gu[-1]) + fac.KgainK @ xB[-1])
        dx = jnp.concatenate(
            [vfull.reshape(P * L, nv),
             jnp.concatenate([xB[-1], duK])[None]], axis=0)
        return dx, dy.reshape(P * L, nx)

    # -- sharded placement helper ---------------------------------------------

    def shard_qp(self, qp: StageQP):
        """Place the stage-block arrays so their leading (stage) axis lands
        partition-aligned on the mesh: blocked rows k in [p L, (p+1) L)
        live with partition p's owner.  K1 = P L + 1 is not divisible by
        the device count, so stage arrays ride as replicated (they are
        O(K nv^2), small next to the interior factors); the factor inputs
        are re-sharded by shard_map's in_specs at no cost beyond the
        initial placement."""
        rep = NamedSharding(self.mesh, Ps())
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), qp)


modules.register("qp_mat_solver", "SpSCdist")(ShardedPartitionedKKT)
