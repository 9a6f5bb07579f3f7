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

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Ps

from hqp_tpu.qp.program import StageQP, IneqGroups
from hqp_tpu.qp import kkt as K_
from hqp_tpu.qp.kkt_partitioned import (
    PartitionedKKT, PartFactors, _interior_apply, _master_solve)
from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils import masked as mk
from hqp_tpu.utils.registry import modules


class ShardedPartitionedKKT(PartitionedKKT):
    """PartitionedKKT with the partition axis sharded over a device mesh."""

    #: refinement must run unrolled: shard_map inside a While body
    #: corrupts the heap on XLA:CPU (see hqp_tpu.qp.kkt.refine)
    refine_unroll = True

    def __init__(self, mesh: Mesh, axis: str = "sp", L: int = 16,
                 refine_rounds: int | None = None,
                 full_shard: bool = True, **kw):
        # block-Thomas is a Pallas kernel; inside shard_map keep the
        # einsum-based cyclic reduction (vmap/shard-friendly)
        kw.setdefault("master", "cr")
        super().__init__(L=L, refine_rounds=refine_rounds, **kw)
        self.mesh = mesh
        self.axis = axis
        self.ndev = mesh.shape[axis]
        #: full_shard=True runs the ENTIRE solve inside one shard_map
        #: (no replicated O(K) stage work); False keeps the round-4
        #: layering (replicated stage work around shard_map'd
        #: solve_reduced calls) as a fallback/AB reference
        self.full_shard = full_shard

    def _config(self):
        return super()._config() + (self.mesh, self.axis, self.full_shard)

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

    # -- fully-sharded solve (round 5) ----------------------------------------
    # The parent's solve() ran stage_base_solve, the analytic regularization
    # corrections and the refinement loop on REPLICATED [K1] stage arrays
    # around shard_map'd solve_reduced calls -- the ~30% replicated Amdahl
    # fraction PERF.md section 4 admitted (verdict r3 item 6 / r4 item 2).
    # Here the ENTIRE solve executes inside ONE shard_map: each device owns
    # the stage rows of its partitions plus ONE halo row (the right
    # neighbor's first stage; the true terminal stage on the last device),
    # so every per-stage operation runs verbatim on a local StageQP view of
    # Kloc = P*L/ndev stages.  Neighbor couplings (the -I state transition
    # and its adjoint) are one-row ppermute halos; the boundary master
    # stays replicated; residual norms are local masked maxima + one pmax.
    # Communication per solve: the boundary psum-gathers (O(P nx), horizon-
    # independent) + a few single-row halos + scalar pmax -- nothing O(K).

    def _perm_from_right(self):
        """ppermute spec fetching the RIGHT neighbor's value (i+1 -> i)."""
        return [(i + 1, i) for i in range(self.ndev - 1)]

    def _perm_from_left(self):
        return [(i, i + 1) for i in range(self.ndev - 1)]

    def _halo_append(self, body, term, last):
        """[Kloc, ...] -> [Kloc + 1, ...]: append the right neighbor's
        first row (the replicated terminal row on the last device).  For
        static data and per-stage-computed iterates the halo row is VALID
        by construction: it equals what its owner computes for that row."""
        first = body[0]
        isb = first.dtype == jnp.bool_
        send = first.astype(jnp.uint8) if isb else first
        recv = jax.lax.ppermute(send, self.axis, self._perm_from_right())
        if isb:
            recv = recv.astype(jnp.bool_)
        hrow = jnp.where(last, term, recv)
        return jnp.concatenate([body, hrow[None]], axis=0)

    def _term_row(self, arr_loc, last):
        """Replicated terminal row from the last device's (valid) halo."""
        row = arr_loc[-1]
        return jax.lax.psum(
            jnp.where(last, row, jnp.zeros_like(row)), self.axis)

    def _eqT_local(self, qp_loc, y, idx):
        """matvec_eqT on the local view, plus the left-neighbor coupling:
        global stage row p0 (local row 0) receives -y_dyn of the LEFT
        device's last dynamics row (the -I adjoint crossing the device
        boundary); one nx-row ppermute."""
        out = qp_loc.matvec_eqT(y)
        ylast = y["dyn"][-1]
        yprev = jax.lax.ppermute(ylast, self.axis, self._perm_from_left())
        add = jnp.where(idx > 0, -yprev, jnp.zeros_like(yprev))
        return out.at[0, : qp_loc.nx].add(add)

    def _kkt_residual_local(self, qp_loc, z, w, mask, r1, r2, r3, r4,
                            dx, dy, dz, dw, idx, last, own):
        """kkt_residual on the local view; ``res`` is the GLOBAL masked
        infinity norm (local max over owned rows, then pmax).  ``own``
        masks the halo row off except on the last device (where it is the
        genuine terminal stage)."""
        emask = qp_loc.eq_mask()
        e1 = jnp.where(
            qp_loc.x_mask(),
            r1 + qp_loc.matvec_Q(dx) - self._eqT_local(qp_loc, dy, idx)
            - qp_loc.matvec_ineqT(dz), 0.0)
        Adx = mk.sub(qp_loc.eval_eq(dx), qp_loc.eq_offsets())
        e2 = mk.where(emask, mk.sub(r2, Adx), 0.0)
        Cdx = qp_loc.matvec_ineq(dx)
        e3 = mk.where(mask, mk.tmap(lambda a, b, c: a - (b - c),
                                    r3, Cdx, dw), 0.0)
        e4 = mk.where(mask,
                      mk.tmap(lambda a, zi, wi, dzi, dwi:
                              a - (zi * dwi + wi * dzi),
                              r4, z, w, dz, dw), 0.0)

        def omax(tree):
            out = jnp.asarray(0.0)
            for leaf in jax.tree_util.tree_leaves(tree):
                a = jnp.abs(leaf)
                o = own[: a.shape[0]].reshape(
                    (a.shape[0],) + (1,) * (a.ndim - 1))
                a = jnp.where(o, a, 0.0)
                if a.size:
                    out = jnp.maximum(out, jnp.max(a))
            return out

        res_loc = jnp.maximum(omax(e1), jnp.maximum(
            omax(e2), jnp.maximum(omax(e3), omax(e4))))
        res = jax.lax.pmax(res_loc, self.axis)
        return e1, e2, e3, e4, res

    def _reduced_solve_local(self, dims, qp_loc, fac_l, g2, r2dyn,
                             idx, last):
        """Reduced saddle solve on the local view: local interiors +
        replicated boundary master.  Returns (dx [Kloc+1] with valid halo
        everywhere, dy_dyn [Kloc])."""
        L, s, nx, nu, nv, offs = dims
        Minv, Dd, MII, W, MIB, master, dM, LuuK, KgainK = fac_l
        gx, gu = g2[:, :nx], g2[:, nx:]
        gsp = g2[:-1].reshape(-1, L, nv)
        r2p = r2dyn.reshape(-1, L, nx)
        Pl = gsp.shape[0]
        rhoI = self._rhs_partitions(gsp, r2p, dims)
        t = _interior_apply((Minv, Dd, MII), rhoI)
        corr_l = jnp.einsum("psb,ps->pb", MIB, t)
        # ONE fused psum carries all boundary data: the per-partition
        # Schur corrections, the partition-start rows of g (local rows
        # 0, L, ...), and the terminal row (the last device's valid
        # halo).  Three separate collectives per reduced solve dominated
        # the virtual-mesh overhead (each collective is a sync point;
        # the payload is O(P nx), tiny either way).
        P = Pl * self.ndev
        gxs_l = gx[:-1][::L]                              # [Pl, nx]
        pay = jnp.zeros(P * 2 * nx + P * nx + g2.shape[1])
        i0 = idx * Pl
        pay = jax.lax.dynamic_update_slice_in_dim(
            pay, corr_l.ravel(), i0 * 2 * nx, 0)
        pay = jax.lax.dynamic_update_slice_in_dim(
            pay, gxs_l.ravel(), P * 2 * nx + i0 * nx, 0)
        pay = jax.lax.dynamic_update_slice_in_dim(
            pay, jnp.where(last, g2[-1], jnp.zeros_like(g2[-1])),
            P * 3 * nx, 0)
        pay = jax.lax.psum(pay, self.axis)
        corr = pay[: P * 2 * nx].reshape(P, 2 * nx)
        gxs = pay[P * 2 * nx: P * 3 * nx].reshape(P, nx)
        gT = pay[P * 3 * nx:]
        rhoB_T = gT[:nx] - KgainK.T @ gT[nx:]
        rhoB = jnp.concatenate([gxs, rhoB_T[None]], axis=0)
        rhoB = rhoB.at[:-1].add(-corr[:, :nx])
        rhoB = rhoB.at[1:].add(-corr[:, nx:])
        xB = _master_solve(master, dM, -rhoB, nx, kernel=self.master)

        i0 = idx * Pl
        xs = jax.lax.dynamic_slice_in_dim(xB, i0, Pl + 1, axis=0)
        xpair = jnp.concatenate([xs[:-1], xs[1:]], axis=1)
        u0, vint, dyd = self._backsub(W, dims, t, xpair)
        vfull = jnp.concatenate(
            [jnp.concatenate([xs[:-1], u0], axis=1)[:, None, :], vint],
            axis=1)                                       # [Pl, L, nv]
        duK = -(sl.cho_solve(LuuK, gT[nx:]) + KgainK @ xB[-1])
        dx_term = jnp.concatenate([xB[-1], duK])          # replicated [nv]
        dx = self._halo_append(vfull.reshape(-1, nv), dx_term, last)
        return dx, dyd.reshape(-1, nx)

    def _recover_local(self, qp_loc, z, w, mask, g, dx, dyd,
                       r2, r3, r4, idx):
        """K_.stage_recover on the local view (left-halo fix on the eqT
        adjoint).  Halo validity: every output's halo row is valid
        wherever its per-stage inputs' halos are; dy['fix']'s halo is
        valid on the LAST device only."""
        fm = qp_loc.fixed_mask()
        Hdx = K_.reduced_H_matvec(qp_loc, z, w, mask, dx)
        y0 = {"dyn": dyd, "fix": jnp.zeros_like(g)}
        if qp_loc.has_gen_eq():
            y0["gen"] = jnp.zeros_like(r2["gen"])
        resid = g + Hdx - self._eqT_local(qp_loc, y0, idx)
        dy = {"dyn": dyd}
        if qp_loc.has_gen_eq():
            dyg = K_._recover_gen_multipliers(qp_loc, resid)
            resid = resid - jnp.einsum(
                "kij,ki->kj", qp_loc.E * qp_loc.eqg_mask[:, :, None], dyg)
            dy["gen"] = dyg
        dy["fix"] = jnp.where(fm, resid, 0.0)
        dz, dw = K_.recover_zw(qp_loc, z, w, mask, dx, r3, r4)
        return dx, dy, dz, dw

    def _base_solve_local(self, dims, qp_loc, fac_l, z, w, mask,
                          r1, r2, r3, r4, idx, last):
        """Full base solve + reduced-space Neumann corrections + single
        recovery on the local view (the lean structure of
        kkt_partitioned.PartitionedKKT.solve's ``full``)."""
        fm = qp_loc.fixed_mask()
        g = K_.reduce_r1(qp_loc, z, w, mask, r1, r3, r4)
        g2 = g - K_.FIX_BIG * jnp.where(fm, r2["fix"], 0.0)
        if qp_loc.has_gen_eq():
            rg = jnp.where(qp_loc.eqg_mask, r2["gen"], 0.0)
            g2 = g2 - K_.FIX_BIG * jnp.einsum("kij,ki->kj", qp_loc.E, rg)
        dx, dyd = self._reduced_solve_local(dims, qp_loc, fac_l, g2,
                                            r2["dyn"], idx, last)
        delta = self._dual_reg()
        ylast = dyd
        for _ in range(self.reg_corr_rounds):
            cx, cyd = self._reduced_solve_local(
                dims, qp_loc, fac_l, jnp.zeros_like(g2), delta * ylast,
                idx, last)
            dx, dyd, ylast = dx + cx, dyd + cyd, cyd
        return self._recover_local(qp_loc, z, w, mask, g, dx, dyd,
                                   r2, r3, r4, idx)

    def _full_solve_body(self, dims, shard, rep):
        idx = jax.lax.axis_index(self.axis)
        last = idx == self.ndev - 1
        halo = lambda b, t: self._halo_append(b, t, last)
        grp = lambda tb, tt: jax.tree_util.tree_map(halo, tb, tt)

        qs, qr = shard["qp"], rep["qp"]
        loc = {f: halo(qs[f], qr[f]) for f in qs if f not in ("A", "b")}
        qp_loc = StageQP(A=qs["A"], b=qs["b"], **loc)
        z = grp(shard["z"], rep["z"])
        w = grp(shard["w"], rep["w"])
        mask = grp(shard["mask"], rep["mask"])
        r1 = halo(shard["r1"], rep["r1"])
        r3 = grp(shard["r3"], rep["r3"])
        r4 = grp(shard["r4"], rep["r4"])
        r2 = {"dyn": shard["r2dyn"], "fix": halo(shard["r2fix"],
                                                 rep["r2fix"])}
        if "r2gen" in shard:
            r2["gen"] = halo(shard["r2gen"], rep["r2gen"])
        fac_l = shard["fac"] + rep["fac"]

        def base(a1, a2, a3, a4):
            return self._base_solve_local(dims, qp_loc, fac_l, z, w, mask,
                                          a1, a2, a3, a4, idx, last)

        sol = base(r1, r2, r3, r4)

        Kloc = qp_loc.K
        own = (jnp.arange(Kloc + 1) < Kloc) | last
        if self._refine_rounds() > 0:
            # unrolled true-residual refinement (hqp_tpu.qp.kkt.refine
            # semantics: entry check + monotone guard), with the global
            # residual norm from one pmax per round
            dx, dy, dz, dw = sol
            e1, e2, e3, e4, res = self._kkt_residual_local(
                qp_loc, z, w, mask, r1, r2, r3, r4, dx, dy, dz, dw,
                idx, last, own)
            go = jnp.asarray(True)
            # relative tolerance (K_.refine relative=True semantics,
            # rhs-only scale): local own-row maxima, then one pmax
            def _oscale(arr, valid=None):
                a = jnp.abs(arr)
                if valid is not None:
                    a = jnp.where(valid, a, 0.0)
                o = own[: a.shape[0]].reshape(
                    (a.shape[0],) + (1,) * (a.ndim - 1))
                return jnp.max(jnp.where(o, a, 0.0)) if a.size else 0.0

            sc = _oscale(r1, qp_loc.x_mask())
            for tree, tmask in ((r2, qp_loc.eq_mask()), (r3, mask),
                                (r4, mask)):
                for le, lm in zip(jax.tree_util.tree_leaves(tree),
                                  jax.tree_util.tree_leaves(tmask)):
                    sc = jnp.maximum(sc, _oscale(le, lm))
            sc = jax.lax.pmax(sc, self.axis)
            eps = self._refine_eps() * jnp.maximum(1.0, sc)
            for _ in range(self._refine_rounds()):
                cx, cy, cz, cw = base(e1, e2, e3, e4)
                n_sol = (dx + cx, mk.add(dy, cy), mk.add(dz, cz),
                         mk.add(dw, cw))
                ne1, ne2, ne3, ne4, nres = self._kkt_residual_local(
                    qp_loc, z, w, mask, r1, r2, r3, r4, *n_sol,
                    idx, last, own)
                better = go & (res > eps) & (nres < res)

                def keep(new, old):
                    return jax.tree_util.tree_map(
                        lambda a, b: jnp.where(better, a, b), new, old)

                dx, dy, dz, dw = keep(n_sol, (dx, dy, dz, dw))
                e1, e2, e3, e4 = keep((ne1, ne2, ne3, ne4),
                                      (e1, e2, e3, e4))
                res = jnp.where(better, nres, res)
                go = better
            sol = (dx, dy, dz, dw)

        dx, dy, dz, dw = sol
        tr = lambda a: self._term_row(a, last)
        body = {"dx": dx[:-1], "dy_dyn": dy["dyn"],
                "dy_fix": dy["fix"][:-1],
                "dz": jax.tree_util.tree_map(lambda a: a[:-1], dz),
                "dw": jax.tree_util.tree_map(lambda a: a[:-1], dw)}
        term = {"dx": tr(dx), "dy_fix": tr(dy["fix"]),
                "dz": jax.tree_util.tree_map(tr, dz),
                "dw": jax.tree_util.tree_map(tr, dw)}
        if "gen" in dy:
            body["dy_gen"] = dy["gen"][:-1]
            term["dy_gen"] = tr(dy["gen"])
        return body, term

    def solve(self, fac, qp: StageQP, z, w, mask, r1, r2, r3, r4):
        if not self.full_shard:
            return super().solve(fac, qp, z, w, mask, r1, r2, r3, r4)
        L, P, dims = self._dims(qp)
        bb = lambda a: a[:-1]
        tt = lambda a: a[-1]
        k1f = ["Q", "c", "lb", "ub", "C", "d_lo", "d_up", "var_mask",
               "con_mask"]
        if qp.has_gen_eq():
            k1f += ["E", "e", "eqg_mask"]
        shard = {
            "qp": {**{f: bb(getattr(qp, f)) for f in k1f},
                   "A": qp.A, "b": qp.b},
            "z": jax.tree_util.tree_map(bb, z),
            "w": jax.tree_util.tree_map(bb, w),
            "mask": jax.tree_util.tree_map(bb, mask),
            "r1": bb(r1), "r3": jax.tree_util.tree_map(bb, r3),
            "r4": jax.tree_util.tree_map(bb, r4),
            "r2dyn": r2["dyn"], "r2fix": bb(r2["fix"]),
            "fac": (fac.Minv, fac.Dscale, fac.MII, fac.W, fac.MIB),
        }
        rep = {
            "qp": {f: tt(getattr(qp, f)) for f in k1f},
            "z": jax.tree_util.tree_map(tt, z),
            "w": jax.tree_util.tree_map(tt, w),
            "mask": jax.tree_util.tree_map(tt, mask),
            "r1": tt(r1), "r3": jax.tree_util.tree_map(tt, r3),
            "r4": jax.tree_util.tree_map(tt, r4),
            "r2fix": tt(r2["fix"]),
            "fac": (fac.master, fac.dM, fac.LuuK, fac.KgainK),
        }
        if qp.has_gen_eq():
            shard["r2gen"] = bb(r2["gen"])
            rep["r2gen"] = tt(r2["gen"])

        body, term = jax.shard_map(
            partial(self._full_solve_body, dims),
            mesh=self.mesh,
            in_specs=(Ps(self.axis), Ps()),
            out_specs=(Ps(self.axis), Ps()),
            check_vma=True,
        )(shard, rep)

        cat = lambda b_, t_: jnp.concatenate([b_, t_[None]], axis=0)
        dx = cat(body["dx"], term["dx"])
        dy = {"dyn": body["dy_dyn"],
              "fix": cat(body["dy_fix"], term["dy_fix"])}
        if "dy_gen" in body:
            dy["gen"] = cat(body["dy_gen"], term["dy_gen"])
        dz = jax.tree_util.tree_map(cat, body["dz"], term["dz"])
        dw = jax.tree_util.tree_map(cat, body["dw"], term["dw"])
        return dx, dy, dz, dw

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
