"""Exchangeable KKT backends for the interior-point solver.

The reference factors the per-IP-iteration KKT system

    | -Q  A'  C'  0 | |dx|   |r1|
    |  A  0   0   0 | |dy|   |r2|
    |  C  0   0  -I | |dz| = |r3|
    |  0  0   W   Z | |dw|   |r4|

through exchangeable ``Hqp_IpMatrix`` subclasses (hqp/Hqp_IpMatrix.h:42-89).
All backends here use the same reduction (as hqp/Hqp_IpRedSpBKP.C): eliminate
(dz, dw) to get the saddle system

    [-H  A'] [dx]   [r1 - C'(W^-1 Z r3 + W^-1 r4)]
    [ A  0 ] [dy] = [r2]                     with  H = Q + C' W^-1 Z C,

then recover dz = W^-1 Z (r3 - C dx) + W^-1 r4  and  dw = C dx - r3.

Backends:

* :class:`RiccatiKKT` -- the structured DOCP path (Hqp_IpLQDOCP analog,
  hqp/Hqp_IpLQDOCP.C:1328 ExRiccatiFactor/Solve).  Instead of a sparse
  backward recursion with generalized elimination and BKP pivoting, this is a
  ``lax.scan`` over stage blocks with Cholesky factorization of the
  projected control Hessian Guu -- pivot-free by design, justified by the
  reference's own iterative-refinement layering (hqp/Hqp_IpMatrix.C) and the
  positive-definiteness guaranteed by the BFGS + barrier terms.
* :class:`DenseKKT` -- dense reduced saddle system by LU (the role of the
  default Hqp_IpRedSpBKP, hqp/Hqp_IpRedSpBKP.C:281, for general NLPs).
* :class:`FullStageKKT` -- lowers a StageQP to the dense saddle system; the
  verification oracle for RiccatiKKT (role of the dormant full-matrix
  variants, hqp/Hqp_IpFullSpLU).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from hqp_tpu.ops import smalllin as sl
from hqp_tpu.utils import masked as mk

#: diagonal penalty pinning fixed (min == max) variables; exactness is
#: restored by iterative refinement against the true KKT system
FIX_BIG = 1e10
from hqp_tpu.utils.registry import modules
from hqp_tpu.qp.program import StageQP, DenseQP, IneqGroups


# ---------------------------------------------------------------------------
# shared reduction helpers (group-generic over the qp's inequality pytree)
# ---------------------------------------------------------------------------

#: Active-set barrier cap: sigma = z/w is clipped at SIGMA_CAP wherever a
#: constraint goes hard-active (w -> 0 at moderate mu, so sigma reaches
#: 1e16+ on degenerate QPs -- e.g. DID's near-duplicate bound/path rows).
#: Beyond ~1/eps_f64 NO factorization can cancel sigma*dx terms in the
#: stationarity rows, and the computed directions explode (measured:
#: dz ~ 2e14, one step destroyed a converged iterate).  Capping is the
#: TPU-native (static-shape) realization of the reference's active-set
#: split `_wz_tol` (hqp/Hqp_IpLQDOCP.C:814-819): capped rows behave as
#: equalities enforced by a 1e12 penalty.  The cap is applied CONSISTENTLY
#: across the factorization path (Hessian fold-in, rhs reduction, dz/dw
#: recovery), so repeated base solves agree with each other.  The
#: refinement loop, however, targets the TRUE-z residual (kkt_residual
#: uses the uncapped z/w): on capped rows the complementarity residual is
#: O(z/SIGMA_CAP) and cannot be driven below that by re-solving the
#: capped system -- the monotone guard (accept a round only while the
#: residual norm decreases) is what stops the loop there.  The IP
#: iterate's own convergence measures (phi, mu) also use the true z and
#: stay honest.
SIGMA_CAP = 1e12

#: kkt_residual norm style: True = single fused max over concatenated
#: components, False = per-group norm tree (perf A/B, see profile_kkt8)
RES_SINGLE_MAX = False


def barrier_ratios(z, w, mask):
    """sigma = min(z/w, SIGMA_CAP) per inequality group, zero if masked."""
    return mk.tmap(
        lambda zi, wi, m: jnp.where(m, jnp.minimum(zi / wi, SIGMA_CAP), 0.0),
        z, w, mask)


def _w_inv_eff(zi, wi):
    """Effective 1/w for the r4 terms: min(1/w, SIGMA_CAP/z).

    For a hard-active row (sigma capped) this realizes the reference's
    exact active-set right-hand side: the row is driven to the equality
    C dx = r3 + r4/z (hqp/Hqp_IpLQDOCP.C:925-932 appends exactly this rhs
    to the stage equalities), scaled by the penalty SIGMA_CAP.  The
    resulting recovered dz stays O(rhs) instead of O(sigma * dx_error),
    and the TRUE-z complementarity residual of the solve is O(z / CAP) --
    so capped rows no longer re-inject complementarity error into the IP
    iterate (measured: mu oscillated 1e-7 <-> 1e-5 without this)."""
    return jnp.minimum(1.0 / wi, SIGMA_CAP / jnp.maximum(zi, 1e-300))


def reduce_r1(qp, z, w, mask, r1, r3, r4):
    """r1_eff = r1 - C'(sigma_eff r3 + w_inv_eff r4), zeroed on absent
    variables (their rows are identity rows pinning the step to zero)."""
    t = mk.tmap(
        lambda zi, wi, r3i, r4i, m: jnp.where(
            m,
            jnp.minimum(zi / wi, SIGMA_CAP) * r3i + _w_inv_eff(zi, wi) * r4i,
            0.0),
        z, w, r3, r4, mask,
    )
    return jnp.where(qp.x_mask(), r1 - qp.matvec_ineqT(t), 0.0)


def kkt_residual(qp, z, w, mask, r1, r2, r3, r4, dx, dy, dz, dw):
    """Residual of the full 4x4 KKT system and its infinity norm
    (Hqp_IpMatrix::residuum, hqp/Hqp_IpMatrix.C:131-180)."""
    emask = qp.eq_mask()
    e1 = jnp.where(
        qp.x_mask(),
        r1 + qp.matvec_Q(dx) - qp.matvec_eqT(dy) - qp.matvec_ineqT(dz),
        0.0)
    Adx = mk.sub(qp.eval_eq(dx), qp.eq_offsets())
    e2 = mk.where(emask, mk.sub(r2, Adx), 0.0)
    Cdx = qp.matvec_ineq(dx)
    e3 = mk.where(mask, mk.tmap(lambda a, b, c: a - (b - c), r3, Cdx, dw),
                  0.0)
    e4 = mk.where(mask,
                  mk.tmap(lambda a, zi, wi, dzi, dwi: a - (zi * dwi
                                                          + wi * dzi),
                          r4, z, w, dz, dw), 0.0)
    if RES_SINGLE_MAX:
        # one reduction over all residual components
        import jax.tree_util as jtu
        leaves = [jnp.abs(e1).ravel()]
        for t, m in ((e2, emask), (e3, mask), (e4, mask)):
            for le, lm in zip(jtu.tree_leaves(t), jtu.tree_leaves(m)):
                leaves.append(jnp.where(lm, jnp.abs(le), 0.0).ravel())
        res = jnp.max(jnp.concatenate(leaves))
    else:
        res = jnp.maximum(
            jnp.maximum(mk.norm_inf(e1), mk.norm_inf(e2, emask)),
            jnp.maximum(mk.norm_inf(e3, mask), mk.norm_inf(e4, mask)))
    return e1, e2, e3, e4, res


def rhs_scale(qp, mask, r1, r2, r3, r4):
    """Masked infinity norm of the stacked KKT rhs -- the natural scale
    for a RELATIVE refinement tolerance.  Late-barrier IP iterates carry
    rhs components of magnitude ~z*w >> 1; an absolute eps forces
    refinement rounds there that buy nothing (the direction magnitudes
    grow with the same scale), which round-5 profiling measured as the
    single largest in-loop cost (~14 ms of the 34.5 ms DID-1000 step)."""
    emask = qp.eq_mask()
    s = mk.norm_inf(r1, qp.x_mask())
    s = jnp.maximum(s, mk.norm_inf(r2, emask))
    s = jnp.maximum(s, mk.norm_inf(r3, mask))
    return jnp.maximum(s, mk.norm_inf(r4, mask))


def refine(solve_fn, qp, z, w, mask, r1, r2, r3, r4, sol,
           eps=1e-10, max_rounds=5, unroll=False, relative=True):
    """Iterative refinement of a KKT solve (Hqp_IpMatrix::solve,
    hqp/Hqp_IpMatrix.C:65-128): re-solve on the residual and accept the
    correction while the residual norm improves.  Runs as a
    ``lax.while_loop`` so the common case (already accurate) costs one
    residual evaluation.

    ``relative=True`` scales ``eps`` by max(1, ||rhs||_inf,
    ||data||_inf * ||sol||_inf) -- the backward-error test (residual
    relative to |A||x| + |b|), matching the reference's residuum test
    against the iterate's own scale (hqp/Hqp_IpMatrix.C:119-124).  The
    solution term matters: the analytic-correction floor of the
    partitioned backend is ~delta_eff * ||dy||, i.e. it scales with the
    SOLUTION, so an rhs-only scale forces one futile round per solve at
    every large-direction iterate (measured: 21.4 -> 10.2 ms per
    DID-1000 IP step once the entry check accounts for it).

    ``unroll=True`` runs the rounds as straight-line code with ``where``
    gating instead of a ``while_loop``.  Required when ``solve_fn``
    contains a ``shard_map`` (the sharded partitioned backend): XLA:CPU's
    runtime corrupts the heap on collectives inside a ``While`` body
    (observed on jax 0.9 with the 8-device host mesh; results are
    computed correctly, then frees crash) -- and on TPU the unrolled form
    also avoids re-launch overhead of a serial loop over collectives."""
    dx, dy, dz, dw = sol
    if relative:
        # rhs-only scale.  Solution-scaled variants (max over sol, or
        # |dx| only) were measured and REVERTED: they skip refinement
        # rounds whose accuracy the DID-1000 IP genuinely needs
        # (solution-scaled rr4 diverged outright; dx-scaled rr2 hit
        # subiters while rhs-only rr2 converges at 25 it/s).
        eps = eps * jnp.maximum(1.0, rhs_scale(qp, mask, r1, r2, r3, r4))
    e1, e2, e3, e4, res0 = kkt_residual(qp, z, w, mask, r1, r2, r3, r4,
                                        dx, dy, dz, dw)

    # the residual vectors of the CURRENT iterate ride in the loop carry,
    # so each round costs ONE residual evaluation + one solve (the naive
    # form re-evaluated the entry residual every round; at ~1 ms per
    # 4x4-system residual on the 1000-stage QP that was the single
    # largest refinement cost)
    def body(carry):
        (dx, dy, dz, dw), (e1, e2, e3, e4), res, i, go = carry
        cx, cy, cz, cw = solve_fn(e1, e2, e3, e4)
        nx_, ny_, nz_, nw_ = (dx + cx, mk.add(dy, cy), mk.add(dz, cz),
                              mk.add(dw, cw))
        ne1, ne2, ne3, ne4, nres = kkt_residual(qp, z, w, mask,
                                                r1, r2, r3, r4,
                                                nx_, ny_, nz_, nw_)
        better = go & (res > eps) & (nres < res)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(better, a, b), new, old)
        return ((keep(nx_, dx), keep(ny_, dy), keep(nz_, dz),
                 keep(nw_, dw)),
                (keep(ne1, e1), keep(ne2, e2), keep(ne3, e3),
                 keep(ne4, e4)),
                jnp.where(better, nres, res), i + 1, better)

    carry = ((dx, dy, dz, dw), (e1, e2, e3, e4), res0,
             jnp.asarray(0), jnp.asarray(True))
    if unroll:
        for _ in range(max_rounds):
            carry = body(carry)
    else:
        def cond(c):
            sol, errs, res, i, go = c
            return go & (i < max_rounds) & (res > eps)

        carry = jax.lax.while_loop(cond, body, carry)
    (dx, dy, dz, dw), _, res, _, _ = carry
    return dx, dy, dz, dw


def reduced_H_matvec(qp, z, w, mask, dx):
    """(Q + C' W^-1 Z C) dx -- the reduced Hessian operator."""
    sig = barrier_ratios(z, w, mask)
    Cdx = qp.matvec_ineq(dx)
    return qp.matvec_Q(dx) + qp.matvec_ineqT(
        mk.tmap(lambda s, c: s * c, sig, Cdx))


def stage_eq_penalty(qp: "StageQP"):
    """[K1, nv, nv] penalty blocks replacing the hard stage equality rows
    in the reduced Hessian: FIX_BIG on fixed (lb == ub) variable diagonals
    and FIX_BIG * E'E for general stage equality rows.  This is the
    TPU-native realization of the reference's GE_QP stage-constraint
    elimination (hqp/Hqp_IpLQDOCP.C:1377; meschach/addon_hqp.h:207-209):
    instead of a data-dependent nullspace factorization per stage (dynamic
    shapes), the rows are folded into the (static-shape) stage blocks as a
    quadratic penalty whose error is O(1/FIX_BIG) -- then driven to exact
    feasibility by iterative refinement against the true KKT system
    (hqp/Hqp_IpMatrix.C's own layering)."""
    fm = qp.fixed_mask()
    Hp = jnp.einsum("ki,ij->kij", fm.astype(jnp.float64) * FIX_BIG,
                    jnp.eye(qp.nv))
    if qp.has_gen_eq():
        Em = qp.E * qp.eqg_mask[:, :, None]
        Hp = Hp + FIX_BIG * jnp.einsum("kem,ken->kmn", Em, Em)
    return Hp


def _recover_gen_multipliers(qp, resid):
    """Per-stage least-squares recovery of general-equality multipliers
    from the stationarity residual: (E E' + reg) yg = E resid, excluding
    fixed-variable columns (their identity rows own those residuals)."""
    Em = qp.E * qp.eqg_mask[:, :, None]
    free = (~qp.fixed_mask()).astype(Em.dtype)
    Ef = Em * free[:, None, :]
    meq = qp.meq
    G = jnp.einsum("kim,kjm->kij", Ef, Ef)
    G = G + 1e-12 * jnp.eye(meq) + jnp.einsum(
        "ki,ij->kij", 1.0 - qp.eqg_mask.astype(G.dtype), jnp.eye(meq))
    rhs = jnp.einsum("kim,km->ki", Ef, resid * free)
    yg = jnp.linalg.solve(G, rhs[..., None])[..., 0]
    return jnp.where(qp.eqg_mask, yg, 0.0)


def stage_reduce_rhs(qp, z, w, mask, r1, r2, r3, r4):
    """Head of the stage-structured base solve: the penalty-adjusted
    reduced rhs (g for recovery, g2 for the reduced solve)."""
    fm = qp.fixed_mask()
    g = reduce_r1(qp, z, w, mask, r1, r3, r4)
    g2 = g - FIX_BIG * jnp.where(fm, r2["fix"], 0.0)
    if qp.has_gen_eq():
        rg = jnp.where(qp.eqg_mask, r2["gen"], 0.0)
        g2 = g2 - FIX_BIG * jnp.einsum("kij,ki->kj", qp.E, rg)
    return g, g2


def stage_recover(qp, z, w, mask, g, dx, dyd, r2, r3, r4):
    """Tail of the stage-structured base solve: multipliers of the
    eliminated rows from exact stationarity, plus (dz, dw) recovery.

    All recovered quantities are AFFINE in (dx, dyd) for fixed (g, r3,
    r4), so a solve composed of a base solve plus reduced-space
    correction solves (zero g, zero r3/r4) may run this recovery ONCE on
    the accumulated (dx, dyd) -- exactly equal to accumulating per-round
    recoveries, at a fraction of the cost (round-5 profiling: the per-
    correction recovery work was ~1/3 of each correction solve)."""
    fm = qp.fixed_mask()
    Hdx = reduced_H_matvec(qp, z, w, mask, dx)
    y0 = {"dyn": dyd, "fix": jnp.zeros_like(g)}
    if qp.has_gen_eq():
        y0["gen"] = jnp.zeros_like(r2["gen"])
    resid = g + Hdx - qp.matvec_eqT(y0)
    dy = {"dyn": dyd}
    if qp.has_gen_eq():
        dyg = _recover_gen_multipliers(qp, resid)
        resid = resid - jnp.einsum(
            "kij,ki->kj", qp.E * qp.eqg_mask[:, :, None], dyg)
        dy["gen"] = dyg
    dy["fix"] = jnp.where(fm, resid, 0.0)
    dz, dw = recover_zw(qp, z, w, mask, dx, r3, r4)
    return dx, dy, dz, dw


def stage_base_solve(solve_reduced_fn, qp, z, w, mask, r1, r2, r3, r4):
    """Shared base solve for the stage-structured backends (Riccati and
    partitioned Schur): penalty-adjusted reduced rhs for fixed variables
    and general stage equalities, reduced solve, then multiplier recovery
    from exact stationarity.  Exactness comes from the caller's iterative
    refinement wrapper."""
    g, g2 = stage_reduce_rhs(qp, z, w, mask, r1, r2, r3, r4)
    dx, dyd = solve_reduced_fn(g2, r2["dyn"])
    return stage_recover(qp, z, w, mask, g, dx, dyd, r2, r3, r4)


def recover_zw(qp, z, w, mask, dx, r3, r4):
    """dz = sigma_eff (r3 - C dx) + w_inv_eff r4,  dw = C dx - r3.

    Uncapped rows: the exact reduction formulas (e4 solved exactly).
    Capped (hard-active) rows: the active-set recovery -- dz bounded,
    true-z e4 residual O(z/SIGMA_CAP) (see _w_inv_eff)."""
    Cdx = qp.matvec_ineq(dx)
    dz = mk.tmap(
        lambda zi, wi, r3i, r4i, ci, m: jnp.where(
            m,
            jnp.minimum(zi / wi, SIGMA_CAP) * (r3i - ci)
            + _w_inv_eff(zi, wi) * r4i,
            0.0,
        ),
        z, w, r3, r4, Cdx, mask,
    )
    dw = mk.tmap(
        lambda ci, r3i, m: jnp.where(m, ci - r3i, 0.0), Cdx, r3, mask
    )
    return dz, dw


# ---------------------------------------------------------------------------
# Riccati backend (structured DOCP path)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RiccatiFactors:
    Luu: jnp.ndarray     # [K, nu, nu] Cholesky factors of Guu_k
    Gux: jnp.ndarray     # [K, nu, nx]
    Kgain: jnp.ndarray   # [K, nu, nx] Guu^-1 Gux
    P: jnp.ndarray       # [K1, nx, nx] cost-to-go Hessians (P_0..P_K)
    LP0: jnp.ndarray     # [nx, nx] Cholesky factor of P_0
    LuuK: jnp.ndarray    # [nu, nu] Cholesky of the terminal u-block
    KgainK: jnp.ndarray  # [nu, nx] HuuK^-1 HuxK


def _stage_hessians(qp: StageQP, z: IneqGroups, w: IneqGroups,
                    mask: IneqGroups) -> jnp.ndarray:
    """H_k = Q_k + diag(box barrier) + C_k' Sigma C_k, shape [K1, nv, nv].

    Box bounds enter as pure diagonal terms -- the TPU-native replacement of
    the reference's sparse +-e_i constraint rows (hqp/Hqp_Docp.C:585-758)
    flowing through sub_CTC (hqp/Hqp_IpRedSpBKP.C:297).  Absent variables
    (x_mask False) are projected out: identity rows/columns.
    """
    sig = barrier_ratios(z, w, mask)
    diag_box = sig.bl + sig.bu                       # [K1, nv]
    sgen = sig.gl + sig.gu                           # [K1, mc]
    H = qp.Q + jnp.einsum("kim,km,kjm->kij",
                          jnp.swapaxes(qp.C, 1, 2), sgen,
                          jnp.swapaxes(qp.C, 1, 2))
    H = H + jnp.einsum("ki,ij->kij", diag_box, jnp.eye(qp.nv))
    vm = qp.x_mask().astype(H.dtype)
    H = H * vm[:, :, None] * vm[:, None, :]
    H = H + jnp.einsum("ki,ij->kij", 1.0 - vm, jnp.eye(qp.nv))
    return H


class RiccatiKKT:
    """Backward Riccati factorization of the reduced stage-structured KKT.

    Cites: hqp/Hqp_IpLQDOCP.C:796-862 (factor), :1328-1600 (ExRiccatiFactor),
    :1601-1788 (ExRiccatiSolve).  The TPU redesign replaces active-set
    splitting + GE_QP elimination + BKP pivoting by the pure barrier path
    (the reference's own `_wz_tol == inf` scaled variant, C:850-853) with
    Cholesky of Guu, and runs as a `lax.scan` over [K, n, n] HBM blocks.

    LIMITATION: the sequential recursion cannot represent pinned (absent)
    states at stages k >= 1 -- their dynamics rows become constraints on
    the preceding stage, which needs constraint-to-go propagation (the
    reference's GE_QP role).  Problems with fixed terminal states must use
    :class:`~hqp_tpu.qp.kkt_partitioned.PartitionedKKT` (the default) or
    :class:`FullStageKKT`; RiccatiKKT remains exact for problems whose
    fixed states are at stage 0 only (the common MPC shape).

    ROLE (round 5): this sequential scan is the *parity oracle* for the
    reference's Riccati recursion, registered as ``qp_mat_solver
    Riccati``.  The reference's flagship structured name ``LQDOCP``
    resolves to :class:`~hqp_tpu.qp.kkt_partitioned.PartitionedKKT` --
    the stage-parallel elimination of the same system, which performs the
    Riccati role the TPU-native way (measured 126x faster at K=1000; a
    user selecting the reference's flagship backend name must get the
    fast path, not the sequential verification scan).
    """

    def __init__(self, reg: float = 0.0, refine_eps: float = 1e-10,
                 refine_rounds: int = 5):
        self.reg = reg
        self.refine_eps = refine_eps
        self.refine_rounds = refine_rounds

    # value-based identity for the jit trace cache (immutable config; see
    # PartitionedKKT._config for rationale)
    def _config(self):
        return (type(self), self.reg, self.refine_eps, self.refine_rounds)

    def __hash__(self):
        return hash(self._config())

    def __eq__(self, other):
        return isinstance(other, RiccatiKKT) and \
            self._config() == other._config()

    def validate(self, qp):
        """Structural check (host-side, concrete qp only): the sequential
        recursion cannot represent structurally absent states at stages
        k >= 1 (see class docstring).  Pinned states belong as lb == ub
        fixed variables (hqp_tpu.docp emits them that way), which this
        backend handles via penalty + refinement."""
        if not isinstance(qp, StageQP):
            return
        import numpy as np
        try:
            vm = np.asarray(qp.var_mask)
        except Exception:
            return  # traced (e.g. vmapped batch): caller asserts structure
        if not vm[1:, : qp.nx].all():
            raise ValueError(
                "RiccatiKKT (LQDOCP): structurally absent states at stage "
                "k >= 1 cannot be represented by the sequential Riccati "
                "recursion; pin them via lb == ub (exact equality rows) or "
                "use the partitioned backend (qp_mat_solver SpSC)")

    def factor(self, qp: StageQP, z, w, mask):
        nx, nu, nv = qp.nx, qp.nu, qp.nv
        # fixed variables + general stage equalities: penalty blocks;
        # exactness restored by iterative refinement against the true
        # KKT system (stage_eq_penalty docstring)
        H = _stage_hessians(qp, z, w, mask) + stage_eq_penalty(qp)
        eyeu = self.reg * jnp.eye(nu)
        # terminal stage: eliminate the (padded) u-block by Schur complement
        HK = H[-1]
        LuuK = sl.chol(HK[nx:, nx:] + eyeu)
        KgainK = sl.cho_solve(LuuK, HK[nx:, :nx])
        PK = HK[:nx, :nx] - HK[:nx, nx:] @ KgainK
        PK = 0.5 * (PK + PK.T)

        def bwd(P, inp):
            Hk, Ak = inp
            PA = P @ Ak                                   # [nx, nv]
            G = Hk + Ak.T @ PA
            Gxx = G[:nx, :nx]
            Gux = G[nx:, :nx]
            Guu = G[nx:, nx:] + eyeu
            Luu = sl.chol(Guu)
            Kg = sl.cho_solve(Luu, Gux)                   # [nu, nx]
            Pk = Gxx - Gux.T @ Kg
            Pk = 0.5 * (Pk + Pk.T)
            return Pk, (Luu, Gux, Kg, P)

        Am = qp.A_masked()
        P0, (Luu_r, Gux_r, Kg_r, Pnext_r) = jax.lax.scan(
            bwd, PK, (H[:-1][::-1], Am[::-1])
        )
        Luu, Gux, Kg = Luu_r[::-1], Gux_r[::-1], Kg_r[::-1]
        P = jnp.concatenate([P0[None], Pnext_r[::-1]], axis=0)  # P_0..P_K
        LP0 = sl.chol(P0)
        return RiccatiFactors(Luu=Luu, Gux=Gux, Kgain=Kg, P=P, LP0=LP0,
                              LuuK=LuuK, KgainK=KgainK)

    def solve_reduced(self, fac: RiccatiFactors, qp: StageQP, g, r2):
        """Solve  H dx - A' dy = -g,  A_k v_k - dx_{k+1} = r2_k."""
        nx = qp.nx
        gx, gu = g[:, :nx], g[:, nx:]
        Am = qp.A_masked()
        Ax, Au = Am[:, :, :nx], Am[:, :, nx:]
        xcm = qp.xcoupling_mask().astype(g.dtype)   # [K, nx]

        # backward sweep for the linear cost-to-go p_k and feedforward bu_k
        def bwd(p, inp):
            Luu, Gux, Pn, Axk, Auk, r2k, gxk, guk = inp
            t = p - Pn @ r2k
            bu = sl.cho_solve(Luu, -(guk + Auk.T @ t))
            pk = gxk + Axk.T @ t + Gux.T @ bu
            return pk, (bu, p)

        pK = gx[-1] - fac.KgainK.T @ gu[-1]
        p0, (bu_r, pnext_r) = jax.lax.scan(
            bwd, pK,
            (fac.Luu[::-1], fac.Gux[::-1], fac.P[1:][::-1],
             Ax[::-1], Au[::-1], r2[::-1], gx[:-1][::-1], gu[:-1][::-1]),
        )
        bu, pnext = bu_r[::-1], pnext_r[::-1]

        dx0 = sl.cho_solve(fac.LP0, -p0)

        # forward sweep: controls, states, dynamics multipliers.
        # The recursion's costate is the negative of the saddle system's dy
        # ( -H dx + A' dy = r1_eff ), hence the sign flip on y.
        def fwd(dxk, inp):
            Kg, buk, Pn, pn, Ak, r2k, xmk = inp
            du = buk - Kg @ dxk
            v = jnp.concatenate([dxk, du])
            dxn = (Ak @ v - r2k) * xmk
            y = -(Pn @ dxn + pn)
            return dxn, (v, y)

        dxK, (v, dy) = jax.lax.scan(
            fwd, dx0, (fac.Kgain, bu, fac.P[1:], pnext, Am, r2, xcm)
        )
        duK = -(sl.cho_solve(fac.LuuK, gu[-1]) + fac.KgainK @ dxK)
        vK = jnp.concatenate([dxK, duK])[None]
        dx = jnp.concatenate([v, vK], axis=0)
        return dx, dy

    def solve(self, fac, qp: StageQP, z, w, mask, r1, r2, r3, r4):
        def base(a1, a2, a3, a4):
            return stage_base_solve(
                lambda g, r2d: self.solve_reduced(fac, qp, g, r2d),
                qp, z, w, mask, a1, a2, a3, a4)

        sol = base(r1, r2, r3, r4)
        if self.refine_rounds > 0:
            sol = refine(base, qp, z, w, mask, r1, r2, r3, r4, sol,
                         eps=self.refine_eps, max_rounds=self.refine_rounds)
        return sol


#: sequential parity oracle (see class docstring); the reference's
#: flagship name ``LQDOCP`` resolves to PartitionedKKT (kkt_partitioned).
modules.register("qp_mat_solver", "Riccati")(RiccatiKKT)
RiccatiOracle = RiccatiKKT


# ---------------------------------------------------------------------------
# dense backends
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseFactors:
    lu: jnp.ndarray
    piv: jnp.ndarray


def lu_dtype():
    """LU factorization dtype: TPU implements LuDecomposition only for f32
    (measured on v5e); accuracy is recovered by f64 iterative refinement
    (the reference's own layering, hqp/Hqp_IpMatrix.C)."""
    return jnp.float32 if jax.default_backend() == "tpu" else jnp.float64


def _saddle_factor(H, A, eq_mask):
    """LU-factor [[-H, A'], [A, 0]] with masked eq rows replaced by identity."""
    n, me = H.shape[0], A.shape[0]
    Am = A * eq_mask[:, None]
    Z = jnp.diag(jnp.where(eq_mask, 0.0, 1.0))
    J = jnp.block([[-H, Am.T], [Am, Z]])
    lu, piv = lu_factor(J.astype(lu_dtype()))
    return DenseFactors(lu=lu, piv=piv)


def _saddle_solve(fac: DenseFactors, n, r1_eff, r2):
    rhs = jnp.concatenate([r1_eff, r2])
    sol = lu_solve((fac.lu, fac.piv), rhs.astype(fac.lu.dtype))
    sol = sol.astype(rhs.dtype)
    return sol[:n], sol[n:]


class DenseKKT:
    """Dense reduced-system backend for :class:`DenseQP`.

    Role of the reference default Hqp_IpRedSpBKP (hqp/Hqp_IpRedSpBKP.C:
    eliminate (z,w), factor J = [-(Q + C'W^-1Z C), A'; A, 0]); here a dense
    LU replaces sparse RCM + BKP, appropriate for moderate n on the MXU.
    """

    def __init__(self, refine_eps: float = 1e-10, refine_rounds: int = 5):
        self.refine_eps = refine_eps
        self.refine_rounds = refine_rounds

    def _config(self):
        return (type(self), self.refine_eps, self.refine_rounds)

    def __hash__(self):
        return hash(self._config())

    def __eq__(self, other):
        return isinstance(other, DenseKKT) and \
            self._config() == other._config()

    def factor(self, qp: DenseQP, z, w, mask):
        sig = barrier_ratios(z, w, mask)
        H = qp.Q + (qp.C.T * sig.g) @ qp.C
        return _saddle_factor(H, qp.A, qp.eq_mask_)

    def solve(self, fac, qp: DenseQP, z, w, mask, r1, r2, r3, r4):
        def base(a1, a2, a3, a4):
            g = reduce_r1(qp, z, w, mask, a1, a3, a4)
            # saddle system is [-H, A'; A, 0][dx; dy] = [g; r2]
            r2m = jnp.where(qp.eq_mask_, a2, 0.0)
            dx, dy = _saddle_solve(fac, qp.n, g, r2m)
            dz, dw = recover_zw(qp, z, w, mask, dx, a3, a4)
            return dx, dy, dz, dw

        sol = base(r1, r2, r3, r4)
        if self.refine_rounds > 0:
            sol = refine(base, qp, z, w, mask, r1, r2, r3, r4, sol,
                         eps=self.refine_eps, max_rounds=self.refine_rounds)
        return sol


modules.register("qp_mat_solver", "RedSpBKP")(DenseKKT)


class FullStageKKT:
    """Verification backend: lowers a StageQP to one dense saddle system."""

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)

    @staticmethod
    def dense_blocks(qp: StageQP, Hb):
        """Vectorized lowering of stage blocks to one dense (H, A)."""
        import numpy as np
        K1, nv = Hb.shape[0], Hb.shape[1]
        K, nx = qp.K, qp.nx
        n = K1 * nv
        # block-diagonal H via a single scatter
        base = np.arange(K1)[:, None, None] * nv
        shape3 = (K1, nv, nv)
        ri = np.broadcast_to(base + np.arange(nv)[None, :, None], shape3)
        ci = np.broadcast_to(base + np.arange(nv)[None, None, :], shape3)
        H = jnp.zeros((n, n)).at[ri.ravel(), ci.ravel()].set(Hb.ravel())
        # dynamics rows [A_k | -I] via two scatters
        rb = np.arange(K)[:, None, None] * nx
        ar = rb + np.arange(nx)[None, :, None] + np.zeros((1, 1, nv), int)
        ac = (np.arange(K)[:, None, None] * nv
              + np.arange(nv)[None, None, :] + np.zeros((1, nx, 1), int))
        A = jnp.zeros((K * nx, n)).at[ar.ravel(), ac.ravel()].set(
            qp.A_masked().ravel())
        ir = (rb + np.arange(nx)[None, :, None])[:, :, 0]
        ic = (np.arange(1, K + 1)[:, None] * nv + np.arange(nx)[None, :])
        A = A.at[ir.ravel(), ic.ravel()].add(
            -qp.xcoupling_mask().astype(A.dtype).ravel())
        return H, A

    @staticmethod
    def _gen_eq_rows(qp: StageQP):
        """Block-diagonal lowering of the per-stage general equality rows
        E [K1, meq, nv] into dense rows [K1*meq, n] + their mask."""
        import numpy as np
        K1, meq, nv = qp.E.shape
        n = K1 * nv
        rb = np.arange(K1)[:, None, None] * meq
        rr = np.broadcast_to(rb + np.arange(meq)[None, :, None],
                             (K1, meq, nv))
        cc = np.broadcast_to(
            np.arange(K1)[:, None, None] * nv
            + np.arange(nv)[None, None, :], (K1, meq, nv))
        Em = qp.E * qp.eqg_mask[:, :, None]
        G = jnp.zeros((K1 * meq, n)).at[rr.ravel(), cc.ravel()].set(
            Em.ravel())
        # rows with an identically zero Jacobian (e.g. c = x'x linearized
        # at x = 0) would make the hard saddle system singular; the
        # penalty backends drop them naturally (E'E = 0), so the oracle
        # deactivates them the same way (their dy stays 0)
        live = jnp.sum(jnp.abs(Em), axis=2) > 0.0
        return G, (qp.eqg_mask & live).reshape(-1)

    def factor(self, qp: StageQP, z, w, mask):
        Hb = _stage_hessians(qp, z, w, mask)      # [K1, nv, nv]
        H, A = self.dense_blocks(qp, Hb)
        n = H.shape[0]
        # fixed-variable equality rows: identity rows masked by fixed_mask
        fm = qp.fixed_mask().reshape(-1)
        rows = [A, jnp.eye(n)]
        masks = [jnp.ones(A.shape[0], dtype=bool), fm]
        if qp.has_gen_eq():
            G, gmask = self._gen_eq_rows(qp)
            rows.append(G)
            masks.append(gmask)
        A_all = jnp.concatenate(rows, axis=0)
        emask = jnp.concatenate(masks)
        return _saddle_factor(H, A_all, emask)

    def solve(self, fac, qp: StageQP, z, w, mask, r1, r2, r3, r4):
        g = reduce_r1(qp, z, w, mask, r1, r3, r4)
        n = (qp.K + 1) * qp.nv
        fm = qp.fixed_mask().reshape(-1)
        parts = [r2["dyn"].reshape(-1),
                 jnp.where(fm, r2["fix"].reshape(-1), 0.0)]
        if qp.has_gen_eq():
            _, gmask = self._gen_eq_rows(qp)
            parts.append(jnp.where(gmask, r2["gen"].reshape(-1), 0.0))
        r2f = jnp.concatenate(parts)
        dxf, dyf = _saddle_solve(fac, n, g.reshape(-1), r2f)
        dx = dxf.reshape(qp.K + 1, qp.nv)
        ndyn = qp.K * qp.nx
        nfix = n
        dy = {"dyn": dyf[:ndyn].reshape(qp.K, qp.nx),
              "fix": jnp.where(fm, dyf[ndyn:ndyn + nfix],
                               0.0).reshape(qp.K + 1, qp.nv)}
        if qp.has_gen_eq():
            dy["gen"] = jnp.where(
                gmask, dyf[ndyn + nfix:], 0.0).reshape(qp.K + 1, qp.meq)
        dz, dw = recover_zw(qp, z, w, mask, dx, r3, r4)
        return dx, dy, dz, dw


modules.register("qp_mat_solver", "FullKKT")(FullStageKKT)


# The reference name `SpBKP` (Hqp_IpSpBKP: full 3x3 KKT via the sparse
# Bunch-Kaufman factorization) is registered by qp/kkt_sparse_host.py,
# which binds the native spBKP-role kernel; FullStageKKT stays the dense
# stage-structured full-KKT oracle under `FullKKT`.
modules.register("qp_mat_solver", "DenseKKT")(DenseKKT)
