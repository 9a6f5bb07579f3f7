"""QP presolve: merge near-parallel general rows into box bounds.

The robustness class this addresses (verdict r3/r4, BASELINE config 5):
a general path row that is an epsilon-rotated copy of a variable bound --
the DID's discretization-shifted path constraint

    x1 + (dt/2) x0 <= 0.01     vs the box row    x1 <= 0.01

(hqp_docp/Prg_DID.C:55-58 + the with_cns extra constraint).  On the
boundary arc BOTH rows are active while their normals differ by
O(dt/2): the active Jacobian loses rank along a whole arc of stages,
the dual face is unbounded, and a pure path-following method pinches
(measured: z_gu -> 5.7e7, w_gu -> 6.8e-13 with mu stalled at 4e-3 and
|x| -> 58; every Mehrotra/Franke variant, warm start, Gondzio
correctors, and primal-proximal retries fail on the same 9/256
perturbed instances, while deleting OR merging the row solves all 9 --
see perf/scen_dedup.py).  The reference's barrier solver sidesteps the
class through its active-set split (hqp/Hqp_IpLQDOCP.C:814-819).

``merge_parallel_rows`` detects rows whose off-axis mass is below
``tau`` relative to the dominant coefficient and folds them into the
dominant variable's box bound, deactivating the general row.  This is
EXACT for true duplicate rows (tau -> 0) and otherwise changes the
feasible set by at most ``tau * |c_i| * max_j |v_j|`` per merged row --
callers opt in with an explicit tolerance and can measure the residual
violation of the original rows at the solution
(:func:`original_row_violation`).  jit/vmap-safe (static shapes; pure
jnp).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hqp_tpu.qp.program import StageQP


def merge_parallel_rows(qp: StageQP, tau: float = 0.02) -> StageQP:
    """Fold tau-parallel general rows into box bounds (see module doc)."""
    if qp.mc == 0:
        return qp
    C = qp.C
    absC = jnp.abs(C)
    imax = jnp.argmax(absC, axis=2)                    # [K1, mc]
    cmax = jnp.take_along_axis(absC, imax[..., None], 2)[..., 0]
    rest = jnp.sum(absC, axis=2) - cmax
    par = (cmax > 0.0) & (rest <= tau * cmax) & qp.con_mask

    lb, ub = qp.lb, qp.ub
    d_lo, d_up = qp.d_lo, qp.d_up
    for e in range(qp.mc):
        i = imax[:, e]                                 # [K1]
        hot = jax.nn.one_hot(i, qp.nv, dtype=bool)     # [K1, nv]
        ci = jnp.take_along_axis(C[:, e, :], i[:, None], 1)[:, 0]
        pe = par[:, e]
        csafe = jnp.where(ci == 0.0, 1.0, ci)

        up = qp.d_up[:, e]
        fin_up = jnp.isfinite(up) & pe
        vup = up / csafe
        # ci > 0: v_i <= d/ci tightens ub; ci < 0: v_i >= d/ci tightens lb
        ub = jnp.where(hot & (fin_up & (ci > 0.0))[:, None],
                       jnp.minimum(ub, vup[:, None]), ub)
        lb = jnp.where(hot & (fin_up & (ci < 0.0))[:, None],
                       jnp.maximum(lb, vup[:, None]), lb)

        lo = qp.d_lo[:, e]
        fin_lo = jnp.isfinite(lo) & pe
        vlo = lo / csafe
        lb = jnp.where(hot & (fin_lo & (ci > 0.0))[:, None],
                       jnp.maximum(lb, vlo[:, None]), lb)
        ub = jnp.where(hot & (fin_lo & (ci < 0.0))[:, None],
                       jnp.minimum(ub, vlo[:, None]), ub)

        d_up = d_up.at[:, e].set(jnp.where(pe, jnp.inf, d_up[:, e]))
        d_lo = d_lo.at[:, e].set(jnp.where(pe, -jnp.inf, d_lo[:, e]))

    return dataclasses.replace(qp, lb=lb, ub=ub, d_lo=d_lo, d_up=d_up)


def original_row_violation(qp: StageQP, x) -> jnp.ndarray:
    """Max violation of the ORIGINAL general rows at ``x`` (the honesty
    metric reported next to presolved solves)."""
    if qp.mc == 0:
        return jnp.asarray(0.0)
    Cv = jnp.einsum("kij,kj->ki", qp.C, x)
    up = jnp.where(jnp.isfinite(qp.d_up) & qp.con_mask,
                   Cv - qp.d_up, -jnp.inf)
    lo = jnp.where(jnp.isfinite(qp.d_lo) & qp.con_mask,
                   qp.d_lo - Cv, -jnp.inf)
    return jnp.maximum(jnp.maximum(jnp.max(up), jnp.max(lo)), 0.0)
