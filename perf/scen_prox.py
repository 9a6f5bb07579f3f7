"""Proximal-retry experiment on the 9 failing scenario QPs.

Hypothesis: the failures are primal degeneracy (near-parallel active
rows: the DID box bound x1 <= 0.01 vs the general path row
x1 + dt/2 x0 <= 0.01) letting dx blow along a near-null direction of
the active set (observed: |x| -> 58, alpha -> 0, then the blow-up
abort).  A proximal term rho/2 ||x - xbar||^2 removes the null
direction; re-centering xbar and re-solving (proximal point iteration)
converges to the true solution while each subproblem is nondegenerate.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import dataclasses
import jax, jax.numpy as jnp
import hqp_tpu
import hqp_tpu.utils.masked as mk
from hqp_tpu.models.did import PrgDID
from hqp_tpu.parallel.scenarios import batched_qp
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra, RESULT_STRINGS

prg = PrgDID(kmax=60)
v0 = prg.setup()
vb = batched_qp(prg, v0, 256, scale=1e-3)
Q = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
BAD = [22, 34, 53, 72, 122, 144, 177, 182, 251]

RHO = float(os.environ.get("RHO", "1e-4"))
PASSES = int(os.environ.get("PASSES", "3"))


def prox_qp(qp, rho, xbar):
    eye = jnp.eye(qp.nv)
    return dataclasses.replace(
        qp, Q=qp.Q + rho * eye, c=qp.c - rho * xbar)


def true_phi(qp, st):
    """phi of the current iterate measured on the TRUE (unproximal) QP."""
    mask = qp.ineq_mask()
    m = jnp.maximum(mk.count(mask), 1.0)
    x, y, z, w = st.x, st.y, st.z, st.w
    Qx = qp.matvec_Q(x)
    gap = (mk.inner(x, Qx + qp.c)
           + mk.inner(y, qp.eq_offsets(), qp.eq_mask())
           + mk.inner(z, qp.ineq_offsets(), mask))
    r1 = jnp.where(qp.x_mask(),
                   Qx + qp.c - qp.matvec_eqT(y)
                   - qp.matvec_ineqT(mk.where(mask, z, 0.0)), 0.0)
    r2 = mk.scale(-1.0, qp.eval_eq(x))
    r3 = mk.where(mask, mk.sub(w, qp.eval_ineq(x)), 0.0)
    nr = jnp.maximum(
        jnp.maximum(mk.norm_inf(r1), mk.norm_inf(r2, qp.eq_mask())),
        mk.norm_inf(r3, mask))
    return (nr + jnp.abs(gap)) / qp.norm_data()


wins = 0
for idx in BAD:
    _, qp = prg.make_qp(vb[idx], Q=Q)
    slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla"),
                   eps=1e-9)
    st = slv.solve(qp, slv.init_state(qp))
    tag = RESULT_STRINGS[int(st.result)]
    if int(st.result) == 0:
        wins += 1
        print(f"scen {idx}: raw optimal"); continue
    # proximal retries, re-centering each pass
    xbar = jnp.zeros_like(st.x)
    ok = False
    for p in range(PASSES):
        qp2 = prox_qp(qp, RHO, xbar)
        st = slv.solve(qp2, slv.init_state(qp2))
        phi_t = float(true_phi(qp, st))
        print(f"  scen {idx} pass {p}: {RESULT_STRINGS[int(st.result)]} "
              f"iters {int(st.iter)} phi_prox {float(st.test):.2e} "
              f"phi_true {phi_t:.2e}", flush=True)
        xbar = st.x
        if int(st.result) == 0 and phi_t < 1e-7:
            ok = True
            break
    wins += ok
    print(f"scen {idx}: raw {tag} -> prox {'OK' if ok else 'FAIL'}",
          flush=True)
print(f"total: {wins}/{len(BAD)} (rho={RHO}, passes={PASSES})")
