"""Which constraint-row treatment rescues the 9 failing scenario QPs?

A: drop the general path rows entirely (confirms the near-duplicate-row
   diagnosis if the remaining QP solves);
B: jitter the general-row bounds by a tiny stage-dependent offset
   (breaks exact degeneracy without changing the active geometry);
C: de-duplicate: deactivate the general row where it is nearly parallel
   to an active box row, tightening the box bound to subsume it.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import dataclasses
import jax, jax.numpy as jnp, numpy as np
import hqp_tpu
from hqp_tpu.models.did import PrgDID
from hqp_tpu.parallel.scenarios import batched_qp
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra, RESULT_STRINGS

prg = PrgDID(kmax=60)
v0 = prg.setup()
vb = batched_qp(prg, v0, 256, scale=1e-3)
Q = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
BAD = [22, 34, 53, 72, 122, 144, 177, 182, 251]

slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla"), eps=1e-9)


def solve(qp):
    st = slv.solve(qp, slv.init_state(qp))
    return int(st.result), int(st.iter), float(st.test)


def variant(qp, which):
    if which == "raw":
        return qp
    if which == "dropgen":
        return dataclasses.replace(qp, d_up=jnp.full_like(qp.d_up, jnp.inf))
    if which == "jitter":
        k = jnp.arange(qp.d_up.shape[0], dtype=jnp.float64)[:, None]
        return dataclasses.replace(
            qp, d_up=jnp.where(jnp.isfinite(qp.d_up),
                               qp.d_up + 1e-7 * (k + 1.0), qp.d_up))
    if which == "tighten":
        # near-parallel general row vs box row on x1: deactivate the
        # general row, tighten the box ub to min(ub, d_up) (DID: the
        # general row x1 + dt/2 x0 <= .01 vs box x1 <= .01)
        ub = qp.ub.at[:, 1].set(jnp.minimum(qp.ub[:, 1],
                                            jnp.where(jnp.isfinite(
                                                qp.d_up[:, 0]),
                                                qp.d_up[:, 0], jnp.inf)))
        return dataclasses.replace(
            qp, ub=ub, d_up=jnp.full_like(qp.d_up, jnp.inf))
    raise KeyError(which)


for which in ("raw", "dropgen", "jitter", "tighten"):
    wins = 0
    rows = []
    for idx in BAD:
        _, qp = prg.make_qp(vb[idx], Q=Q)
        r, it, phi = solve(variant(qp, which))
        wins += r == 0
        rows.append(f"{idx}:{RESULT_STRINGS[r][:4]}/{it}")
    print(f"{which:8s} {wins}/9   " + "  ".join(rows), flush=True)
