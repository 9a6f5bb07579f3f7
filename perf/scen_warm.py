"""Warm-start rescues for the 9 failing scenario QPs.

A: hot-start every scenario from the NOMINAL (unperturbed) instance's
   (z, w) snapshot -- the reference's own MPC hot-start pattern
   (Hqp_IpsMehrotra.C:330-352) applied batch-wide.
B: two-phase: solve the QP with the general path rows dropped (9/9
   optimal), then hot-start the FULL QP from the relaxed solution.
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
slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla"), eps=1e-9)

# nominal solve + snapshot
_, qp0 = prg.make_qp(v0, Q=Q)
st0 = slv.solve(qp0, slv.init_state(qp0))
print("nominal:", RESULT_STRINGS[int(st0.result)], int(st0.iter), flush=True)

for tag in ("A_nominal_hot", "B_twophase"):
    wins = 0
    for idx in BAD:
        _, qp = prg.make_qp(vb[idx], Q=Q)
        if tag == "A_nominal_hot":
            seed = st0
        else:
            qp_rel = dataclasses.replace(
                qp, d_up=jnp.full_like(qp.d_up, jnp.inf))
            seed = slv.solve(qp_rel, slv.init_state(qp_rel))
        st = dataclasses.replace(slv.init_state(qp),
                                 z_hot=seed.z, w_hot=seed.w)
        st = slv.solve(qp, st, hot=True)
        r, it = int(st.result), int(st.iter)
        wins += r == 0
        print(f"  {tag} {idx}: {RESULT_STRINGS[r]} {it}", flush=True)
    print(f"{tag}: {wins}/9", flush=True)
