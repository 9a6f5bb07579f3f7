"""Per-iteration trace of one failing scenario QP."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax, jax.numpy as jnp, numpy as np
import hqp_tpu
import hqp_tpu.utils.masked as mk
from hqp_tpu.models.did import PrgDID
from hqp_tpu.parallel.scenarios import batched_qp
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra, RESULT_STRINGS

IDX = int(sys.argv[1]) if len(sys.argv) > 1 else 22
prg = PrgDID(kmax=60)
v0 = prg.setup()
vb = batched_qp(prg, v0, 256, scale=1e-3)
v = vb[IDX]
Q = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
_, qp = prg.make_qp(v, Q=Q)
slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla"),
               eps=1e-7, jit=False)
st = slv.cold_start(qp, slv.init_state(qp))
print("after cold: finite x", bool(jnp.isfinite(st.x).all()), flush=True)
for i in range(40):
    st = slv.step(qp, st)
    mask = qp.ineq_mask()
    m = mk.count(mask)
    mu = float(mk.inner(st.z, st.w, mask) / m)
    print(f"{i:2d} {RESULT_STRINGS[int(st.result)]:10s} phi {float(st.test):.3e} "
          f"mu {mu:.3e} alpha {float(st.alpha):.3f} "
          f"|x| {float(mk.norm_inf(st.x)):.3e}", flush=True)
    if int(st.result) not in (5,):
        break
