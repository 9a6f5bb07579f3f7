"""Heuristic matrix on the failing scenario QPs."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")
import jax, jax.numpy as jnp
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

def run(tag, **kw):
    wins = 0
    for idx in BAD:
        _, qp = prg.make_qp(vb[idx], Q=Q)
        slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla"),
                       jit=False, **kw)
        st = slv.solve(qp, slv.init_state(qp))
        ok = int(st.result) == 0
        wins += ok
        print(f"  {tag} scen {idx}: {RESULT_STRINGS[int(st.result)]} "
              f"iters {int(st.iter)} phi {float(st.test):.2e}", flush=True)
    print(f"{tag}: {wins}/{len(BAD)}", flush=True)

run("gondzio2", eps=1e-7, gondzio_correctors=2)
run("init1", eps=1e-7, init_method=1)
run("terlaky", eps=1e-7, mod_terlaky=True)
run("maxit100", eps=1e-7, max_iters=100)
