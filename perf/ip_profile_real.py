"""Per-phase cost of the IP step on the REAL did1000 SQP QP.

Uses the exact QP the SQP layer solves (PrgDID setup + simulate +
qp_update with the BFGS-initialized Q), chains real IP steps from the
real cold start, and decomposes by backend knobs.  Reconciles the
chained-step numbers with the in-loop it/s of bench did1000_sqp.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import hqp_tpu  # noqa: F401
import hqp_tpu.utils.masked as mk
from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra

K = int(os.environ.get("K", "1000"))
N = 6
REPS = int(os.environ.get("REPS", "10"))

prg = PrgDID(kmax=K)
s = SqpPowell(prg, max_iters=50)
s.init()
s.simulate()
s.qp_update()
qp = s.qp
print("real qp ready", flush=True)


def time_fn(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def chain_steps(slv, n=N):
    st0 = jax.jit(lambda q: slv._cold_start(q, slv.init_state(q)))(qp)
    jax.block_until_ready(st0.x)

    def f(st):
        def body(st, _):
            return slv.step(qp, st), None
        st, _ = jax.lax.scan(body, st, None, length=n)
        return st

    st = jax.jit(f)(st0)
    it = int(st.iter)
    ms = time_fn(jax.jit(f), st0) * 1e3 / n
    return ms, it


VARIANTS = {
    "rr4rc2(default)": PartitionedKKT(L=20),
    "rr2rc2": PartitionedKKT(L=20, refine_rounds=2),
    "rr1rc2": PartitionedKKT(L=20, refine_rounds=1),
    "rr0rc2": PartitionedKKT(L=20, refine_rounds=0),
    "rr2rc1": PartitionedKKT(L=20, refine_rounds=2, reg_corr_rounds=1),
    "rr2rc3": PartitionedKKT(L=20, refine_rounds=2, reg_corr_rounds=3),
}
for name, be in VARIANTS.items():
    slv = Mehrotra(backend=be, eps=1e-9)
    ms, it = chain_steps(slv)
    print(f"step[{name:16s}] {ms:7.2f} ms/step (iter after chain {it})",
          flush=True)

# full solve_device to termination on the real qp
for name in ("rr4rc2(default)", "rr2rc2", "rr2rc3"):
    be = VARIANTS[name]
    slv = Mehrotra(backend=be, eps=1e-9)
    fsolve = jax.jit(lambda q: slv.solve_device(q, slv.init_state(q)))
    st = fsolve(qp)
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    st = fsolve(qp)
    jax.block_until_ready(st.x)
    dt = time.perf_counter() - t0
    it = int(st.iter)
    print(f"solve[{name:16s}] {dt*1e3:8.1f} ms iters {it:3d} "
          f"({dt*1e3/max(it,1):6.2f} ms/iter) result {int(st.result)} "
          f"phi {float(st.test):.2e}", flush=True)
