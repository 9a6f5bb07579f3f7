"""Second A/B wave: refine depth 1 and inner-round reductions (TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import hqp_tpu  # noqa: F401
from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.qp import kkt_partitioned as kp
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT

K = int(os.environ.get("K", "1000"))

#: (backend kwargs, INNER_ROUNDS override).  refine_eps nudges bust the
#: trace cache across INNER_ROUNDS settings (a module-global the value-
#: hash cannot see).
VARIANTS = {
    "rr1rc2": (dict(refine_rounds=1), None),
    "rr2_inner4": (dict(refine_rounds=2,
                        refine_eps=3e-7 * (1 + 1e-9)), 4),
    "rr2_inner3": (dict(refine_rounds=2,
                        refine_eps=3e-7 * (1 + 2e-9)), 3),
}

for name, (bkw, inner) in VARIANTS.items():
    kp.INNER_ROUNDS = inner
    def once():
        prg = PrgDID(kmax=K)
        s = SqpPowell(prg, max_iters=50,
                      qp_solver=ip.Mehrotra(eps=1e-9),
                      kkt_backend=PartitionedKKT(L=20, **bkw))
        s.init()
        s.simulate()
        r = s.solve()
        return s, r
    try:
        s, r = once()
        t0 = time.perf_counter()
        s, r = once()
        dt = time.perf_counter() - t0
        print(f"{name:12s} {r:10s} obj {float(s.f):.7f} qp_iters "
              f"{s.qp_iters_total:3d} {dt*1e3:7.1f} ms  "
              f"{s.qp_iters_total/dt:6.1f} it/s", flush=True)
    except Exception as e:
        print(f"{name:12s} ERROR {type(e).__name__}: {e}", flush=True)
kp.INNER_ROUNDS = None
