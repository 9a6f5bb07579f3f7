"""A/B the did1000 end-to-end SQP under backend/solver knob variants."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import hqp_tpu  # noqa: F401
from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT

K = int(os.environ.get("K", "1000"))

#: (backend kwargs, solver kwargs)
VARIANTS = {
    "rr2rc2": (dict(refine_rounds=2), {}),
    "rr2rc2_cheap": (dict(refine_rounds=2), dict(cheap_predictor=True)),
    "rr4rc2_cheap": (dict(), dict(cheap_predictor=True)),
    "rr1rc2_cheap": (dict(refine_rounds=1), dict(cheap_predictor=True)),
}

for name, (bkw, skw) in VARIANTS.items():
    def once():
        prg = PrgDID(kmax=K)
        s = SqpPowell(prg, max_iters=50,
                      qp_solver=ip.Mehrotra(eps=1e-9, **skw),
                      kkt_backend=PartitionedKKT(L=20, **bkw))
        s.init()
        s.simulate()
        r = s.solve()
        return s, r
    try:
        s, r = once()     # warm
        t0 = time.perf_counter()
        s, r = once()
        dt = time.perf_counter() - t0
        print(f"{name:14s} {r:10s} obj {float(s.f):.7f} qp_iters "
              f"{s.qp_iters_total:3d} {dt*1e3:7.1f} ms  "
              f"{s.qp_iters_total/dt:6.1f} it/s", flush=True)
    except Exception as e:
        print(f"{name:14s} ERROR {type(e).__name__}: {e}", flush=True)
