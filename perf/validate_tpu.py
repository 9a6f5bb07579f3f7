"""End-to-end TPU validation of the KKT defaults: DID-60 + DID-1000
SQP solves (the late-barrier acid test) + timing."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import hqp_tpu  # noqa: F401
from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell


def run(kmax, simulate=True):
    def once():
        prg = PrgDID(kmax=kmax)
        s = SqpPowell(prg, max_iters=50)
        s.init()
        if simulate:
            s.simulate()
        r = s.solve()
        return s, r

    s, r = once()
    t0 = time.perf_counter()
    s, r = once()
    dt = time.perf_counter() - t0
    print(f"DID-{kmax}: {r} obj {float(s.f):.7f} sqp {s.iter} "
          f"qp_iters {s.qp_iters_total} warm {dt:.2f}s "
          f"ip_iters_per_s {s.qp_iters_total / dt:.1f}", flush=True)


if __name__ == "__main__":
    run(60, simulate=False)
    run(1000)
