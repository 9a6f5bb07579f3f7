"""In-loop A/B: full DID-1000 SQP with the f64 device factorization
(factor_dtype="f64") vs the default f32 mixed-precision path.

The chained factor+solve microbench is ~2x slower in f64 (10.9 vs 5.5
ms, perf/f64_tpu.py) but the f32 IN-LOOP step pays ~3x its kernel in
load-bearing refinement (PERF.md section 1); the f64 factor is
near-exact (9e-13), so refine exits at entry and the inner rounds drop
to 1.  This measures which wins end to end.

Run on the TPU:  python perf/f64_sqp.py [rc]
"""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import json

from hqp_tpu.models.did import PrgDID
from hqp_tpu.sqp.powell import SqpPowell
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT


def run(tag, backend):
    def once():
        prg = PrgDID(kmax=1000)
        s = SqpPowell(prg, max_iters=50, kkt_backend=backend)
        s.init()
        s.simulate()
        r = s.solve()
        return s, r

    s, r = once()           # warm compiles
    t0 = time.perf_counter()
    s, r = once()
    dt = time.perf_counter() - t0
    out = {"result": r, "solve_ms": round(dt * 1e3, 1),
           "sqp_iters": s.iter, "qp_iters_total": s.qp_iters_total,
           "obj": float(s.f),
           "ip_iters_per_s": round(s.qp_iters_total / dt, 1)}
    print(tag, json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    rc = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run(f"f64_rc{rc}",
        PartitionedKKT(L=10, factor_dtype="f64", reg_corr_rounds=rc))
