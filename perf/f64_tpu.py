"""A/B: f64 device factorization (factor_dtype="f64", pure-jnp unrolled
interior LU + f64 CR master, TPU f64 emulation) vs the default f32
factor + mixed-precision refinement, on the did1000 bench KKT.

Rationale: the round-5 IP-loop profile showed the remaining in-loop cost
is LOAD-BEARING refinement of the f32 factorization (PERF.md section 1);
TPU f64 emulation is latency-equivalent at these kernel sizes (98x98
matmul: 24 us f64 vs 37 us f32, measured), so an f64 factor could remove
the refine/inner/correction machinery outright IF it compiles and runs
at comparable per-iteration cost.

Run on the TPU:  python perf/f64_tpu.py
"""

import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import json

import jax
import jax.numpy as jnp

import bench
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT


def main():
    prg, qp, mask, ones, rhs = bench.build_kkt(1000)
    out = {}
    for tag, be in [
        ("f32_default", PartitionedKKT(L=10)),
        ("f64_rc2", PartitionedKKT(L=10, factor_dtype="f64")),
        ("f64_rc0", PartitionedKKT(L=10, factor_dtype="f64",
                                   reg_corr_rounds=0)),
        ("f64_rc0_rr0", PartitionedKKT(L=10, factor_dtype="f64",
                                       reg_corr_rounds=0,
                                       refine_rounds=0)),
    ]:
        try:
            ms, sol = bench.time_backend(be, qp, mask, ones, rhs, links=8)
            res = bench.residual_of(qp, mask, ones, rhs, sol)
            out[tag] = {"chained_ms": round(ms, 3), "residual": res}
        except Exception as e:
            out[tag] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(tag, out[tag], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
