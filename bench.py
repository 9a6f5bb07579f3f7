"""Benchmark: KKT factorize+solve on the 1000-stage DID DOCP.

The driver-defined target (BASELINE.json): per-IP-iteration KKT
factorize+solve on a 1000-stage double-integrator DOCP.  The reference has
no published numbers (BASELINE.md), so ``vs_baseline`` compares the
structured, stage-parallel partitioned backend against the unstructured
dense-saddle LU solve of the *same* KKT system measured in the same run --
the speedup that structure exploitation buys, which is exactly the role of
the reference's Hqp_IpLQDOCP vs its general sparse solvers.

The measured solve is CORRECTNESS-GATED: the KKT residual of the produced
direction must be below RES_TOL (relative to the O(1) right-hand side) or
the benchmark reports failure -- timing a numerically wrong factorization
is meaningless.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "ms", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

import hqp_tpu  # noqa: F401  (x64 on)
from hqp_tpu.models.did import PrgDID
from hqp_tpu.qp import kkt as K_
from hqp_tpu.qp.kkt import FullStageKKT
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
import hqp_tpu.utils.masked as mk

KMAX = 1000
REPS = 20
RES_TOL = 1e-4


def build(kmax):
    prg = PrgDID(kmax=kmax)
    v0 = prg.setup()
    Q0 = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
    _, qp = prg.make_qp(v0, Q=Q0)
    mask = qp.ineq_mask()
    ones = mk.where(mask, mk.tmap(lambda m: m.astype(jnp.float64), mask), 1.0)
    r1 = jnp.where(qp.x_mask(), qp.c, 0.0)
    r2 = qp.eq_offsets()
    r3 = mk.fill(mask, 0.0)
    r4 = mk.fill(mask, 0.0)
    return prg, qp, mask, ones, (r1, r2, r3, r4)


def time_backend(be, qp, mask, ones, rhs, reps=REPS):
    r1, r2, r3, r4 = rhs

    def fs(qp):
        fac = be.factor(qp, ones, ones, mask)
        return be.solve(fac, qp, ones, ones, mask, r1, r2, r3, r4)

    f = jax.jit(fs)
    out = f(qp)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(qp)
    jax.block_until_ready(out[0])
    dt = (time.perf_counter() - t0) / reps
    return dt * 1e3, out


def main():
    prg, qp, mask, ones, rhs = build(KMAX)
    r1, r2, r3, r4 = rhs

    part = PartitionedKKT(L=20, refine_rounds=3)
    part_ms, sol_p = time_backend(part, qp, mask, ones, rhs)

    # correctness gate: true KKT residual of the produced direction
    dx, dy, dz, dw = sol_p
    *_, res = K_.kkt_residual(qp, ones, ones, mask, r1, r2, r3, r4,
                              dx, dy, dz, dw)
    res = float(res)
    ok = res < RES_TOL and not bool(jnp.any(jnp.isnan(dx)))

    # unstructured dense-saddle baseline on the same system (timing only;
    # on TPU its f32 LU is not accuracy-comparable)
    try:
        full = FullStageKKT()
        full_ms, _ = time_backend(full, qp, mask, ones, rhs, reps=3)
    except Exception:
        full_ms = float("nan")

    vs = (full_ms / part_ms) if (full_ms == full_ms) else 1.0
    print(json.dumps({
        "metric": "did1000_kkt_factor_solve_ms",
        "value": round(part_ms, 3) if ok else None,
        "unit": "ms",
        "vs_baseline": round(vs, 2) if ok else 0.0,
        "kkt_residual": res,
        "ok": ok,
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
