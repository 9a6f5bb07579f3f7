"""Diagnose the 9/256 non-optimal scenario QPs (verdict r3 weak #3)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import hqp_tpu  # noqa: F401
from hqp_tpu.models.did import PrgDID
from hqp_tpu.parallel.scenarios import batched_qp, make_scenario_solve
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra, RESULT_STRINGS

NS = 256


def run(eps, max_iters=50, rr=4):
    prg = PrgDID(kmax=60)
    v0 = prg.setup()
    vb = batched_qp(prg, v0, NS, scale=1e-3)
    Qb = jnp.tile(jnp.eye(prg.nv)[None] * 1e-2, (NS, prg.K + 1, 1, 1))
    slv = Mehrotra(backend=PartitionedKKT(L=20, master="cr", gj="xla",
                                          refine_rounds=rr),
                   eps=eps, max_iters=max_iters)
    f = jax.jit(make_scenario_solve(prg, slv))
    st = f(vb, Qb)
    jax.block_until_ready(st.x)
    t0 = time.perf_counter()
    st = f(vb, Qb)
    jax.block_until_ready(st.x)
    dt = time.perf_counter() - t0
    res = np.asarray(st.result)
    its = np.asarray(st.iter)
    phi = np.asarray(st.test)
    gap = np.asarray(st.gap)
    codes = {RESULT_STRINGS[c]: int((res == c).sum())
             for c in np.unique(res)}
    print(f"eps={eps} rr={rr} cap={max_iters}: {codes}  "
          f"batch {dt*1e3:.0f}ms", flush=True)
    bad = np.where(res != 0)[0]
    for i in bad[:12]:
        print(f"  scen {i}: {RESULT_STRINGS[int(res[i])]} iters "
              f"{its[i]} phi {phi[i]:.3e} gap {gap[i]:.3e}", flush=True)
    return codes


if __name__ == "__main__":
    run(1e-9)
    run(1e-7)
