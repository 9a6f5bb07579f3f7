"""Marginal per-phase cost of one Mehrotra IP step on the did1000 QP.

Decomposes the ~33 ms in-loop iteration (BENCH_r04 did1000_sqp: 48 iters
in 1.6 s) against the ~6.4 ms chained factor+solve, by timing a chain of
N data-dependent full IP steps (lax.scan over the IPState carry -- the
same no-CSE/no-overlap methodology as bench.time_backend) under different
backend knobs.  Run on the TPU:  python perf/ip_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp

import hqp_tpu  # noqa: F401
import hqp_tpu.utils.masked as mk
from hqp_tpu.models.did import PrgDID
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.qp.mehrotra import Mehrotra

KMAX = int(os.environ.get("K", "1000"))
N = 6       # chained steps
REPS = int(os.environ.get("REPS", "10"))


def build():
    prg = PrgDID(kmax=KMAX)
    v0 = prg.setup()
    Q0 = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
    _, qp = prg.make_qp(v0, Q=Q0)
    return qp


def time_fn(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS


def chain_steps(slv, qp, n=N):
    """Per-step ms of n chained IP steps from the cold-start state."""
    st0 = jax.jit(lambda q: slv._cold_start(q, slv.init_state(q)))(qp)
    jax.block_until_ready(st0.x)

    def f(st):
        def body(st, _):
            return slv.step(qp, st), None
        st, _ = jax.lax.scan(body, st, None, length=n)
        return st

    fj = jax.jit(f)
    dt = time_fn(fj, st0)
    return dt * 1e3 / n, st0


def main():
    qp = build()
    mask = qp.ineq_mask()
    ones = mk.fill(mk.tmap(lambda m: m.astype(jnp.float64), mask), 1.0)

    variants = {
        "default(rc2,rr4)": PartitionedKKT(L=20),
        "rc0": PartitionedKKT(L=20, reg_corr_rounds=0),
        "rr0": PartitionedKKT(L=20, refine_rounds=0),
        "rc0_rr0": PartitionedKKT(L=20, reg_corr_rounds=0, refine_rounds=0),
        "rc1_rr2": PartitionedKKT(L=20, reg_corr_rounds=1, refine_rounds=2),
    }
    st0 = None
    for name, be in variants.items():
        slv = Mehrotra(backend=be, eps=1e-9)
        ms, st0 = chain_steps(slv, qp)
        print(f"step[{name:16s}]  {ms:7.2f} ms/step", flush=True)

    # --- components, same chaining trick -------------------------------
    be = PartitionedKKT(L=20)
    slv = Mehrotra(backend=be, eps=1e-9)
    z = st0.z
    w = st0.w
    r1 = jnp.where(qp.x_mask(), qp.c, 0.0)
    r2 = qp.eq_offsets()
    r3 = mk.fill(mask, 0.0)
    r4 = mk.fill(mask, 0.0)

    def chain(fun, init):
        def f(x0):
            def body(c, _):
                return fun(c), None
            c, _ = jax.lax.scan(body, x0, None, length=N)
            return c
        fj = jax.jit(f)
        return time_fn(fj, init) * 1e3 / N

    # factor only (z depends on previous factor output)
    def fac_only(zc):
        fac = be.factor(qp, zc, zc, mask)
        bump = 1e-30 * fac.W[0, 0, 0]
        return mk.tmap(lambda a: a + bump, zc)
    print(f"factor only        {chain(fac_only, ones):7.2f} ms", flush=True)

    # factor + 1 solve / + 2 solves
    def fs(nsolve):
        def g(zc):
            fac = be.factor(qp, zc, zc, mask)
            x = r1
            for _ in range(nsolve):
                dx, dy, dz, dw = be.solve(fac, qp, zc, zc, mask,
                                          x, r2, r3, r4)
                x = r1 + 1e-30 * dx
            bump = 1e-30 * x[0, 0]
            return mk.tmap(lambda a: a + bump, zc)
        return g
    print(f"factor+1solve      {chain(fs(1), ones):7.2f} ms", flush=True)
    print(f"factor+2solve      {chain(fs(2), ones):7.2f} ms", flush=True)

    # residual/phi phase of the step (everything before do_step)
    def resid_phase(xc):
        x = xc
        Qx = qp.matvec_Q(x)
        gap = (mk.inner(x, Qx + qp.c)
               + mk.inner(st0.y, qp.eq_offsets(), qp.eq_mask())
               + mk.inner(z, qp.ineq_offsets(), mask))
        r1_ = jnp.where(qp.x_mask(),
                        Qx + qp.c - qp.matvec_eqT(st0.y)
                        - qp.matvec_ineqT(mk.where(mask, z, 0.0)), 0.0)
        r2_ = mk.scale(-1.0, qp.eval_eq(x))
        r3_ = mk.where(mask, mk.sub(w, qp.eval_ineq(x)), 0.0)
        r4_ = mk.where(mask, mk.tmap(lambda a, b: -a * b, z, w), 0.0)
        nr = jnp.maximum(
            jnp.maximum(mk.norm_inf(r1_), mk.norm_inf(r2_, qp.eq_mask())),
            mk.norm_inf(r3_, mask))
        return x + 1e-30 * (nr + gap + r1_ + mk.norm_inf(r4_, mask))
    print(f"residual phase     {chain(resid_phase, st0.x):7.2f} ms",
          flush=True)

    # adaptive alpha
    def alpha_phase(zc):
        a = slv._adaptive_alpha(zc, w, mk.scale(-1.0, zc),
                                mk.scale(-0.5, w), mask,
                                jnp.maximum(mk.count(mask), 1.0))
        return mk.tmap(lambda t: t + 1e-30 * a, zc)
    print(f"alpha phase        {chain(alpha_phase, ones):7.2f} ms",
          flush=True)

    # full solve to termination
    for name, be2 in variants.items():
        slv2 = Mehrotra(backend=be2, eps=1e-9)
        fsolve = jax.jit(lambda q: slv2.solve_device(q, slv2.init_state(q)))
        st = fsolve(qp)
        jax.block_until_ready(st.x)
        t0 = time.perf_counter()
        st = fsolve(qp)
        jax.block_until_ready(st.x)
        dt = time.perf_counter() - t0
        it = int(st.iter)
        print(f"solve[{name:16s}] {dt*1e3:8.1f} ms  iters {it:3d}  "
              f"({dt*1e3/max(it,1):6.2f} ms/iter)  result {int(st.result)}"
              f"  phi {float(st.test):.2e}", flush=True)


if __name__ == "__main__":
    main()
