"""Multi-device scaling of the sharded partitioned KKT (BASELINE config 5).

Run under a virtual CPU mesh (real multi-chip hardware is not available to
the builder; the same shard_map program runs unchanged on a TPU mesh):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

Times factor+solve of the 960-stage DID KKT on 1, 2, 4, 8-device meshes of
the SAME host and prints one JSON line with iterations/s and scaling
efficiency relative to 1 device.  On a 2-core host the absolute numbers
are CPU-bound; the number that matters is that the communication pattern
(two psum-gathers of O(P nx^2) floats, horizon-independent) adds no
per-device cost as the mesh grows.
"""

import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import hqp_tpu  # noqa: F401, E402
from hqp_tpu.models.did import PrgDID  # noqa: E402
from hqp_tpu.parallel.sharded_kkt import ShardedPartitionedKKT  # noqa: E402
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT  # noqa: E402
import hqp_tpu.utils.masked as mk  # noqa: E402

KMAX = 960
REPS = 5


def build(kmax):
    prg = PrgDID(kmax=kmax, with_cns=True)
    v0 = prg.setup()
    Q0 = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
    _, qp = prg.make_qp(v0, Q=Q0)
    mask = qp.ineq_mask()
    ones = mk.fill(mk.tmap(lambda m: m.astype(jnp.float64), mask), 1.0)
    r1 = jnp.where(qp.x_mask(), qp.c, 0.0)
    r2 = qp.eq_offsets()
    r3 = mk.fill(mask, 0.0)
    r4 = mk.fill(mask, 0.0)
    return qp, mask, ones, (r1, r2, r3, r4)


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
    return (time.perf_counter() - t0) / reps * 1e3


def control_matmul_eff(devs, nd):
    """CONTROL EXPERIMENT: strong scaling of an embarrassingly parallel
    batched matmul (zero communication) on the same virtual mesh.  On
    this 2-core host it measures ~1.0x at 2 devices (no speedup): XLA:CPU
    intra-op threading already uses every physical core for the 1-device
    baseline, so NO sharded program -- whatever its communication design
    -- can show parallel efficiency here.  This bounds what the KKT
    scaling numbers below can honestly mean (see PERF.md)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    A = jnp.asarray(np.random.default_rng(0).standard_normal(
        (64, 256, 256)))
    f = jax.jit(lambda a: jnp.einsum("bij,bjk->bik", a, a))

    def one(n):
        mesh = Mesh(np.array(devs[:n]), ("b",))
        Ab = jax.device_put(A, NamedSharding(mesh, P("b")))
        out = f(Ab)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(Ab)
        out.block_until_ready()
        return (time.perf_counter() - t0) / 20

    t1, tn = one(1), one(nd)
    return round(t1 / (tn * nd), 3)


def main():
    qp, mask, ones, rhs = build(KMAX)
    devs = jax.devices()
    ncores = os.cpu_count() or 1
    out = {"kmax": KMAX, "n_devices_available": len(devs),
           "host_cores": ncores,
           "note": ("virtual CPU mesh; efficiencies beyond the physical "
                    "core count are core-bound, not communication-bound")}
    if len(devs) >= 2:
        out["control_zero_comm_matmul_eff_2dev"] = control_matmul_eff(
            devs, 2)
    out["unsharded_ms"] = round(
        time_backend(PartitionedKKT(L=20), qp, mask, ones, rhs), 3)
    # strong scaling of the sharded backend against ITSELF on a 1-device
    # mesh (same code path, so shard_map overheads cancel).  full_shard
    # (round 5) runs the ENTIRE solve inside one shard_map -- no
    # replicated O(K) stage work; the r4 layering is recorded alongside
    # for the A/B.
    times = {}
    for nd in (1, 2, 4, 8):
        if nd > len(devs):
            break
        mesh = Mesh(np.array(devs[:nd]), ("sp",))
        be = ShardedPartitionedKKT(mesh, L=20)
        times[nd] = time_backend(be, qp, mask, ones, rhs)
    out["factor_solve_ms"] = {str(k): round(v, 3) for k, v in times.items()}
    base = times[1]
    for nd, t in times.items():
        if nd > 1:
            out[f"scaling_eff_{nd}dev"] = round(base / (t * nd), 3)
    if len(devs) >= 2 and os.environ.get("HQP_SCALING_R4PATH", "1") != "0":
        mesh2 = Mesh(np.array(devs[:2]), ("sp",))
        be_old = ShardedPartitionedKKT(mesh2, L=20, full_shard=False)
        out["factor_solve_ms_r4path_2dev"] = round(
            time_backend(be_old, qp, mask, ones, rhs), 3)
    print(json.dumps(out))
    # record for bench.py's scaling config (runs out-of-band; see
    # bench.py cfg_scaling)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_scaling.json")
    with open(path, "w") as fh:
        json.dump(out, fh)


if __name__ == "__main__":
    main()
