"""Partition-size sweep on the did1000 KKT (PERF.md item: feed the MXU
with fewer/larger partitions).  Chained factor+solve per L, plus the
interior block size s and achieved FLOP/s estimate."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import hqp_tpu  # noqa: F401
import hqp_tpu.utils.masked as mk
from hqp_tpu.models.did import PrgDID
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT, _interior_dim

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
import importlib.util
spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(repo, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

prg, qp, mask, ones, rhs = bench.build_kkt(1000)
for L in (10, 20, 40, 50, 100):
    be = PartitionedKKT(L=L)
    Luse = be._choose_L(qp.K, qp.nx, qp.nu)
    P = qp.K // Luse
    s = _interior_dim(Luse, qp.nx, qp.nu)
    try:
        ms, sol = bench.time_backend(be, qp, mask, ones, rhs, reps=10,
                                     links=8)
        res = bench.residual_of(qp, mask, ones, rhs, sol)
        flops = 2.0 * s ** 3 * P   # GJ inverse dominates the factor
        print(f"L={Luse:3d} P={P:3d} s={s:4d}: {ms:7.2f} ms/iter "
              f"res {res:.1e}  (factor GJ ~{flops/1e9:.2f} GFLOP)",
              flush=True)
    except Exception as e:
        print(f"L={Luse}: ERROR {type(e).__name__}: {str(e)[:120]}",
              flush=True)
