"""REAL multi-process `jax.distributed` exercise (verdict r4 item 5).

Two local CPU processes with a localhost coordinator (gloo collectives),
2 virtual devices each -> a 4-device global ('sp',) mesh spanning both
processes.  Each child initializes through
hqp_tpu.parallel.distributed.init_distributed (the explicit-args path
that was previously dead code in CI), builds the global mesh, runs

* a shard_map psum over the global axis (cross-process collective), and
* a ShardedPartitionedKKT factor+solve of a small stage QP whose
  boundary Schur gather crosses the process boundary,

and reports the replicated master scaling dM plus the solve's true KKT
residual.  The parent asserts process_count == 2 in both children, that
the cross-process dM agrees with a single-process PartitionedKKT
factorization of the same QP, and that the distributed solve meets the
same residual floor the single-device backend does
(tests/test_sharded_kkt.py).

SURVEY.md section 2.7.3; hqp_tpu/parallel/distributed.py:30-62.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two cold jax processes (~1 min)

CHILD = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hqp_tpu.parallel import distributed as dist
ok = dist.init_distributed(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
from jax.sharding import PartitionSpec as Ps
import hqp_tpu
from hqp_tpu.parallel.sharded_kkt import ShardedPartitionedKKT
from hqp_tpu.qp import kkt as K_
from tests.test_kkt import random_stage_qp, random_zw, random_rhs

mesh = dist.global_mesh(("sp",))

def body():
    i = jax.lax.axis_index("sp")
    return jax.lax.psum(i.astype(jnp.float64), "sp")

psum = float(jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(),
                                   out_specs=Ps()))())

# the same deterministic QP in both processes (multi-controller SPMD:
# every process runs the same program on the same replicated data)
qp = random_stage_qp(16, 2, 1, 1, seed=5)
z, w, mask = random_zw(qp, seed=1)
rhs = random_rhs(qp, seed=2)
# small refine/correction depth: the graph compiles in two cold jax
# processes that may share a loaded 2-core CI host
be = ShardedPartitionedKKT(mesh, axis="sp", L=4, refine_rounds=1,
                           reg_corr_rounds=1)
fac = be.factor(qp, z, w, mask)
sol = be.solve(fac, qp, z, w, mask, *rhs)
*_, res = K_.kkt_residual(qp, z, w, mask, *rhs, *sol)
# dM is replicated output of the cross-process Schur gather; read the
# locally addressable copy
import numpy as np
dM_local = np.asarray(fac.dM.addressable_shards[0].data)
out = dict(init=bool(ok), pid=pid,
           nproc=jax.process_count(), ndev=jax.device_count(),
           local=jax.local_device_count(), psum=psum,
           minv_local_parts=fac.Minv.addressable_shards[0].data.shape[0],
           res=float(res), dM=dM_local.ravel().tolist())
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(CHILD)
    # the child resolves the repo relative to its own path; place a
    # shim: run from the repo root with the tests package importable
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env["PYTHONPATH"] = repo
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=repo, env=env) for i in range(2)]
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        assert p.returncode == 0, se[-2000:]
        line = [ln for ln in so.splitlines() if ln.startswith("RESULT ")]
        assert line, (so[-1000:], se[-2000:])
        outs.append(json.loads(line[-1][len("RESULT "):]))

    for o in outs:
        assert o["init"] is True
        assert o["nproc"] == 2
        assert o["ndev"] == 4
        assert o["local"] == 2
        assert o["psum"] == 6.0        # 0+1+2+3 over the global axis
        assert o["minv_local_parts"] == 1   # P=4 partitions over 4 devices
        assert o["res"] < 1e-8

    # the replicated master scaling must agree ACROSS processes and with
    # a single-process factorization of the same QP
    dM0, dM1 = np.asarray(outs[0]["dM"]), np.asarray(outs[1]["dM"])
    np.testing.assert_allclose(dM0, dM1, rtol=1e-12)

    from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
    from tests.test_kkt import random_stage_qp, random_zw
    qp = random_stage_qp(16, 2, 1, 1, seed=5)
    z, w, mask = random_zw(qp, seed=1)
    fac1 = PartitionedKKT(L=4).factor(qp, z, w, mask)
    np.testing.assert_allclose(dM0, np.asarray(fac1.dM).ravel(),
                               rtol=1e-10, atol=1e-12)
