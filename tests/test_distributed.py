"""Multi-host initialization glue (hqp_tpu.parallel.distributed): the
single-process no-op path and the global-mesh layout (multi-process
paths need real multi-host hardware; the mesh math is host-count
agnostic and is exercised on the virtual 8-device mesh)."""

import jax
import pytest

import hqp_tpu
from hqp_tpu.parallel import distributed as dist


def test_single_process_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert dist.init_distributed() is False


def test_global_mesh_single_axis():
    mesh = dist.global_mesh(("sp",))
    assert mesh.shape["sp"] == jax.device_count()


def test_global_mesh_two_axes():
    mesh = dist.global_mesh(("dp", "sp"))
    assert mesh.shape["dp"] * mesh.shape["sp"] == jax.device_count()
    # the ICI-preferred (last) axis spans the local device count
    assert mesh.shape["sp"] == jax.local_device_count()


def test_sharded_kkt_on_global_mesh():
    """The sharded backend consumes the distributed mesh unchanged."""
    from hqp_tpu.parallel.sharded_kkt import ShardedPartitionedKKT

    mesh = dist.global_mesh(("sp",))
    be = ShardedPartitionedKKT(mesh, axis="sp", L=4)
    assert be.ndev == jax.device_count()


def test_process_summary():
    s = dist.process_summary()
    assert "process 0/1" in s
