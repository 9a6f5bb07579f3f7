"""Scenario batching + device-mesh sharding (BASELINE.md config 5).

Runs on the 8-device virtual CPU mesh from conftest; the driver's
multichip dry-run exercises the same path via __graft_entry__."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import hqp_tpu
from hqp_tpu.models.did import PrgDID
from hqp_tpu.qp import mehrotra as ip
from hqp_tpu.qp.kkt_partitioned import PartitionedKKT
from hqp_tpu.parallel.scenarios import (
    make_mesh, shard_batch, batched_qp, make_scenario_step,
    make_scenario_init)


def test_batched_scenarios_sharded():
    assert len(jax.devices()) == 8

    prg = PrgDID(kmax=15, with_cns=False)
    v0 = prg.setup()
    Q0 = jnp.tile(jnp.eye(prg.nv) * 1e-2, (prg.K + 1, 1, 1))
    solver = ip.Mehrotra(backend=PartitionedKKT(L=5))

    B = 16
    v_b = batched_qp(prg, v0, B, scale=1e-4)
    Q_b = jnp.tile(Q0[None], (B, 1, 1, 1))

    mesh = make_mesh(8, axes=("dp",))
    v_b = shard_batch(v_b, mesh, "dp")
    Q_b = shard_batch(Q_b, mesh, "dp")

    init = jax.jit(make_scenario_init(prg, solver))
    step = jax.jit(make_scenario_step(prg, solver))

    with mesh:
        states = init(v_b, Q_b)
        for _ in range(25):
            states = step(v_b, Q_b, states)
        jax.block_until_ready(states.x)

    # all scenarios drove their QPs to near-optimality independently
    phis = np.asarray(states.test)
    assert phis.shape == (B,)
    assert np.all(np.isfinite(phis))
    assert np.median(phis) < 1e-6

    # output sharding was preserved across the step
    assert len(states.x.sharding.device_set) == 8


def test_graft_entry_and_dryrun():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out.x)
    g.dryrun_multichip(8)
