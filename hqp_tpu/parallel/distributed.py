"""Multi-host (multi-process) mesh initialization.

SURVEY.md section 2.7.3 / BASELINE.md's north star scale the stage and
scenario axes over a TPU pod slice spanning 2+ HOSTS.  In JAX that is
multi-controller SPMD: every host runs the same program under
``jax.distributed``, ``jax.devices()`` returns the GLOBAL device list,
and the same ``shard_map``/``NamedSharding`` code used single-host
(hqp_tpu.parallel.sharded_kkt, hqp_tpu.parallel.scenarios) runs
unchanged over the global mesh -- XLA routes collectives over ICI
within a host's chips and DCN between hosts.  This module provides the
initialization + mesh-layout glue; no solver code changes between one
chip, one host, and a pod slice.

The reference has no distributed backend at all (its only process
boundary is the named-pipe Hqp_Client, hqp/Hqp_Client.C:35-53); this is
the from-scratch TPU-native capability the north star prescribes.

Single-host processes (the common case, and the only one testable in
this repo's CI -- the builder has one chip) skip initialization and fall
through to the local devices.
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Initialize multi-controller JAX if a multi-process environment is
    configured; no-op otherwise.

    Resolution order (first hit wins):
      1. explicit arguments,
      2. the standard JAX env vars (JAX_COORDINATOR_ADDRESS,
         JAX_NUM_PROCESSES, JAX_PROCESS_ID),
      3. TPU pod metadata (jax.distributed.initialize() with no
         arguments auto-detects on Cloud TPU pods),
      4. single process: return False without initializing.

    Call ONCE per process before any device use.  Returns True iff a
    multi-process runtime was initialized.
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else \
        _int_env("JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else \
        _int_env("JAX_PROCESS_ID")
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or \
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    if addr is None and not on_pod:
        return False
    if addr is not None:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc,
                                   process_id=pid)
    else:
        jax.distributed.initialize()   # pod auto-detection
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(axes=("sp",), prefer_ici_axis: int = -1):
    """A mesh over ALL processes' devices (global SPMD mesh).

    With one axis the full device order is used (jax keeps each host's
    devices contiguous, so a single 'sp' axis puts partition neighbors
    on the same host where possible -- boundary exchanges ride ICI, and
    only the P/n_hosts partition-boundary crossings ride DCN).  With two
    axes the LAST axis (prefer_ici_axis) is laid out within hosts:
    ('dp', 'sp') shards scenarios across hosts over DCN (embarrassingly
    parallel) and stages within a host over ICI -- the layout BASELINE's
    config 5 prescribes.
    """
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    n = len(devs)
    if len(axes) == 1:
        return Mesh(devs, axes)
    local = jax.local_device_count()
    rows = max(1, n // local)
    if rows * local != n:
        # fall back to a near-square split
        rows = 1
        for f in range(int(n ** 0.5), 0, -1):
            if n % f == 0:
                rows = f
                break
    return Mesh(devs.reshape(rows, n // rows), axes)


def process_summary():
    """One-line description of the distributed topology (If_Log role)."""
    return (f"process {jax.process_index()}/{jax.process_count()}: "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")
