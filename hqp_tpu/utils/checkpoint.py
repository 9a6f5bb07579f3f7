"""Checkpoint / resume of solver state.

The reference has no file checkpointing -- its resume mechanism is the
in-memory hot-start state (SURVEY.md section 5: `hqp_solve_hot`,
`_qp_Q_hot` Hessian snapshot, IP `_z_hot/_w_hot`).  Here the full solver
state is a pytree, so real checkpointing is a flatten + savez:
(x, y, z, w, Hessian blocks, IP hot pair, counters) round-trip through a
single .npz file, enabling stop/resume of long SQP runs and of MPC
loops across process restarts.
"""

from __future__ import annotations

import io
import pickle

import jax
import numpy as np


def save_pytree(path, tree, meta=None):
    """Save an arbitrary pytree (+ small metadata dict) to ``path``."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["treedef"] = np.frombuffer(
        pickle.dumps(treedef), dtype=np.uint8)
    arrays["meta"] = np.frombuffer(
        pickle.dumps(meta or {}), dtype=np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_pytree(path):
    """Load (tree, meta) saved by :func:`save_pytree`."""
    with np.load(path, allow_pickle=False) as z:
        treedef = pickle.loads(z["treedef"].tobytes())
        meta = pickle.loads(z["meta"].tobytes())
        n = sum(1 for k in z.files if k.startswith("leaf"))
        leaves = [z[f"leaf{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


def save_solver(path, solver):
    """Checkpoint an SqpSolver mid-run (or converged, for MPC resume)."""
    state = {
        "x": solver.x,
        "y": solver.y,
        "z": solver.z,
        "Q": solver.qp.Q if solver.qp is not None else None,
        "ip_state": solver.ip_state,
        "d": solver.d,
        "s": solver.s,
        "grd_L": solver.grd_L,
    }
    meta = {
        "iter": solver.iter,
        "inf_iters": solver.inf_iters,
        "alpha": float(solver.alpha),
        "status": int(solver.status),
        "f": float(solver.f) if solver.f is not None else None,
        "qp_iters_total": solver.qp_iters_total,
    }
    save_pytree(path, state, meta)


def load_solver(path, solver):
    """Restore a checkpoint into a freshly ``init()``-ed solver of the
    same program; returns the solver."""
    import dataclasses

    state, meta = load_pytree(path)
    solver.x = state["x"]
    solver.y = state["y"]
    solver.z = state["z"]
    if state["Q"] is not None:
        f, qp = solver.prg.make_qp(solver.x, Q=state["Q"])
        solver.f, solver.qp = f, qp
    solver.ip_state = state["ip_state"]
    solver.d = state["d"]
    solver.s = state["s"]
    solver.grd_L = state["grd_L"]
    solver.iter = meta["iter"]
    solver.inf_iters = meta["inf_iters"]
    solver.alpha = meta["alpha"]
    solver.status = meta["status"]
    solver.qp_iters_total = meta["qp_iters_total"]
    return solver
