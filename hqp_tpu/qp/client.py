"""Client QP solver: ship the QP to an external solver process.

Role of the reference's Hqp_Client (hqp/Hqp_Client.{h,C}: writes the
sparse QP over named pipes /tmp/comm/pipe1|2 to an external solver
process and reads x, y, z back -- its only process-boundary hook).
Here the transport is length-prefixed pickles over a worker
subprocess's stdin/stdout, and the remote end runs this framework's own
Mehrotra solver (``python -m hqp_tpu.qp.client`` is the worker).  The
class implements the same (init_state / solve) protocol as Mehrotra, so
it drops into the SQP loop as ``sqp_qp_solver Client``.
"""

from __future__ import annotations

import pickle
import struct
import subprocess
import sys

from hqp_tpu.qp.mehrotra import Mehrotra
from hqp_tpu.utils.registry import modules


def _write_msg(pipe, obj):
    data = pickle.dumps(obj)
    pipe.write(struct.pack("<Q", len(data)))
    pipe.write(data)
    pipe.flush()


def _read_msg(pipe):
    hdr = pipe.read(8)
    if len(hdr) < 8:
        raise EOFError("client pipe closed")
    (n,) = struct.unpack("<Q", hdr)
    return pickle.loads(pipe.read(n))


@modules.register("sqp_qp_solver", "Client")
class Client:
    """QP solver proxy over a worker process."""

    def __init__(self, backend=None, eps=1e-9, max_iters=50, **kw):
        self.backend = backend  # assigned by the SQP layer; forwarded
        self.eps = eps
        self.max_iters = max_iters
        self._kw = kw
        self._proc = None
        #: local solver used only for state construction (cheap, no solve)
        self._local = Mehrotra(eps=eps, max_iters=max_iters, **kw)

    def with_backend(self, backend):
        """Rebind contract shared with Mehrotra/Franke (SqpSolver.init):
        the Client has identity hashing and is never a static jit arg,
        so in-place rebinding is safe -- but keep the same interface."""
        if backend is not self.backend:
            self.backend = backend
        return self

    def _ensure_worker(self):
        if self._proc is None or self._proc.poll() is not None:
            self._proc = subprocess.Popen(
                [sys.executable, "-m", "hqp_tpu.qp.client"],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE)
        return self._proc

    def init_state(self, qp):
        return self._local.init_state(qp)

    def solve(self, qp, state, hot: bool = False):
        p = self._ensure_worker()
        backend_name = type(self.backend).__name__ if self.backend else None
        _write_msg(p.stdin, {
            "qp": qp, "state": state, "hot": hot,
            "eps": self.eps, "max_iters": self.max_iters,
            "backend": backend_name, "kw": self._kw,
        })
        reply = _read_msg(p.stdout)
        if "error" in reply:
            raise RuntimeError(f"client worker: {reply['error']}")
        return reply["state"]

    def close(self):
        if self._proc is not None and self._proc.poll() is None:
            self._proc.stdin.close()
            self._proc.wait(timeout=10)
        self._proc = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


_BACKENDS = {
    None: lambda: None,
    "DenseKKT": lambda: _mk("hqp_tpu.qp.kkt", "DenseKKT"),
    "FullStageKKT": lambda: _mk("hqp_tpu.qp.kkt", "FullStageKKT"),
    "RiccatiKKT": lambda: _mk("hqp_tpu.qp.kkt", "RiccatiKKT"),
    "PartitionedKKT": lambda: _mk("hqp_tpu.qp.kkt_partitioned",
                                  "PartitionedKKT"),
}


def _mk(mod, name):
    import importlib

    return getattr(importlib.import_module(mod), name)()


def _worker_main():
    """Worker loop: read QP jobs, solve with Mehrotra, reply."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import hqp_tpu  # noqa: F401  (x64)
    from hqp_tpu.qp import kkt

    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    while True:
        try:
            job = _read_msg(stdin)
        except EOFError:
            return
        try:
            backend = _BACKENDS.get(job["backend"],
                                    lambda: kkt.DenseKKT())()
            if backend is None:
                backend = kkt.DenseKKT()
            solver = Mehrotra(backend=backend, eps=job["eps"],
                              max_iters=job["max_iters"], **job["kw"])
            state = solver.solve(job["qp"], job["state"], hot=job["hot"])
            _write_msg(stdout, {"state": state})
        except Exception as e:  # report, keep serving
            _write_msg(stdout, {"error": f"{type(e).__name__}: {e}"})


if __name__ == "__main__":
    _worker_main()
