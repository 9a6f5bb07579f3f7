"""hqp_tpu -- a TPU-native large-scale sparse nonlinear optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HQP/Omuses
(reference: omuses/hqp): sequential quadratic programming (SQP) with
line-search globalization around a Mehrotra predictor-corrector interior-point
QP solver, with block-structured KKT factorizations that exploit the
stage-wise structure of discrete-time optimal control problems (DOCPs).

Layer map (bottom-up), mirroring the reference architecture
(see /root/repo/SURVEY.md section 1) but designed TPU-first:

  ops/       batched dense block linear algebra + Riccati recursions
             (replaces meschach + spBKP/bdBKP/LQDOCP kernels; stage blocks
             live as [K, n, n] arrays, never general sparse)
  qp/        QP IRs (stage-structured + dense), Mehrotra/Franke IP solvers,
             exchangeable KKT backends      (replaces Hqp_Ips*/Hqp_Ip*)
  sqp/       SQP solvers (Powell, Schittkowski), Hessian approximations
             (BFGS blocks, DScale, Gerschgorin)  (replaces Hqp_Sqp*/Hqp_HL*)
  docp/      stage-wise NLP program abstraction with JAX autodiff
             (replaces Hqp_Docp + ADOL-C)
  omu/       continuous-time front-end: ODE/DAE integrators with forward
             sensitivities                   (replaces omu/ Omuses)
  models/    example problem library (DID, Crane, HS99, TP383, ...)
  parallel/  device-mesh partitioning of the stage axis, Schur-complement
             coupling, batched scenarios     (replaces OpenMP/PARDISO)
  utils/     config registry, logging, timers (replaces iftcl knobs)

Numerics are float64 by default, like the reference; set environment
variable HQP_TPU_X64=0 before import to keep JAX's default float32.
"""

import os as _os

import jax as _jax

if _os.environ.get("HQP_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# TPU matmul precision: XLA's default lowers f32 dots to bfloat16 MXU
# passes (measured rel. error 2.5e-3 per product on v5e).  This framework
# uses f32 matmuls as the *factorization* precision inside mixed-precision
# refinement loops, where a 4e-3 application noise multiplied by interior
# condition numbers ~1e4 makes the refinement iteration DIVERGE (measured:
# the late-barrier interior solve error grew to 1e6 and broke IP
# convergence on the 60-stage DID).  'highest' makes f32 dots true f32
# (3-pass); f64 einsums are unaffected.  Opt out with
# HQP_TPU_MATMUL_PRECISION=default.
if _os.environ.get("HQP_TPU_MATMUL_PRECISION", "highest") == "highest":
    _jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: on the tunneled TPU backend every
# compile (including tiny eager ops) costs 0.3-7 s of round-trip latency,
# which dominates host-driven solver wall time far more than the compute
# itself.  Caching compiled executables on disk makes every process after
# the first start warm (measured: 1.8 s -> 0.5 s for a small jit; minutes
# -> seconds for the SQP pipeline).  Opt out with HQP_TPU_COMP_CACHE=0.
if _os.environ.get("HQP_TPU_COMP_CACHE", "1") != "0":
    # Separate cache trees per platform AND per machine: the tunneled TPU
    # backend compiles CPU executables on a REMOTE host whose machine
    # features differ from this one (loading them locally risks SIGILL),
    # so a TPU-session cache must never be read by a local-CPU session,
    # and a CPU cache written on one machine must never be read on
    # another (observed: XLA AOT "machine feature mismatch" warnings when
    # `.jax_cache/cpu` written on the driver host was reused elsewhere).
    # The machine fingerprint keys the bucket on the host's CPU features,
    # which also covers processes that select a backend via
    # jax.config.update instead of JAX_PLATFORMS (those share the
    # "default" bucket only with same-machine sessions).
    _plat = _os.environ.get("JAX_PLATFORMS", "default").split(",")[0] or \
        "default"
    try:
        import hashlib as _hashlib
        import platform as _platform
        _feat = _platform.machine()
        with open("/proc/cpuinfo") as _fh:
            for _ln in _fh:
                if _ln.startswith(("flags", "Features")):
                    _feat += _ln
                    break
        _plat += "-" + _hashlib.md5(_feat.encode()).hexdigest()[:8]
    except Exception:  # pragma: no cover - fingerprint is best-effort
        pass
    _cache_dir = _os.environ.get(
        "HQP_TPU_COMP_CACHE_DIR",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache", _plat))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.1)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

__version__ = "0.1.0"

from hqp_tpu.utils.registry import modules  # noqa: E402
from hqp_tpu.qp.program import StageQP, DenseQP  # noqa: E402
from hqp_tpu.qp.mehrotra import Mehrotra  # noqa: E402
from hqp_tpu.sqp.solver import SqpSolver, solve  # noqa: E402
from hqp_tpu.docp.program import Docp  # noqa: E402

__all__ = [
    "modules",
    "StageQP",
    "DenseQP",
    "Mehrotra",
    "SqpSolver",
    "solve",
    "Docp",
]
