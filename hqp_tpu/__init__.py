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
