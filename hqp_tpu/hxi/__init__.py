"""hxi -- hosting of external (non-JAX) models.

The TPU-native re-creation of the reference's ``hxi/`` layer
(hxi/Hxi_SimStruct.{h,C}, hxi/Hxi_SFunction.{h,C}, hxi/sfun_fmu.c +
hxi/fmi.tcl): models supplied as compiled S-function-style shared
libraries or as FMI 2.0 model-exchange FMUs are loaded in-process and
presented to the optimizer through the same :class:`hqp_tpu.omu.model.Model`
protocol as native JAX models.  Host evaluation crosses the device
boundary through ``jax.pure_callback``; Jacobians come from the model
(fmi2GetDirectionalDerivative / mdlJacobian) when available, else from
central finite differences -- the reference's default
(hqp/Hqp_Docp.C:1098 update_grds).
"""

from hqp_tpu.hxi.simstruct import PySimStruct  # noqa: F401
from hqp_tpu.hxi.sfunction import SFunction, compile_sfunction  # noqa: F401
from hqp_tpu.hxi.fmu import Fmu  # noqa: F401
