"""Model abstraction: the TPU-native analog of the S-function/FMU host.

The reference hosts external models through an in-process SimStruct
emulation and FMU wrapper (hxi/Hxi_SimStruct.{h,C}, hxi/sfun_fmu.c,
omu/Omu_Model.{h,C}): a model exposes continuous states, inputs,
parameters and outputs, and the optimizer differentiates through it (via
templated adouble evaluation, hxi/README:30-38).  Here a model is simply
a class of pure JAX functions -- the 'exact AD through the entire model'
property comes from jax tracing instead of type templating -- and the
framework formulations (DynamicOpt / DynamicEst) consume it.

Parameters are first-class: estimation formulations promote them to
constant states (p' = 0), exactly like the reference's treatment of
estimated parameters in Prg_DynamicEst.
"""

from __future__ import annotations

import jax.numpy as jnp


class Model:
    """Dynamic model: dx = ode(t, x, u, p), y = outputs(t, x, u, p).

    Subclass and define nx/nu/ny/npar and the two functions with jnp ops.
    """

    nx: int = 0
    nu: int = 0
    ny: int = 0
    npar: int = 0

    #: default parameter values (shape [npar])
    p0 = ()

    #: nominal magnitudes for scaling (reference mdl_*_nominal knobs)
    x_nominal = None
    y_nominal = None

    #: True for purely discrete-time models (dt_update instead of ode)
    discrete: bool = False

    def ode(self, t, x, u, p):
        raise NotImplementedError

    def dt_update(self, t, x, u, p):
        """Discrete-time state update x+ = f(t, x, u, p), the role of an
        S-function's mdlUpdate (consumed by the DTOpt/DTEst
        formulations, omu/Prg_DTOpt.h:1-25)."""
        raise NotImplementedError

    def outputs(self, t, x, u, p):
        """Default: outputs are the states."""
        return x

    def default_p(self):
        return jnp.asarray(self.p0, jnp.float64).reshape(self.npar)
