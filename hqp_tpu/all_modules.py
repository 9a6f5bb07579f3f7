"""Import every module that self-registers components.

The reference wires its registries at library init (hqp/Hqp_Init.C:96-121
Hqp_ClassAlloc, omu/Omu_Init.C Omu_ClassAlloc); importing this module is
the equivalent: afterwards, every solver / KKT backend / Hessian /
integrator / program is reachable by name through
:data:`hqp_tpu.utils.registry.modules`.
"""

# flake8: noqa: F401
import hqp_tpu.models.did
import hqp_tpu.models.crane
import hqp_tpu.models.nlp_suite
import hqp_tpu.models.omu_suite
import hqp_tpu.models.hxi_suite
import hqp_tpu.omu.integrators
import hqp_tpu.omu.dynamic_opt
import hqp_tpu.omu.dynamic_est
import hqp_tpu.omu.dt_opt
import hqp_tpu.sqp.powell
import hqp_tpu.sqp.schittkowski
import hqp_tpu.sqp.hessian
import hqp_tpu.qp.mehrotra
import hqp_tpu.qp.franke
import hqp_tpu.qp.kkt
import hqp_tpu.qp.kkt_partitioned
import hqp_tpu.qp.kkt_sparse_host
import hqp_tpu.mip.branch_bound
import hqp_tpu.qp.client
