"""Dynamics model zoo.

JAX-traceable re-derivations of the reference test models
(/root/reference/test/test_utils.cpp): double integrator, pendulum,
kinematic bicycle — plus cartpole and quadrotor models the reference
declares or implies but does not ship. All continuous models compose with
the integrators in `altro_tpu.models.integrators`; Jacobians come from
`jax.jacfwd` (bitwise-equivalent to the reference's hand chain rule for
the midpoint scheme).
"""

from altro_tpu.models.integrators import midpoint, rk4
from altro_tpu.models.double_integrator import (
    double_integrator_dynamics,
    double_integrator_linear,
)
from altro_tpu.models.pendulum import pendulum_continuous
from altro_tpu.models.bicycle import BicycleFrame, bicycle_continuous
from altro_tpu.models.cartpole import cartpole_continuous
from altro_tpu.models.quadrotor import quadrotor_continuous
