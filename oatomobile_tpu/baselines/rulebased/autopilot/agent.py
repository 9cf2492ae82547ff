"""PID-controller-based autopilot agent.

Parity: /root/reference/oatomobile/baselines/rulebased/autopilot/
agent.py:43-331 (`AutopilotAgent`, itself modeled on CARLA's BasicAgent).
The decision logic lives in-graph (sim/autopilot.py); this class is the
host-side `Agent` adapter for single-scene gym loops — it reads the
simulator's device state, runs one jitted policy evaluation, and carries
the PID/RNG state across steps.
"""

import jax
import numpy as np

import oatomobile_tpu
from oatomobile_tpu.sim.autopilot import autopilot_policy
from oatomobile_tpu.simulators.tpu import defaults
from oatomobile_tpu.simulators.tpu.simulator import CARLAAction


class AutopilotAgent(oatomobile_tpu.Agent):
  """An autopilot agent driving toward the environment's destination."""

  def __init__(self,
               environment: oatomobile_tpu.Env,
               *,
               proximity_tlight_threshold: float = 5.0,
               proximity_vehicle_threshold: float = 10.0,
               noise: float = 0.1) -> None:
    """Args mirror the reference (agent.py:47-62); `noise` is the
    probability of a uniformly random action."""
    super().__init__(environment=environment)
    self._sim = self._environment.unwrapped.simulator
    self._noise = noise
    # Thresholds live in WorldParams; override them for this agent.
    params = self._sim.params
    self._params = params.replace(
        proximity_vehicle_threshold=jax.numpy.float32(
            proximity_vehicle_threshold),
        proximity_tlight_threshold=jax.numpy.float32(
            proximity_tlight_threshold),
    )
    self._policy = jax.jit(
        lambda p, s: autopilot_policy(
            p, s, noise=noise,
            target_speed=defaults.TARGET_SPEED / 3.6))

  def act(self, observation: oatomobile_tpu.Observations,
          *args, **kwargs) -> oatomobile_tpu.Action:
    del observation  # The expert reads privileged simulator state.
    state = self._sim.state
    action, new_state = self._policy(self._params, state)
    # Persist controller/RNG state so PID integrals stay continuous
    # (the reference agent owned a stateful LocalPlanner; here the state
    # rides in the scene pytree).
    self._sim._state = new_state  # pylint: disable=protected-access
    a = np.asarray(action)
    return CARLAAction(throttle=float(a[0]), steer=float(a[1]),
                       brake=float(a[2]))
