"""The Deep Imitative Model (DIM).

Parity: /root/reference/oatomobile/baselines/torch/dim/model.py:36-253
(`ImitativeModel`): MobileNetV2(2ch) -> concat(velocity,
is_at_traffic_light, traffic_light_state) -> MLP[64,64,64] -> z; decoder =
AutoregressiveFlow; `forward` = gradient-based plan optimisation under the
imitation prior + goal likelihood.

The reference's inner optimisation (model.py:117-137: a Python loop of
torch Adam steps on the plan) becomes a `lax.scan` of optax.adam updates —
the *entire* planner jits, vmaps over scenes, and nests inside closed-loop
rollouts.
"""

from typing import Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from oatomobile_tpu.models import transforms
from oatomobile_tpu.models.mlp import MLP
from oatomobile_tpu.models.perception import MobileNetV2
from oatomobile_tpu.models.sequence import AutoregressiveFlow


class ImitativeModel(nn.Module):
  """Conditional density estimator p(trajectory | context).

  ``input_size``: the encoder's visual input resolution.  The reference
  fixes 100x100 (dim/model.py:248-251 downsamples the 200x200 BEV);
  50x50 quarters the encoder FLOPs — the closed-loop bottleneck — at a
  measurable quality cost (input-resolution study, PARITY.md).
  """

  output_shape: Tuple[int, int] = (4, 2)
  input_size: Tuple[int, int] = (100, 100)

  def setup(self):
    self._encoder = MobileNetV2(num_classes=128, name="encoder")
    self._merger = MLP(output_sizes=(64, 64, 64), activate_final=True,
                       name="merger")
    self._decoder = AutoregressiveFlow(output_shape=self.output_shape,
                                       hidden_size=64, name="decoder")

  # -- context encoding ------------------------------------------------------

  def params_z(self, **context: jnp.ndarray) -> jnp.ndarray:
    """Contextual parameters z of the conditional flow (model.py:173-219).

    Context keys: visual_features [B,H,W,2], velocity [B,3],
    is_at_traffic_light [B,1], traffic_light_state [B,1].
    """
    for key in ("visual_features", "velocity", "is_at_traffic_light",
                "traffic_light_state"):
      if key not in context:
        raise ValueError("Missing `{}` keyword argument.".format(key))
    features = self._encoder(context["visual_features"])
    features = jnp.concatenate([
        features,
        context["velocity"],
        context["is_at_traffic_light"],
        context["traffic_light_state"],
    ], axis=-1)
    return self._merger(features)

  # -- densities --------------------------------------------------------------

  def log_prob(self, y: jnp.ndarray, **context: jnp.ndarray) -> jnp.ndarray:
    """Exact log-likelihood of trajectories y [B,T,2] (used by the NLL
    trainer, train.py:195-201: -(log_prob - logabsdet))."""
    z = self.params_z(**context)
    _, log_prob, logabsdet = self._decoder._inverse(y, z)
    return log_prob - logabsdet

  def imitation_prior_from_z(self, y: jnp.ndarray,
                             z: jnp.ndarray) -> jnp.ndarray:
    """Per-scene imitation prior [B].

    The reference computes a scalar ``.mean()`` (dim/model.py:126) — but it
    only ever plans one scene at a time; batched planning must keep the
    per-scene value so every scene optimises its own posterior rather than
    a batch-coupled objective.
    """
    _, log_prob, logabsdet = self._decoder._inverse(y, z)
    return log_prob - logabsdet

  def decode(self, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    y, _ = self._decoder._forward(x, z)
    return y

  def sample(self, rng: jax.Array, **context: jnp.ndarray) -> jnp.ndarray:
    """Stochastic trajectory samples (decoder push-forward)."""
    z = self.params_z(**context)
    return self._decoder(z, rng)

  # -- goal likelihood ----------------------------------------------------------

  @staticmethod
  def goal_likelihood(y: jnp.ndarray, goal: jnp.ndarray,
                      epsilon: float = 1.0) -> jnp.ndarray:
    """Mixture-of-normals goal log-likelihood of the plan endpoint
    (model.py:143-171): GMM over K goals with isotropic scale epsilon,
    evaluated at y[..., -1, :].  Returns the per-scene value [B] (the
    reference's batch ``.mean()`` is only correct for B=1 — see
    `imitation_prior_from_z`)."""
    B, K, D = goal.shape
    endpoint = y[..., -1, :]  # [B, D]
    diff = endpoint[:, None, :] - goal  # [B, K, D]
    comp_logp = (-0.5 * jnp.sum((diff / epsilon)**2, axis=-1) -
                 D * jnp.log(epsilon) - 0.5 * D * jnp.log(2 * jnp.pi))
    # Equal mixture weights (Categorical(ones) -> 1/K).
    return jax.scipy.special.logsumexp(comp_logp, axis=-1) - jnp.log(K)

  # -- planning ("forward" of the reference) -------------------------------------

  def plan(self,
           rngs: Optional[jax.Array] = None,
           num_steps: int = 10,
           goal: Optional[jnp.ndarray] = None,
           lr: float = 1e-1,
           epsilon: float = 1.0,
           **context: jnp.ndarray) -> jnp.ndarray:
    """Returns a local mode of the imitation posterior (model.py:76-141).

    Initialises the base sample x at the prior mean (zeros), runs
    ``num_steps`` Adam updates maximising
    ``imitation_prior(decode(x)) + goal_likelihood``, tracks the best x.
    """
    del rngs
    if "visual_features" not in context:
      raise ValueError("Missing `visual_features` keyword argument.")
    z = self.params_z(**context)
    return self.plan_from_z(z, num_steps=num_steps, goal=goal, lr=lr,
                            epsilon=epsilon)

  def plan_from_z(self,
                  z: jnp.ndarray,
                  num_steps: int = 10,
                  goal: Optional[jnp.ndarray] = None,
                  lr: float = 1e-1,
                  epsilon: float = 1.0) -> jnp.ndarray:
    """`plan` with a precomputed context encoding z [B, 64].

    Split out so callers can run the encoder at a different precision
    (bf16 MXU inference) or share one z across replans while the
    f32 flow planner stays exact.
    """
    batch_size = z.shape[0]

    x0 = jnp.zeros((batch_size,) + tuple(self.output_shape))
    optimizer = optax.adam(lr)

    def loss_fn(x):
      """Per-scene negative posterior [B]; the scalar sum feeds autodiff
      (each scene's x slice only enters its own term, so the gradient is
      exactly the per-scene gradient — unlike the reference's batch mean,
      correct only at B=1)."""
      y, _ = self._decoder._forward(x, z)
      _, log_prob, logabsdet = self._decoder._inverse(y, z)
      imitation_prior = log_prob - logabsdet  # [B]
      gl = 0.0
      if goal is not None:
        gl = self.goal_likelihood(y, goal, epsilon=epsilon)  # [B]
      return -(imitation_prior + gl)

    def step(carry, _):
      x, opt_state, x_best, loss_best = carry
      loss, pullback = jax.vjp(loss_fn, x)
      grads = pullback(jnp.ones_like(loss))[0]
      updates, opt_state = optimizer.update(grads, opt_state, x)
      new_x = optax.apply_updates(x, updates)
      better = loss < loss_best  # [B]
      x_best = jnp.where(better[:, None, None], x, x_best)
      loss_best = jnp.where(better, loss, loss_best)
      return (new_x, opt_state, x_best, loss_best), loss

    # `loss_best` starts at +inf so the first evaluated plan always becomes
    # the incumbent (the reference's 1000.0 init, rip/agent.py:100, keeps
    # the untouched zeros-init whenever an untrained flow's losses all
    # exceed 1000 — documented deviation, PARITY.md).
    init = (x0, optimizer.init(x0), x0,
            jnp.full((batch_size,), jnp.inf, jnp.float32))
    (x, _, x_best, _), _ = jax.lax.scan(step, init, None, length=num_steps)
    y, _ = self._decoder._forward(x_best, z)
    return y

  # -- preprocessing ---------------------------------------------------------------

  def transform(
      self, sample: Mapping[str, jnp.ndarray]) -> Mapping[str, jnp.ndarray]:
    """Prepares raw sample variables for the model interface
    (model.py:221-253), NHWC layout."""
    sample = dict(sample)
    if "player_future" in sample:
      sample["player_future"] = transforms.downsample_target(
          sample["player_future"],
          num_timesteps_to_keep=self.output_shape[-2])
    if "lidar" in sample:
      sample["visual_features"] = sample.pop("lidar")
    if "visual_features" in sample:
      sample["visual_features"] = transforms.transpose_visual_features(
          transforms.downsample_visual_features(
              sample["visual_features"],
              output_shape=tuple(self.input_size)))
    return sample
