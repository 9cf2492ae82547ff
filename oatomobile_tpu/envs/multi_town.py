"""Multi-town batched environments (Town01-05 in one logical batch).

BASELINE.json config 5 calls for 1024-way envs spanning all towns.  Map
assets differ per town (array shapes included), so each town gets its own
compiled program; this wrapper splits the logical batch across per-town
`BatchedEnv`s and merges rollout statistics.  On a multi-chip mesh each
sub-env can be placed on its own slice of the data axis.

(A single-program alternative — town-stacked padded map arrays indexed by
a per-scene town id — would trade one compile for a town-index gather on
every map access; with five towns the per-town programs are simpler and
just as fast once compiled.)
"""

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from oatomobile_tpu.envs.batched import BatchedEnv
from oatomobile_tpu.maps.towns import AVAILABLE_TOWNS
from oatomobile_tpu.sensors import synth


class MultiTownBatchedEnv:
  """A batch of scenes distributed over several towns."""

  def __init__(
      self,
      towns: Sequence[str] = AVAILABLE_TOWNS,
      batch_size: int = 1024,
      sensors: Sequence[str] = synth.STATE_SENSORS,
      num_vehicles: int = 0,
      num_pedestrians: int = 0,
      seed: int = 0,
      **env_kwargs,
  ) -> None:
    assert batch_size % len(towns) == 0, (
        "batch_size must divide evenly across towns")
    per_town = batch_size // len(towns)
    self._towns = list(towns)
    self._envs = [
        BatchedEnv(town, per_town, sensors=sensors,
                   num_vehicles=num_vehicles,
                   num_pedestrians=num_pedestrians, seed=seed + 1000 * i,
                   **env_kwargs)
        for i, town in enumerate(towns)
    ]
    self._batch_size = batch_size

  @property
  def batch_size(self) -> int:
    return self._batch_size

  @property
  def towns(self) -> Sequence[str]:
    return self._towns

  @property
  def envs(self) -> Sequence[BatchedEnv]:
    return self._envs

  def reset(self) -> Dict[str, jnp.ndarray]:
    obs = [env.reset() for env in self._envs]
    return {
        key: jnp.concatenate([o[key] for o in obs], axis=0)
        for key in obs[0]
    }

  def step(self, actions) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    actions = jnp.asarray(actions)
    per = self._envs[0].batch_size
    all_obs, all_done = [], []
    for i, env in enumerate(self._envs):
      obs, done = env.step(actions[i * per:(i + 1) * per])
      all_obs.append(obs)
      all_done.append(done)
    merged = {
        key: jnp.concatenate([o[key] for o in all_obs], axis=0)
        for key in all_obs[0]
    }
    return merged, jnp.concatenate(all_done, axis=0)

  def rollout(self, num_steps: int, policy=None, collect: Sequence[str] = (),
              compute: Sequence[str] = ()):
    """Per-town rollouts; merged (finals list, collected dict, stats)."""
    finals, collected_all, stats_all = [], [], []
    for env in self._envs:
      final, collected, stats = env.rollout(num_steps, policy=policy,
                                            collect=collect,
                                            compute=compute)
      finals.append(final)
      collected_all.append(collected)
      stats_all.append(stats)
    stats = {
        key: jnp.concatenate([s[key] for s in stats_all], axis=0)
        for key in stats_all[0]
    }
    merged_collected = ()
    if collect:
      merged_collected = {
          key: jnp.concatenate([c[key] for c in collected_all], axis=1)
          for key in collected_all[0]
      }
    return finals, merged_collected, stats
