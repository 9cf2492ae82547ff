"""End-to-end pipeline tests: collect -> process -> train -> act."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oatomobile_tpu.core.loop import EnvironmentLoop
from oatomobile_tpu.core.rl import FiniteHorizonWrapper, StepsMetric
from oatomobile_tpu.datasets.carla import CARLADataset
from oatomobile_tpu.envs import CARLAEnv


@pytest.fixture(scope="module")
def demo_dataset(tmp_path_factory):
  """Collects a tiny batched dataset and processes it."""
  root = tmp_path_factory.mktemp("dataset")
  raw_dir = str(root / "raw")
  processed_dir = str(root / "processed")
  tokens = CARLADataset.collect_batched(
      town="Town02", output_dir=raw_dir, num_episodes=2, num_steps=130,
      seed=3)
  assert len(tokens) == 2
  CARLADataset.process(raw_dir, processed_dir, future_length=80,
                       past_length=20, num_frame_skips=10)
  files = glob.glob(os.path.join(processed_dir, "*.npz"))
  assert len(files) >= 4
  return processed_dir


def test_processed_datum_contents(demo_dataset):
  fname = glob.glob(os.path.join(demo_dataset, "*.npz"))[0]
  datum = CARLADataset.load_datum(
      fname, modalities=("lidar", "player_future", "player_past",
                         "velocity"), mode=True)
  assert datum["lidar"].shape == (200, 200, 2)
  assert datum["player_future"].shape == (80, 3)
  assert datum["player_past"].shape == (20, 3)
  assert datum["mode"] in (0.0, 1.0, 2.0, 3.0)


def test_as_jax_batching(demo_dataset):
  loader = CARLADataset.as_jax(
      demo_dataset, modalities=("player_future", "velocity"), batch_size=2)
  batch = next(loader)
  assert batch["player_future"].shape == (2, 80, 3)
  assert batch["velocity"].shape == (2, 3)


def test_as_torch_adapter(demo_dataset):
  ds = CARLADataset.as_torch(demo_dataset, modalities=("velocity",))
  assert len(ds) >= 4
  assert ds[0]["velocity"].shape == (3,)


def test_dim_training_loss_decreases(demo_dataset, tmp_path):
  from oatomobile_tpu.baselines.learned.dim.train import train
  state = train(demo_dataset, str(tmp_path / "dim"), batch_size=4,
                num_epochs=3, learning_rate=1e-3, use_mesh=False,
                save_model_frequency=2, max_steps_per_epoch=2)
  import json
  records = [json.loads(l) for l in open(
      tmp_path / "dim" / "logs" / "dim_train.jsonl")]
  losses = [r["loss"] for r in records]
  assert np.isfinite(losses).all()
  assert losses[-1] < losses[0]
  # Checkpoints written.
  assert os.path.exists(tmp_path / "dim" / "ckpts" / "model-1.flax")


def test_cil_training_runs(demo_dataset, tmp_path):
  from oatomobile_tpu.baselines.learned.cil.train import train
  state = train(demo_dataset, str(tmp_path / "cil"), batch_size=4,
                num_epochs=1, use_mesh=False, max_steps_per_epoch=2)
  assert int(state.step) >= 1


def test_rip_mp_sharded_matches_unsharded(demo_dataset, tmp_path):
  # VERDICT r3 item 6: the production RIP trainer's (dp, mp) ensemble
  # layout must reproduce the single-device run.  K=4 over mp=4, batch
  # over dp=2 on the virtual 8-CPU mesh.
  from oatomobile_tpu.baselines.learned.rip.train import train
  kwargs = dict(num_models=4, batch_size=8, num_epochs=1,
                max_steps_per_epoch=2, val_fraction=0.0,
                save_model_frequency=1, device_data=False)
  s_plain = train(demo_dataset, str(tmp_path / "rip_plain"),
                  use_mesh=False, **kwargs)
  s_mesh = train(demo_dataset, str(tmp_path / "rip_mesh"),
                 use_mesh=True, **kwargs)
  flat_a = jax.tree.leaves(s_plain)
  flat_b = jax.tree.leaves(s_mesh)
  assert len(flat_a) == len(flat_b)
  for a, b in zip(flat_a, flat_b):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=2e-5)


def test_checkpointer_roundtrip(tmp_path):
  from oatomobile_tpu.utils.checkpoint import Checkpointer
  tree = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
  ckpt = Checkpointer(str(tmp_path))
  ckpt.save(7, tree)
  restored = ckpt.load(7, jax.tree.map(jnp.zeros_like, tree))
  np.testing.assert_array_equal(np.asarray(restored["a"]),
                                np.asarray(tree["a"]))
  assert ckpt.latest_epoch() == 7


@pytest.fixture(scope="module")
def nav_env():
  env = CARLAEnv(town="Town02", spawn_point=3, destination=40,
                 sensors=("goal", "velocity", "lidar",
                          "is_at_traffic_light", "traffic_light_state"))
  yield env
  env.close()


def test_autopilot_agent_drives(nav_env):
  from oatomobile_tpu.baselines.rulebased import AutopilotAgent
  env = FiniteHorizonWrapper(nav_env, max_episode_steps=30)
  metrics = [StepsMetric()]
  results = EnvironmentLoop(
      lambda environment: AutopilotAgent(environment, noise=0.0),
      env, metrics=metrics).run()
  assert results["steps"] == 30


def test_blind_agent_acts(nav_env):
  from oatomobile_tpu.baselines.rulebased import BlindAgent
  nav_env.reset()
  agent = BlindAgent(nav_env)
  obs, _, _, _ = nav_env.step({"throttle": 0.3})
  action = agent.act(obs)
  assert 0.0 <= action.throttle <= 1.0
  assert -1.0 <= action.steer <= 1.0


def test_dim_agent_closed_loop(nav_env):
  from oatomobile_tpu.baselines.learned.dim import DIMAgent, ImitativeModel
  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(
      visual_features=jnp.zeros((1, 100, 100, 2)),
      velocity=jnp.zeros((1, 3)),
      is_at_traffic_light=jnp.zeros((1, 1)),
      traffic_light_state=jnp.zeros((1, 1)),
  )
  params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 2)),
                      method=model.log_prob, **ctx)
  obs = nav_env.reset()
  agent = DIMAgent(nav_env, model=model, params=params)
  for _ in range(2):
    action = agent.act(obs, num_steps=2)
    obs, _, _, _ = nav_env.step(action)
  assert np.isfinite(action.throttle)


def test_rip_agent_closed_loop(nav_env):
  from oatomobile_tpu.baselines.learned.rip import RIPAgent
  from oatomobile_tpu.models.dim import ImitativeModel
  model = ImitativeModel(output_shape=(4, 2))
  ctx = dict(
      visual_features=jnp.zeros((1, 100, 100, 2)),
      velocity=jnp.zeros((1, 3)),
      is_at_traffic_light=jnp.zeros((1, 1)),
      traffic_light_state=jnp.zeros((1, 1)),
  )
  params_list = [
      model.init(jax.random.PRNGKey(k), jnp.zeros((1, 4, 2)),
                 method=model.log_prob, **ctx) for k in range(2)
  ]
  obs = nav_env.reset()
  agent = RIPAgent(nav_env, algorithm="WCM", model=model,
                   params_list=params_list)
  action = agent.act(obs, num_steps=2)
  assert np.isfinite(action.steer)


def test_cil_agent_closed_loop(nav_env):
  from oatomobile_tpu.baselines.learned.cil import (BehaviouralModel,
                                                    CILAgent)
  model = BehaviouralModel(output_shape=(8, 2))
  ctx = dict(
      visual_features=jnp.zeros((1, 100, 100, 2)),
      velocity=jnp.zeros((1, 3)),
      is_at_traffic_light=jnp.zeros((1, 1)),
      traffic_light_state=jnp.zeros((1, 1)),
      mode=jnp.zeros((1, 1)),
  )
  params = model.init(jax.random.PRNGKey(0), **ctx)
  obs = nav_env.reset()
  agent = CILAgent(nav_env, model=model, params=params)
  action = agent.act(obs)
  assert np.isfinite(action.throttle)
