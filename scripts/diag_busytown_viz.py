"""Render where BusyTown timeout episodes end: the hero, its route, and
every NPC within 40 m at the final step, plus the hero's speed trace
summary — to localise the grind spot.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--episodes", type=int, default=5)
  ap.add_argument("--horizon", type=int, default=1500)
  ap.add_argument("--tasks", default="BusyTown7-v0,BusyTown9-v0")
  ap.add_argument("--platform", default=None)
  ap.add_argument("--out", default="/tmp/busytown_viz")
  args = ap.parse_args()

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  import jax.numpy as jnp

  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                  make_params, world_step)

  ids = args.tasks.split(",")
  configs = [_TASKS[t] for t in ids]
  town = load_town(configs[0]["town"])
  params = make_params(town)
  T, E = len(ids), args.episodes

  states = init_scene_batch(
      town, T * E,
      num_vehicles=np.tile(
          np.asarray([int(c.get("num_vehicles", 0)) for c in configs]), E),
      num_pedestrians=np.tile(
          np.asarray([int(c.get("num_pedestrians", 0)) for c in configs]),
          E),
      route_capacity=2048, seed=7,
      spawn_points=np.tile(np.asarray([c["origin"] for c in configs]), E),
      destinations=np.tile(
          np.asarray([c["destination"] for c in configs]), E),
  )

  # Sample hero position every 30 steps to trace the episode.
  SAMPLE = 30

  def rollout(states, num_steps):
    def body(carry, t):
      state, m = carry
      active = m["active"]
      actions, state = jax.vmap(
          lambda s: autopilot_policy(params, s))(state)
      frozen = jnp.asarray([0.0, 0.0, 1.0])
      actions = jnp.where(active[:, None], actions, frozen[None, :])
      new_state = jax.vmap(world_step, in_axes=(None, 0, 0))(
          params, state, actions)
      collided = (new_state.collision > 0.0) & active
      arrived = (jnp.linalg.norm(
          new_state.hero_xy - new_state.destination_xy,
          axis=-1) < 7.5) & active
      m = {
          "collided": m["collided"] | collided,
          "success": m["success"] | arrived,
          "active": active & ~collided & ~arrived,
      }
      trace = (new_state.hero_xy, new_state.hero_speed)
      return (new_state, m), trace

    B = states.hero_xy.shape[0]
    m0 = {"collided": jnp.zeros(B, bool), "success": jnp.zeros(B, bool),
          "active": jnp.ones(B, bool)}
    (final, m), (trace_xy, trace_v) = jax.lax.scan(
        body, (states, m0), jnp.arange(num_steps))
    return final, m, trace_xy[::SAMPLE], trace_v

  run = jax.jit(lambda s: rollout(s, args.horizon))
  final, m, trace_xy, trace_v = jax.device_get(run(states))

  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  from matplotlib.patches import Rectangle
  from matplotlib.transforms import Affine2D

  os.makedirs(args.out, exist_ok=True)
  succ = np.asarray(m["success"])
  coll = np.asarray(m["collided"])
  L, W = float(params.vehicle.length), float(params.vehicle.width)
  routes = np.asarray(final.route)
  route_len = np.asarray(final.route_len)
  task_ids = np.tile(np.arange(T), E)

  def draw_box(ax, xy, yaw, color, alpha=0.9):
    tr = (Affine2D().rotate(yaw).translate(*xy) + ax.transData)
    ax.add_patch(Rectangle((-L / 2, -W / 2), L, W, facecolor=color,
                           edgecolor="k", lw=0.5, alpha=alpha,
                           transform=tr))
    ax.arrow(xy[0], xy[1], 2.0 * np.cos(yaw), 2.0 * np.sin(yaw),
             head_width=0.5, color="k", lw=0.5)

  for i in range(len(succ)):
    tag = "succ" if succ[i] else ("coll" if coll[i] else "timeout")
    v = np.asarray(trace_v)[:, i]
    print(f"{ids[task_ids[i]]} ep{i // T}: {tag:8s} "
          f"mean_v {v.mean():4.2f} frac<1 {np.mean(v < 1.0):5.1%} "
          f"frac 1-3 {np.mean((v >= 1.0) & (v < 3.0)):5.1%}")
    if tag != "timeout":
      continue
    hx, hy = np.asarray(final.hero_xy[i])
    fig, ax = plt.subplots(figsize=(7, 7))
    ext = (town.raster_origin[0],
           town.raster_origin[0] + town.road_mask.shape[0] / town.raster_ppm,
           town.raster_origin[1],
           town.raster_origin[1] + town.road_mask.shape[1] / town.raster_ppm)
    ax.imshow(town.road_mask.T, origin="lower", cmap="gray", extent=ext)
    r = routes[i][:route_len[i]]
    pts = town.wp_xy[r]
    ax.plot(pts[:, 0], pts[:, 1], "c-", lw=1.2, alpha=0.7)
    tr = np.asarray(trace_xy)[:, i]
    ax.plot(tr[:, 0], tr[:, 1], "y.-", lw=0.8, ms=2, alpha=0.8)
    draw_box(ax, (hx, hy), float(final.hero_yaw[i]), "tab:red")
    npc_xy = np.asarray(final.npc_xy[i])
    npc_yaw = np.asarray(final.npc_yaw[i])
    alive = np.asarray(final.npc_alive[i])
    spd = np.asarray(final.npc_speed[i])
    d = np.linalg.norm(npc_xy - [hx, hy], axis=-1)
    for j in np.where(alive & (d < 40))[0]:
      draw_box(ax, npc_xy[j], npc_yaw[j], "tab:blue", alpha=0.7)
      ax.annotate(f"{spd[j]:.1f}", npc_xy[j], fontsize=6)
    ax.set_xlim(hx - 40, hx + 40)
    ax.set_ylim(hy - 40, hy + 40)
    ax.set_title(f"{ids[task_ids[i]]} ep{i // T} timeout "
                 f"v_end={float(final.hero_speed[i]):.1f}")
    fn = os.path.join(args.out,
                      f"timeout_{ids[task_ids[i]]}_{i}.png")
    fig.savefig(fn, dpi=110)
    plt.close(fig)
    print("  wrote", fn)


if __name__ == "__main__":
  main()
