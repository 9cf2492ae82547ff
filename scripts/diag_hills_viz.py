"""Render the Hills crash scenes: for each collision episode, draw the
road mask around the crash point with the hero box, the nearest NPC
boxes and their headings, plus hero route context — to see WHAT the
hero actually hits on the switchbacks.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--episodes", type=int, default=10)
  ap.add_argument("--horizon", type=int, default=1500)
  ap.add_argument("--family", default="Hills")
  ap.add_argument("--platform", default=None)
  ap.add_argument("--out", default="/tmp/hills_viz")
  ap.add_argument("--max-plots", type=int, default=12)
  args = ap.parse_args()

  import jax
  if args.platform:
    jax.config.update("jax_platforms", args.platform)
  import jax.numpy as jnp

  from oatomobile_tpu.benchmarks.carnovel.benchmark import _TASKS
  from oatomobile_tpu.maps import load_town
  from oatomobile_tpu.sim import (autopilot_policy, init_scene_batch,
                                  make_params, world_step)

  tasks = {t: c for t, c in sorted(_TASKS.items())
           if t.startswith(args.family)}
  ids = sorted(tasks)
  configs = [tasks[t] for t in ids]
  town_name = configs[0]["town"]
  town = load_town(town_name)
  params = make_params(town)
  T, E = len(ids), args.episodes

  states = init_scene_batch(
      town, T * E,
      num_vehicles=np.tile(
          np.asarray([int(c.get("num_vehicles", 0)) for c in configs]), E),
      num_pedestrians=np.tile(
          np.asarray([int(c.get("num_pedestrians", 0)) for c in configs]),
          E),
      route_capacity=2048,
      seed=7,
      spawn_points=np.tile(np.asarray([c["origin"] for c in configs]), E),
      destinations=np.tile(
          np.asarray([c["destination"] for c in configs]), E),
  )

  def rollout(states, num_steps):
    def body(carry, _):
      state, m = carry
      active = m["active"]
      pre = state
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
      first = collided & ~m["collided"]
      snap = {
          "hero_xy": pre.hero_xy, "hero_yaw": pre.hero_yaw,
          "npc_xy": pre.npc_xy, "npc_yaw": pre.npc_yaw,
          "npc_alive": pre.npc_alive, "npc_speed": pre.npc_speed,
          "route_pos": pre.route_pos,
          "hero_speed": pre.hero_speed,
      }
      crash = {k: jnp.where(
          first.reshape((-1,) + (1,) * (snap[k].ndim - 1)), snap[k],
          m["crash"][k]) for k in snap}
      m = {
          "collided": m["collided"] | collided,
          "success": m["success"] | arrived,
          "active": active & ~collided & ~arrived,
          "crash": crash,
      }
      return (new_state, m), None

    B = states.hero_xy.shape[0]
    snap0 = {
        "hero_xy": states.hero_xy, "hero_yaw": states.hero_yaw,
        "npc_xy": states.npc_xy, "npc_yaw": states.npc_yaw,
        "npc_alive": states.npc_alive, "npc_speed": states.npc_speed,
        "route_pos": states.route_pos,
        "hero_speed": states.hero_speed,
    }
    m0 = {
        "collided": jnp.zeros(B, bool),
        "success": jnp.zeros(B, bool),
        "active": jnp.ones(B, bool),
        "crash": jax.tree.map(jnp.zeros_like, snap0),
    }
    (final, m), _ = jax.lax.scan(body, (states, m0), None, length=num_steps)
    return final, m

  run = jax.jit(lambda s: rollout(s, args.horizon))
  final, m = jax.device_get(run(states))

  import matplotlib
  matplotlib.use("Agg")
  import matplotlib.pyplot as plt
  from matplotlib.patches import Rectangle
  from matplotlib.transforms import Affine2D

  os.makedirs(args.out, exist_ok=True)
  coll = np.asarray(m["collided"])
  crash = {k: np.asarray(v) for k, v in m["crash"].items()}
  routes = np.asarray(final.route)
  route_len = np.asarray(final.route_len)
  L, W = float(params.vehicle.length), float(params.vehicle.width)

  def draw_box(ax, xy, yaw, color, alpha=0.9):
    tr = (Affine2D().rotate(yaw).translate(*xy) + ax.transData)
    ax.add_patch(Rectangle((-L / 2, -W / 2), L, W, facecolor=color,
                           edgecolor="k", lw=0.5, alpha=alpha,
                           transform=tr))
    dx, dy = np.cos(yaw), np.sin(yaw)
    ax.arrow(xy[0], xy[1], 2.5 * dx, 2.5 * dy, head_width=0.6,
             color="k", lw=0.5)

  made = 0
  task_ids = np.tile(np.arange(T), E)
  for i in np.where(coll)[0]:
    if made >= args.max_plots:
      break
    hx, hy = crash["hero_xy"][i]
    fig, ax = plt.subplots(figsize=(7, 7))
    ext = (town.raster_origin[0],
           town.raster_origin[0] + town.road_mask.shape[0] / town.raster_ppm,
           town.raster_origin[1],
           town.raster_origin[1] + town.road_mask.shape[1] / town.raster_ppm)
    ax.imshow(town.road_mask.T, origin="lower", cmap="gray", extent=ext)
    r = routes[i][:route_len[i]]
    pts = town.wp_xy[r]
    ax.plot(pts[:, 0], pts[:, 1], "c-", lw=1.0, alpha=0.6)
    rp = int(crash["route_pos"][i])
    ax.plot(pts[max(rp - 5, 0):rp + 8, 0], pts[max(rp - 5, 0):rp + 8, 1],
            "c.-", lw=2.0)
    draw_box(ax, (hx, hy), crash["hero_yaw"][i], "tab:red")
    d = np.linalg.norm(crash["npc_xy"][i] - np.array([hx, hy]), axis=-1)
    for j in np.argsort(d)[:8]:
      if not crash["npc_alive"][i][j] or d[j] > 30:
        continue
      draw_box(ax, crash["npc_xy"][i][j], crash["npc_yaw"][i][j],
               "tab:blue", alpha=0.7)
      ax.annotate(f"{crash['npc_speed'][i][j]:.1f}",
                  crash["npc_xy"][i][j], fontsize=7)
    ax.set_xlim(hx - 25, hx + 25)
    ax.set_ylim(hy - 25, hy + 25)
    ax.set_title(f"{ids[task_ids[i]]} ep{i // T} hero_v="
                 f"{crash['hero_speed'][i]:.1f}")
    fn = os.path.join(args.out, f"crash_{ids[task_ids[i]]}_{i}.png")
    fig.savefig(fn, dpi=110)
    plt.close(fig)
    made += 1
    print("wrote", fn)


if __name__ == "__main__":
  main()
