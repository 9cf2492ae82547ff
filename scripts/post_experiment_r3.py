"""Publishes round-3 experiment artifacts into docs/results_r3.

Copies the agent tables, per-family breakdowns, and training logs from
RUN_OUT (scripts/experiment_r3.py) into the repo, and renders the
markdown panels used by README.md: the CARNOVEL (shift) and CoRL2017
(in-distribution) agent tables with 95% CIs and collision/timeout
decomposition.
"""

import json
import os
import shutil

OUT = os.environ.get("RUN_OUT", "/tmp/oatpu_r3")
DOCS = os.path.join(os.path.dirname(__file__), "..", "docs", "results_r3")

POLICY_LABELS = {
    "autopilot": "Autopilot (expert)",
    "cil": "CIL",
    "dim": "DIM",
    "rip_wcm": "RIP-WCM",
    "rip_ma": "RIP-MA",
    "rip_bcm": "RIP-BCM",
}


def fmt_pct(x, ci=None):
  if ci is None:
    return "{:.1f}%".format(100 * x)
  return "{:.1f}% ± {:.1f}".format(100 * x, 100 * ci)


def render_table(suite_name, rows):
  lines = [
      "| Agent | Success | Collision | Timeout | Episodes |",
      "|---|---|---|---|---|",
  ]
  for name, s in rows.items():
    lines.append("| {} | {} | {} | {} | {} |".format(
        POLICY_LABELS.get(name, name),
        fmt_pct(s["success_rate"], s.get("success_ci95")),
        fmt_pct(s["collision_rate"]),
        fmt_pct(s["timeout_rate"]),
        s["episodes"]))
  return "### {}\n\n".format(suite_name) + "\n".join(lines) + "\n"


def render_families(title, per_family):
  lines = [
      "| Family | Success | Collision | Timeout |",
      "|---|---|---|---|",
  ]
  for fam, s in per_family.items():
    lines.append("| {} | {} | {} | {} |".format(
        fam, fmt_pct(s["success_rate"], s.get("success_ci95")),
        fmt_pct(s["collision_rate"]), fmt_pct(s["timeout_rate"])))
  return "#### {} per family\n\n".format(title) + "\n".join(lines) + "\n"


def main():
  import glob
  os.makedirs(DOCS, exist_ok=True)
  # Merge all tables*.json (split eval processes write separate files).
  tables = {}
  for path in sorted(glob.glob(os.path.join(OUT, "tables*.json"))):
    for suite, rows in json.load(open(path)).items():
      tables.setdefault(suite, {}).update(rows)
  with open(os.path.join(DOCS, "tables.json"), "w") as fp:
    json.dump(tables, fp, indent=2)

  for log_name in ("rip/logs/rip_train.jsonl", "cil/logs/cil_train.jsonl"):
    src = os.path.join(OUT, log_name)
    if os.path.exists(src):
      shutil.copy(src, os.path.join(DOCS, os.path.basename(log_name)))

  # Full per-task results for the headline policies.
  for key in ("carnovel_rip_wcm", "carnovel_cil", "corl2017_autopilot",
              "corl2017_cil", "corl2017_dim", "corl2017_rip_wcm"):
    src = os.path.join(OUT, key, "summary.json")
    if os.path.exists(src):
      shutil.copy(src, os.path.join(DOCS, key + ".json"))

  md = ["# Round-3 agent results\n"]
  for suite, label in (("carnovel",
                        "CARNOVEL (distribution shift, Towns 03-05)"),
                       ("corl2017",
                        "CoRL2017 (in-distribution, Towns 01-02)")):
    if suite in tables:
      md.append(render_table(label, tables[suite]))
      # Per-family panel from the best learned agent's summary.
      for name in ("rip_wcm", "dim", "autopilot"):
        src = os.path.join(OUT, "{}_{}".format(suite, name),
                           "summary.json")
        if name in tables[suite] and os.path.exists(src):
          fam = json.load(open(src))["summary"].get("per_family")
          if fam:
            md.append(render_families(
                "{} ({})".format(label.split(" ")[0],
                                 POLICY_LABELS.get(name, name)), fam))
          break
  with open(os.path.join(DOCS, "RESULTS.md"), "w") as fp:
    fp.write("\n".join(md))
  print("wrote", os.path.join(DOCS, "RESULTS.md"))
  print("\n".join(md))


if __name__ == "__main__":
  main()
