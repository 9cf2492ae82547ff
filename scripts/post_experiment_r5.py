"""Publishes round-5 experiment artifacts into docs/results_r5 AND
patches the README results section.

Reads RUN_OUT (scripts/experiment_r5.py), writes docs/results_r5/
{tables.json, RESULTS.md, per-policy summaries, training logs}, and
replaces the block between ``<!-- RESULTS:BEGIN -->`` and
``<!-- RESULTS:END -->`` in README.md with the freshly rendered tables.

VERDICT r4 item 5: every emitted table set now leads with the fidelity
caveat (procedural towns, internally-comparable numbers) — the caveat is
part of the publisher, so no future table can ship without it.
"""

import json
import os
import re
import shutil

OUT = os.environ.get("RUN_OUT", "/root/r5/exp")
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DOCS = os.path.join(ROOT, "docs", "results_r5")

# Emitted above EVERY results table (docs + README).  Keep this the
# single source of truth for the caveat text.
FIDELITY_CAVEAT = (
    "> **Fidelity caveat.** These towns are procedural geometric "
    "analogues of the CARLA maps (`oatomobile_tpu/maps/towns.py`), not "
    "the OpenDrive originals, and the golden-replay test is a "
    "determinism guard, not agreement with held-back CARLA episodes "
    "(no CARLA server exists in this environment). Success/collision/"
    "timeout rates are therefore **internally comparable** — across "
    "agents, rounds, and ablations run in this framework — but are NOT "
    "comparable to the absolute numbers in the CARNOVEL/CoRL2017 "
    "papers, which were measured in CARLA.\n")

POLICY_LABELS = {
    "autopilot": "Autopilot (expert)",
    "cil": "CIL",
    "dim": "DIM",
    "rip_wcm": "RIP-WCM",
    "rip_ma": "RIP-MA",
    "rip_bcm": "RIP-BCM",
}

ORDER = ["autopilot", "cil", "dim", "rip_wcm", "rip_ma", "rip_bcm"]


def fmt_pct(x, ci=None):
  if ci is None:
    return "{:.1f}%".format(100 * x)
  return "{:.1f}% ± {:.1f}".format(100 * x, 100 * ci)


def render_table(suite_name, rows):
  lines = [
      "| Agent | Success | Collision | Timeout | Episodes |",
      "|---|---|---|---|---|",
  ]
  for name in ORDER:
    if name not in rows:
      continue
    s = rows[name]
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


def patch_readme(body: str) -> None:
  readme = os.path.join(ROOT, "README.md")
  text = open(readme).read()
  begin, end = "<!-- RESULTS:BEGIN -->", "<!-- RESULTS:END -->"
  if begin not in text:
    raise SystemExit("README.md lacks the RESULTS markers; add them once.")
  new = re.sub(re.escape(begin) + r".*?" + re.escape(end),
               begin + "\n" + body + end, text, flags=re.S)
  with open(readme, "w") as fp:
    fp.write(new)
  print("patched README.md results section")


def main():
  import glob
  os.makedirs(DOCS, exist_ok=True)
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

  for suite in ("carnovel", "corl2017"):
    for name in ORDER:
      src = os.path.join(OUT, "{}_{}".format(suite, name), "summary.json")
      if os.path.exists(src):
        shutil.copy(src, os.path.join(DOCS,
                                      "{}_{}.json".format(suite, name)))

  md = ["# Round-5 agent results\n",
        FIDELITY_CAVEAT,
        "All numbers measured at the HEAD commit with the batched "
        "on-device evaluator (`benchmarks/batched_eval.py`): CARNOVEL "
        "10 episodes/task, CoRL2017 3 episodes/task, fresh traffic per "
        "episode, 95% binomial CIs.  Learned agents trained on "
        "HEAD-expert data with a benchmark-density traffic mix and "
        "3x stopped-restart oversampling (scripts/experiment_r5.py).\n"]
  for suite, label in (("carnovel",
                        "CARNOVEL (distribution shift, Towns 03-05)"),
                       ("corl2017",
                        "CoRL2017 (in-distribution, Towns 01-02)")):
    if suite in tables:
      md.append(render_table(label, tables[suite]))
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
  body = "\n".join(md[1:]) + "\n"
  with open(os.path.join(DOCS, "RESULTS.md"), "w") as fp:
    fp.write("\n".join(md))
  patch_readme(body)
  print("wrote", os.path.join(DOCS, "RESULTS.md"))


if __name__ == "__main__":
  main()
