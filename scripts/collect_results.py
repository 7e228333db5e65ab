"""Collect the per-robot quality table from campaign logs.

Each campaign log ends (on success) with one or two JSON lines:
the urdf stage's {"urdf", "links", "dof"} and the evaluate stage's
{"dir_mean", "pos_mean", "chamfer_mean", ...} (single-line runs emit a
merged {"urdf", "dof", "dir_err_deg", ...}).  This tool parses whichever
form is present and prints a markdown table, so RESULTS.md refreshes are
one command:

    python scripts/collect_results.py wx200_5 ur5_rb franka_rb ...
"""

from __future__ import annotations

import json
import os
import re
import sys

LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "campaign_logs")


def parse_log(name: str) -> dict | None:
    path = os.path.join(LOG, f"{name}.log")
    if not os.path.exists(path):
        return None
    out: dict = {"name": name}
    for line in open(path, errors="replace"):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "links" in d or "urdf" in d:
            out.update({k: d[k] for k in ("links", "dof") if k in d})
        if "dir_err_deg" in d:  # merged single-line form
            out.update(dir_mean=d["dir_err_deg"], pos_mean=d["pos_err_m"],
                       matched=d.get("matched"), total=d.get("total"),
                       dir_complete=d.get("dir_mean_complete"),
                       resim=d.get("chamfer"), floor=d.get("chamfer_floor"))
        if "dir_mean" in d:
            out.update(dir_mean=d["dir_mean"], pos_mean=d["pos_mean"],
                       matched=d.get("matched"), total=d.get("total"),
                       dir_complete=d.get("dir_mean_complete"),
                       resim=d.get("chamfer_mean"),
                       floor=d.get("chamfer_floor"))
    return out if "dir_mean" in out else None


def fmt(r: dict) -> str:
    links = r.get("links", "?")
    dof = r.get("dof", "?")
    m, t = r.get("matched"), r.get("total")
    cov = f" ({m}/{t})" if m is not None and m != t else ""
    resim = f"{r['resim']:.4f}" if r.get("resim") is not None else "—"
    floor = f"{r['floor']:.4f}" if r.get("floor") is not None else "—"
    return (f"| {r['name']} | {links}/{dof} | {r['dir_mean']:.2f}{cov} | "
            f"{1000 * r['pos_mean']:.1f} | {resim} | {floor} |")


def main():
    names = sys.argv[1:]
    if not names:
        names = sorted(
            re.sub(r"\.log$", "", f) for f in os.listdir(LOG)
            if f.endswith(".log")
        )
    print("| run | links/DoF | axis err (deg) | pos err (mm) "
          "| resim | resim floor |")
    print("|---|---|---|---|---|---|")
    for n in names:
        r = parse_log(n)
        if r:
            print(fmt(r))


if __name__ == "__main__":
    main()
