"""Recompute the staged-pipeline estimate columns of the suite CSVs.

The staged cost model gained the f1-wire-variance correction
(optimizer/optimizer.py ``wires_from_stage2``; runtime/cli.py routing
probe): rows whose programs route any node as a fam1 single were
estimated against fam2's (cleaner) fresh-bootstrap wire variance and are
optimistic.  This driver re-maps exactly the configs with a
``staged_total`` value (the sweep's per-config ``.lbf`` artifacts are
regenerable and routinely pruned), re-probes them, and rewrites
``staged_boot_cost``/``staged_total`` under the corrected bound.

Usage::

    python experiments/reestimate_staged.py [--suite iscas85 ...] [--jobs 2]
"""

from __future__ import annotations

import argparse
import csv
import multiprocessing as mp
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sweep import SUITE_FORMAT, SUITE_OPT, SWEEPS  # noqa: E402

BENCH_DIRS = {s: REPO / "benchmarks" / s for s in SWEEPS}


def _map_one(args) -> tuple[str, str]:
    """Re-map one (suite, bench, p, mapper) config; returns (key, lbf)."""
    suite, bench_file, p, mapper, lbf = args
    if Path(lbf).is_file():
        return mapper, lbf
    cmd = [sys.executable, "-m", "tfhe_fbs_map_tpu.frontend.cli",
           str(bench_file), "--type", SUITE_FORMAT[suite],
           "--fbs_size", str(p), "--mapper", mapper,
           "--output_lbf", str(lbf)]
    if suite in SUITE_OPT:
        cmd.append("--opt")
    r = subprocess.run(cmd, capture_output=True, cwd=str(REPO))
    if r.returncode != 0:
        print(f"MAP FAILED {bench_file} p={p} {mapper}: "
              f"{r.stderr.decode()[-200:]}", file=sys.stderr)
    return mapper, lbf


def reestimate(suite: str, jobs: int) -> None:
    csv_path = REPO / "outputs" / f"{suite}_agg_est.csv"
    rows = list(csv.DictReader(open(csv_path)))
    todo = [r for r in rows if r.get("staged_total", "")]
    if not todo:
        print(f"{suite}: no staged rows")
        return
    out_dir = REPO / "outputs" / suite
    out_dir.mkdir(parents=True, exist_ok=True)
    jobs_args = []
    for r in todo:
        bench_file = None
        for ext in (".blif", ".bench", ".txt"):
            cand = BENCH_DIRS[suite] / (r["bench"] + ext)
            if cand.is_file():
                bench_file = cand
                break
        if bench_file is None:
            print(f"{suite}: no circuit file for {r['bench']}, skipping",
                  file=sys.stderr)
            continue
        lbf = out_dir / f"{r['bench']}_{r['fbs_size']}_{r['mapper']}.lbf"
        jobs_args.append((suite, bench_file, int(r["fbs_size"]),
                          r["mapper"], str(lbf)))
    with mp.Pool(jobs) as pool:
        for i, _ in enumerate(pool.imap_unordered(_map_one, jobs_args)):
            if (i + 1) % 20 == 0:
                print(f"{suite}: mapped {i + 1}/{len(jobs_args)}")

    from tfhe_fbs_map_tpu.frontend.lut_program import parse_lbf
    from tfhe_fbs_map_tpu.optimizer.optimizer import optimize_staged
    from tfhe_fbs_map_tpu.runtime.executor import staged_probe
    smemo: dict[tuple, float] = {}
    changed = cleared = 0
    for r in todo:
        p = int(r["fbs_size"])
        lbf = out_dir / f"{r['bench']}_{r['fbs_size']}_{r['mapper']}.lbf"
        old = r["staged_total"]
        r["staged_boot_cost"] = r["staged_total"] = ""
        if not lbf.is_file():
            cleared += 1
            continue
        try:
            prog = parse_lbf(lbf.read_text())
            nb = prog.stats()["nb_bootstrap"]
            if str(nb) != str(r.get("nb_bootstrap", nb)):
                print(f"{suite}: {r['bench']} p={p} {r['mapper']} remap "
                      f"boots {nb} != CSV {r['nb_bootstrap']} (keeping "
                      f"remap)", file=sys.stderr)
            eff1, eff2, routes = staged_probe(prog, p)
            w1 = routes["f1"] + routes["split"]
            w2 = routes["f2"] + routes["split"]
            n_boots = max(1, sum(routes.values()))
            wfs2 = routes["f1"] == 0
            skey = (p, eff1, eff2, w1, w2, wfs2)
            if skey not in smemo:
                ssol = optimize_staged(p, eff1, eff2, weight1=w1,
                                       weight2=w2, wires_from_stage2=wfs2)
                if ssol is None:
                    ssol = optimize_staged(p, eff1, eff2, weight1=w1,
                                           weight2=w2, big_dim=2048,
                                           wires_from_stage2=wfs2)
                smemo[skey] = round(ssol.cost, 1) if ssol else float("nan")
            if smemo[skey] == smemo[skey]:
                r["staged_total"] = smemo[skey]
                r["staged_boot_cost"] = round(smemo[skey] / n_boots, 1)
                if str(r["staged_total"]) != old:
                    changed += 1
            else:
                cleared += 1
        except (ValueError, AssertionError):
            cleared += 1           # no longer staged-realizable
    keys = sorted({k for r in rows for k in r})
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"{suite}: {len(todo)} staged rows -> {changed} changed, "
          f"{cleared} cleared (no longer cheaper path exists or map "
          f"failed)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", nargs="*", default=list(SWEEPS))
    ap.add_argument("--jobs", type=int, default=2)
    args = ap.parse_args()
    for s in args.suite:
        reestimate(s, args.jobs)


if __name__ == "__main__":
    main()
