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


def _map_one(args) -> tuple[str, bool]:
    """Re-map one (suite, bench, p, mapper) config; returns (lbf, ok).

    ``ok`` is False on a transient subprocess failure (non-zero exit,
    timeout): the caller must then LEAVE the CSV row's old estimate in
    place instead of clearing it (r4 advisor finding — a flaky run must
    not erase committed estimates)."""
    suite, bench_file, p, mapper, lbf = args
    if Path(lbf).is_file():
        return lbf, True
    cmd = [sys.executable, "-m", "tfhe_fbs_map_tpu.frontend.cli",
           str(bench_file), "--type", SUITE_FORMAT[suite],
           "--fbs_size", str(p), "--mapper", mapper,
           "--output_lbf", str(lbf)]
    if suite in SUITE_OPT:
        cmd.append("--opt")
    try:
        r = subprocess.run(cmd, capture_output=True, cwd=str(REPO),
                           timeout=3600)
    except subprocess.TimeoutExpired:
        print(f"MAP TIMEOUT {bench_file} p={p} {mapper}", file=sys.stderr)
        return lbf, False
    if r.returncode != 0:
        print(f"MAP FAILED {bench_file} p={p} {mapper}: "
              f"{r.stderr.decode()[-200:]}", file=sys.stderr)
        return lbf, False
    return lbf, True


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
    ok_lbf: dict[str, bool] = {}
    with mp.Pool(jobs) as pool:
        for i, (lbf, ok) in enumerate(
                pool.imap_unordered(_map_one, jobs_args)):
            ok_lbf[lbf] = ok
            if (i + 1) % 20 == 0:
                print(f"{suite}: mapped {i + 1}/{len(jobs_args)}")

    from tfhe_fbs_map_tpu.frontend.lut_program import parse_lbf
    from sweep import staged_estimate  # noqa: E402 (shared implementation)
    changed = cleared = kept = 0
    for r in todo:
        p = int(r["fbs_size"])
        lbf = out_dir / f"{r['bench']}_{r['fbs_size']}_{r['mapper']}.lbf"
        old = r["staged_total"]
        # transient remap failure (subprocess error/timeout, missing
        # circuit file): keep the old estimate — only a real
        # staged-infeasibility (ValueError below) may clear it
        if not lbf.is_file() or not ok_lbf.get(str(lbf), True):
            kept += 1
            continue
        try:
            prog = parse_lbf(lbf.read_text())
            nb = prog.stats()["nb_bootstrap"]
            if str(nb) != str(r.get("nb_bootstrap", nb)):
                # nondeterministic remap: refresh the row's native columns
                # from the remapped program so the row stays internally
                # consistent (r4 advisor finding), instead of mixing the
                # old mapping's boot counts with the new mapping's staged
                # estimate
                print(f"{suite}: {r['bench']} p={p} {r['mapper']} remap "
                      f"boots {nb} != CSV {r['nb_bootstrap']} (row "
                      f"refreshed from remap)", file=sys.stderr)
                st = prog.stats()
                r["nb_bootstrap"] = st["nb_bootstrap"]
                r["norm2_linprod"] = st["norm2_linprod"]
                r["max_lut_size"] = st["max_lut_size"]
                try:
                    bc = float(r.get("boot_cost", "nan") or "nan")
                    if bc == bc:
                        r["total_cost"] = round(nb * bc, 1)
                except ValueError:
                    pass
            r["staged_boot_cost"] = r["staged_total"] = ""
            st_cost = staged_estimate(prog, p)
            if st_cost == st_cost:
                r["staged_total"] = st_cost
                r["staged_boot_cost"] = round(st_cost / max(1, nb), 1)
                if str(r["staged_total"]) != old:
                    changed += 1
            else:
                cleared += 1
        except (ValueError, AssertionError):
            r["staged_boot_cost"] = r["staged_total"] = ""
            cleared += 1           # genuinely not staged-realizable
    keys = sorted({k for r in rows for k in r})
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"{suite}: {len(todo)} staged rows -> {changed} changed, "
          f"{cleared} cleared (not staged-realizable), {kept} kept "
          f"(transient remap failure)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", nargs="*", default=list(SWEEPS))
    ap.add_argument("--jobs", type=int, default=2)
    args = ap.parse_args()
    for s in args.suite:
        reestimate(s, args.jobs)


if __name__ == "__main__":
    main()
