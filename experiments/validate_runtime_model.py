"""Validate the launch-aware runtime model against committed hardware runs.

For every ``outputs/tpu_runs/*.json`` whose program (.lbf) is available,
recompute the parameter solution the runtime CLI would pick, predict the
per-eval runtime with ``optimizer/runtime_model.py`` at the run's batch,
and compare against the measured seconds.  Writes
``outputs/runtime_model_validation.json`` and prints a table.

The VERDICT r4 acceptance bar: model-vs-measured within ~25% on the
calibration points (Kreyvium staged/native, p32 bench staged/native).

Usage::

    python experiments/validate_runtime_model.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# run-name aliases -> lbf path (relative to outputs/)
ALIASES = {
    "kreyvium_native_10": "generated/kreyvium_stream_v1_10_search.lbf",
    "kreyvium_staged2_10": "generated/kreyvium_stream_v1_10_search.lbf",
    "kreyvium_stream_v1_10": "generated/kreyvium_stream_v1_10_search.lbf",
    "kreyvium_stream_v1_3": "generated/kreyvium_stream_v1_3_best.lbf",
    "s9234r_22_native": "iscas89/s9234r_22_search.lbf",
    "s9234r_22_staged": "iscas89/s9234r_22_search.lbf",
}


def find_lbf(name: str) -> Path | None:
    out = REPO / "outputs"
    if name in ALIASES:
        p = out / ALIASES[name]
        return p if p.is_file() else None
    for suite in ("iscas85", "iscas89", "generated", "bristol", "epfl"):
        for suffix in ("search", "searchdc", "best"):
            p = out / suite / f"{name}_{suffix}.lbf"
            if p.is_file():
                return p
    return None


def main() -> int:
    from tfhe_fbs_map_tpu.frontend.lut_program import parse_lbf
    from tfhe_fbs_map_tpu.optimizer import optimize
    from tfhe_fbs_map_tpu.optimizer.runtime_model import (predict_native_us,
                                                          predict_staged_us)
    from tfhe_fbs_map_tpu.runtime.executor import (native_level_boots,
                                                   staged_level_routes)
    sys.path.insert(0, str(REPO / "experiments"))
    from sweep import staged_solution

    rows = []
    for f in sorted((REPO / "outputs" / "tpu_runs").glob("*.json")):
        try:
            r = json.loads(f.read_text().splitlines()[-1])
        except (ValueError, IndexError):
            continue
        if "run_s" not in r or "batch" not in r or not r.get("bit_exact"):
            continue
        lbf = find_lbf(f.stem)
        if lbf is None:
            continue
        prog = parse_lbf(lbf.read_text())
        stats = prog.stats()
        p = prog.fbs_size or prog.min_fbs_size()
        meas_ms = r["run_s"] / r["batch"] * 1e3
        try:
            if r.get("staged"):
                ssol = staged_solution(prog, p)
                if ssol is None:
                    continue
                pred_us = predict_staged_us(ssol,
                                            staged_level_routes(prog, p),
                                            r["batch"])
            else:
                sol = optimize(p, max(1, stats["norm2_linprod"]))
                if sol is None:
                    continue
                pred_us = predict_native_us(sol, native_level_boots(prog),
                                            r["batch"])
        except (ValueError, AssertionError) as e:
            print(f"# {f.stem}: {e}", file=sys.stderr)
            continue
        rows.append(dict(run=f.stem, staged=bool(r.get("staged")),
                         batch=r["batch"], p=p,
                         boots=stats["nb_bootstrap"],
                         measured_ms=round(meas_ms, 2),
                         predicted_ms=round(pred_us / 1e3, 2),
                         ratio=round(pred_us / 1e3 / meas_ms, 3)))
    out = REPO / "outputs" / "runtime_model_validation.json"
    out.write_text(json.dumps(dict(rows=rows), indent=1) + "\n")
    print(f"| run | staged | batch | boots | measured ms | predicted ms "
          f"| pred/meas |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['run']} | {r['staged']} | {r['batch']} | {r['boots']} "
              f"| {r['measured_ms']} | {r['predicted_ms']} "
              f"| {r['ratio']} |")
    within = [r for r in rows if 0.75 <= r["ratio"] <= 1.33]
    print(f"# {len(within)}/{len(rows)} within 25-33%", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
