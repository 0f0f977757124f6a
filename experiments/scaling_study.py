"""Data-parallel scaling-efficiency study on the virtual CPU mesh.

Runs ``bench_multichip`` at dp in {1, 2, 4, 8} with a FIXED per-chip batch
(weak scaling: ideal = flat per-chip throughput) and reports

    efficiency(n) = throughput(n) / (n * throughput(1))

Only one real TPU chip is tunneled into this environment, so the committed
number (outputs/scaling_virtual.json) comes from the 8-virtual-device CPU
mesh — the same shard_map/GSPMD code path the real slice would run, with
host cores standing in for chips (no ICI, so this bounds partitioning +
collective-free dp overhead, not interconnect).  North-star >= 80%
(BASELINE.json).

Usage:  python experiments/scaling_study.py [--batch-per-chip 48]
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_point(n_dev: int, batch: int, iters: int, orientation: str,
              pin_cores: int | None = None, tp: int = 1) -> dict:
    cmd = [sys.executable, str(REPO / "experiments" / "bench_multichip.py"),
           "--cpu-devices", str(n_dev), "--batch-per-chip", str(batch),
           "--iters", str(iters), "--orientation", orientation, "--quick",
           "--tp", str(tp)]
    if pin_cores:
        # one host core per virtual device: cores stand in for chips, so
        # weak scaling over the pinned points is a real efficiency number
        cmd = ["taskset", "-c", f"0-{pin_cores - 1}"
               if pin_cores > 1 else "0"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    r = json.loads(line)
    r["pinned_cores"] = pin_cores
    return r


def run_multiprocess(num_procs: int) -> dict:
    """N coordinator-connected jax.distributed processes (2 virtual CPU
    devices each) run one dp-sharded bootstrap on the global mesh, every
    process verifying the decrypted result bit-exactly
    (tests/_distributed_worker.py).  On the 2-core host, procs > 1 is
    core-oversubscribed: recorded as partitioning/collective correctness
    evidence, not throughput."""
    import socket
    import time
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    import os
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = ""
    worker = REPO / "tests" / "_distributed_worker.py"
    t0 = time.time()
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(num_procs), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(num_procs)]
    ok = 0
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        if p.returncode == 0 and f"DISTRIBUTED_OK pid={pid}" in out:
            ok += 1
    return {"metric": "jax_distributed_multiprocess", "procs": num_procs,
            "devices": 2 * num_procs, "ok": ok, "errors": num_procs - ok,
            "wall_s": round(time.time() - t0, 1)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=48)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--orientation", default="fused_otf")
    ap.add_argument("--out", default="outputs/scaling_virtual.json")
    args = ap.parse_args()

    import os
    ncores = os.cpu_count() or 1
    points = []
    for n in (1, 2, 4, 8):
        pin = n if n <= ncores else None
        r = run_point(n, args.batch_per_chip, args.iters, args.orientation,
                      pin_cores=pin)
        assert r["errors"] == 0, f"dp={n}: {r['errors']} decode errors"
        points.append(r)
        print(f"dp={n}: {r['value']} boots/s total "
              f"({r['boots_per_sec_per_chip']}/chip, "
              f"{'pinned ' + str(pin) + ' cores' if pin else 'oversubscribed'})")

    # efficiency over the core-proportional (pinned) points only: one host
    # core stands in for one chip, so weak scaling there is meaningful;
    # oversubscribed points (devices > cores) only demonstrate that the
    # partitioned program keeps total throughput monotone
    base = points[0]["value"]
    pinned = [p for p in points if p["pinned_cores"]]
    effs = {p["devices"]: round(p["value"] / (p["devices"] * base), 3)
            for p in pinned}
    max_pinned = max(effs)

    # tp axis (r5, VERDICT r4 weak #3): the matmul orientation's
    # tp-sharded key contraction at tp=2 on 2 pinned cores, efficiency vs
    # the matmul dp=1 single-device rate on 1 pinned core (weak scaling in
    # the contraction dimension: same per-chip batch)
    tp_pts = []
    try:
        m1 = run_point(1, args.batch_per_chip, args.iters, "matmul",
                       pin_cores=1)
        m2 = run_point(2, args.batch_per_chip, args.iters, "matmul",
                       pin_cores=2, tp=2)
        assert m1["errors"] == 0 and m2["errors"] == 0
        tp_pts = [m1, m2]
        tp_eff = round(m2["value"] / (2 * m1["value"]), 3)
        print(f"tp=2: {m2['value']} boots/s total vs dp=1 {m1['value']} "
              f"-> efficiency {tp_eff}")
    except Exception as e:  # keep the dp study result even if tp fails
        tp_eff = None
        print(f"tp point failed: {e}", file=sys.stderr)

    # multi-process jax.distributed correctness points (2 and 4 processes)
    mp_pts = [run_multiprocess(2), run_multiprocess(4)]
    for mp in mp_pts:
        print(f"procs={mp['procs']}: ok={mp['ok']}/{mp['procs']} "
              f"({mp['wall_s']}s)")
        assert mp["errors"] == 0, mp
    result = {
        "metric": "dp_scaling_efficiency_virtual_mesh",
        "host_cores": ncores,
        "batch_per_chip": args.batch_per_chip,
        "orientation": args.orientation,
        "points": points,
        "efficiency_core_proportional": effs,
        "efficiency": effs[max_pinned],
        "efficiency_devices": max_pinned,
        "oversubscribed_total_boots_per_sec": {
            p["devices"]: p["value"] for p in points
            if not p["pinned_cores"]},
        "tp_points": tp_pts,
        "tp2_efficiency": tp_eff,
        "multiprocess_points": mp_pts,
        "note": "virtual CPU mesh (one real TPU chip tunneled): host cores "
                "stand in for chips on the pinned points; shard_map dp "
                "path, keys replicated, no collectives; tp=2 = GSPMD "
                "matmul orientation with the key contraction sharded "
                "(psum); multiprocess = jax.distributed workers, "
                "correctness evidence on the 2-core host",
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"efficiency": effs, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
