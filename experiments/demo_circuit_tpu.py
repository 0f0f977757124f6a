"""End-to-end homomorphic circuit demo on real TPU.

Maps a generated benchmark with the search heuristic, executes it under
TFHE with the MXU fast path (batched over many circuit evaluations),
decrypts, and verifies bit-exactness against the cleartext oracle.

    python experiments/demo_circuit_tpu.py --bench aes_sbox --batch 64
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default="aes_sbox")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--fbs_size", type=int, default=4)
    ap.add_argument("--bsk-limbs", type=int, default=4)
    args = ap.parse_args()

    from tfhe_fbs_map_tpu.frontend import HeuristicMapper
    from tfhe_fbs_map_tpu.frontend.circuits import build_bench
    from tfhe_fbs_map_tpu.ops.blind_rotate import prepare_fast_keys
    from tfhe_fbs_map_tpu.runtime.executor import CircuitExecutor
    from tfhe_fbs_map_tpu.tfhe import TFHEParams, generate_keys

    circ = build_bench(args.bench)
    prog = HeuristicMapper(cone_merger="search",
                           fbs_size=args.fbs_size).map(circ)
    prog.remove_dangling_nodes()
    stats = prog.stats()
    print(f"# mapped: {stats}", file=sys.stderr)

    params = TFHEParams(p=args.fbs_size, lwe_dim=630, glwe_dim=2,
                        poly_size=512, bsk_level=2, bsk_base_log=8,
                        ksk_level=5, ksk_base_log=3,
                        lwe_noise_std=2.0 ** 17, glwe_noise_std=2.0 ** 7)
    t0 = time.time()
    keys = generate_keys(params, seed=1)
    fast = prepare_fast_keys(keys, orientation="fused",
                             bsk_limbs=args.bsk_limbs)
    np.asarray(fast.bsk_kernels[:1, :1])  # force
    print(f"# keygen {time.time() - t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(7)
    values = {i.name: rng.integers(0, 2, args.batch) for i in circ.inputs}
    want = circ.eval(values)

    ex = CircuitExecutor(prog, keys, fast_keys=fast)
    buf0 = ex.encrypt_inputs(values, rng)
    t0 = time.time()
    buf = ex.run(buf0)
    np.asarray(buf[:1, :1, -1:])  # force completion
    cold_s = time.time() - t0     # includes per-level-shape compiles
    got = ex.decrypt_outputs(buf)

    t0 = time.time()
    buf = ex.run(buf0)
    np.asarray(buf[:1, :1, -1:])
    run_s = time.time() - t0      # steady state (compile cache warm)

    errors = sum(1 for k in want if not np.all(np.asarray(want[k]) == got[k]))
    total_boots = ex.num_bootstraps * args.batch
    print(json.dumps({
        "bench": args.bench,
        "bit_exact": errors == 0,
        "levels": len(ex.levels),
        "bootstraps_per_eval": ex.num_bootstraps,
        "batch": args.batch,
        "cold_run_s": round(cold_s, 3),
        "run_s": round(run_s, 3),
        "ms_per_circuit_eval": round(1000 * run_s / args.batch, 3),
        "boots_per_sec": round(total_boots / run_s, 1),
        "errors": errors,
    }))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
