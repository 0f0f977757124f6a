"""Homomorphic circuit runner: execute mapped ``.lbf`` programs under TFHE.

The executable counterpart the reference never ships (it stops at emitting
``.lbf`` files and estimating their cost through Concrete; SURVEY.md §2
C18).  This runner loads or maps a circuit, encrypts random (or provided)
inputs, executes every lincomb/bootstrap level batched on the device,
decrypts, and verifies bit-exactness against the cleartext oracle.

    python -m tfhe_fbs_map_tpu.runtime circuit.lbf --batch 16
    python -m tfhe_fbs_map_tpu.runtime circuit.blif --map --fbs_size 4
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="Execute a mapped FBS circuit homomorphically")
    ap.add_argument("filename", help=".lbf program or circuit to map")
    ap.add_argument("--map", action="store_true",
                    help="input is a source circuit: map it first")
    ap.add_argument("--type", default="blif",
                    choices=["blif", "bristol", "bench"])
    ap.add_argument("--unroll_frames", type=int, default=10,
                    help="time frames for sequential .bench circuits "
                         "(matches the mapping CLI default)")
    ap.add_argument("--mapper", default="search",
                    choices=["basic", "naive", "search", "search+", "best"])
    ap.add_argument("--fbs_size", type=int, default=None,
                    help="FBS size (default: from --params or 4)")
    ap.add_argument("--batch", type=int, default=8,
                    help="number of circuit evaluations in parallel")
    ap.add_argument("--keys", help="key checkpoint (.npz); generated if absent")
    ap.add_argument("--save-keys", help="write generated keys here")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--checkpoint", default=None,
                    help=".npz path: snapshot the wire buffer every few "
                         "levels and resume an interrupted run from it")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the circuit this many times; report the last "
                         "(steady-state, compile cache warm)")
    ap.add_argument("--test-params", action="store_true",
                    help="use the small insecure test parameter set")
    ap.add_argument("--p-error", type=float, default=None,
                    help="per-bootstrap error-probability target for the "
                         "parameter optimizer (default: the reference "
                         "pipeline's 4-sigma, ~6.3e-5 — at that target a "
                         "run of B bootstraps EXPECTS ~6e-5*B bit flips; "
                         "use e.g. 1e-9 for bit-exactness claims)")
    ap.add_argument("--mesh", default=None, metavar="DP,TP",
                    help="run the executor mesh-parallel: 'DP,TP' device "
                         "counts (e.g. 4,2), 'DP' (tp=1), or 'auto' (all "
                         "devices on dp).  dp shards the evaluation batch; "
                         "tp shards the matmul-orientation key contraction")
    ap.add_argument("--orientation", default="auto",
                    choices=["auto", "fused", "fused_otf", "matmul",
                             "keys_lhs", "keys_lhs_bf16", "keys_rhs",
                             "generic"],
                    help="bootstrap kernel path (auto: fused Pallas on TPU "
                         "— streamed key matrices when they fit HBM, "
                         "on-the-fly tiles otherwise; generic on CPU)")
    args = ap.parse_args(argv)

    from ..frontend.lut_program import parse_lbf
    from ..frontend.mapping.basic import BasicMapper
    from ..frontend.mapping.heuristic import HeuristicMapper
    from ..frontend.parsers import parse_circuit
    from ..optimizer import optimize
    from ..tfhe import TEST_PARAMS, generate_keys
    from ..tfhe.keys import load_keys, save_keys
    from .executor import CircuitExecutor

    # --- obtain the program --------------------------------------------
    circuit = None
    if args.map:
        kw = ({"unroll_frames": args.unroll_frames}
              if args.type == "bench" else {})
        circuit = parse_circuit(args.filename, args.type, **kw)
        p = args.fbs_size or 4
        if args.mapper == "basic":
            prog = BasicMapper().map(circuit)
        elif args.mapper == "best":
            from ..frontend.mapping.heuristic import map_best
            prog = map_best(circuit, fbs_size=p)
        else:
            prog = HeuristicMapper(cone_merger=args.mapper,
                                   fbs_size=p).map(circuit)
        prog.remove_dangling_nodes()
    else:
        prog = parse_lbf(open(args.filename).read())

    stats = prog.stats()
    # the FBS size the mapper targeted: recorded in the .lbf (our superset
    # stanza), else the smallest p at which every table is realizable —
    # max_lut_size//2 alone is NOT enough, negacyclic half-tables are tied
    # to the exact mapping-time p
    p_needed = prog.fbs_size or prog.min_fbs_size()
    print(f"# program: {stats} (p={p_needed})", file=sys.stderr)

    # --- keys -----------------------------------------------------------
    bsk_limbs = 4
    if args.keys:
        keys = load_keys(args.keys)
    else:
        if args.test_params:
            params = TEST_PARAMS.with_p(max(p_needed, TEST_PARAMS.p))
        else:
            kw = ({"max_p_error": args.p_error}
                  if args.p_error is not None else {})
            sol = optimize(max(p_needed, args.fbs_size or p_needed),
                           max(1, stats["norm2_linprod"]), **kw)
            if sol is None:
                print("no parameter set satisfies the error target",
                      file=sys.stderr)
                return 1
            params = sol.params
            bsk_limbs = sol.bsk_limbs  # optimizer-validated quantized BSK
            print(f"# params: {params} (bsk_limbs={bsk_limbs})",
                  file=sys.stderr)
        t0 = time.time()
        keys = generate_keys(params, seed=args.seed)
        print(f"# keygen: {time.time() - t0:.1f}s", file=sys.stderr)
        if args.save_keys:
            save_keys(args.save_keys, keys)

    # --- encrypt / run / decrypt / verify ------------------------------
    rng = np.random.default_rng(args.seed)
    input_names = [n.name for n in prog.nodes if n.kind == "input"]
    values = {name: rng.integers(0, 2, args.batch) for name in input_names}
    oracle = prog.eval(values)

    # --- fast-path selection --------------------------------------------
    fast = None
    if args.orientation != "generic":
        import jax

        from ..optimizer.optimizer import MATMUL_HBM_BUDGET
        from ..ops.blind_rotate import prepare_fast_keys
        pp = keys.params
        k1 = pp.glwe_dim + 1
        mat_bytes = (pp.lwe_dim * (k1 * pp.bsk_level * pp.poly_size)
                     * 4 * k1 * pp.poly_size)
        orient = args.orientation
        if orient == "auto":
            if jax.default_backend() != "tpu" or pp.bsk_base_log > 8:
                orient = None
            elif mat_bytes <= MATMUL_HBM_BUDGET:
                orient = "fused"
            else:
                orient = "fused_otf"
        if orient:
            t0 = time.time()
            kw = ({"bsk_limbs": bsk_limbs}
                  if orient in ("matmul", "fused", "fused_otf") else {})
            fast = prepare_fast_keys(keys, orientation=orient, **kw)
            print(f"# fast keys ({orient}): {time.time() - t0:.1f}s",
                  file=sys.stderr)

    mesh = None
    if args.mesh:
        import jax

        from ..parallel.distributed import global_mesh, init_distributed
        from ..parallel.mesh import make_mesh
        multi = init_distributed()  # no-op single-process; env-driven on pods
        if args.mesh == "auto":
            if multi:
                mesh = global_mesh(tp=1)
            dp, tp = len(jax.devices()), 1
        else:
            parts = [int(x) for x in args.mesh.split(",")]
            dp, tp = (parts + [1])[:2]
        if mesh is None:
            mesh = make_mesh(jax.devices()[:dp * tp], dp=dp, tp=tp)
        if args.batch % dp:
            print(f"--batch {args.batch} must be divisible by dp={dp}",
                  file=sys.stderr)
            return 1
        print(f"# mesh: dp={dp} tp={tp}", file=sys.stderr)

    ex = CircuitExecutor(prog, keys, fast_keys=fast, mesh=mesh)
    t0 = time.time()
    buf0 = ex.encrypt_inputs(values, rng)
    enc_s = time.time() - t0
    run_s = None
    for rep in range(max(1, args.repeat)):
        t0 = time.time()
        # checkpointing only applies to the first run: later repeats are
        # steady-state timing and must not resume from its snapshots
        buf = ex.run(buf0, checkpoint=args.checkpoint if rep == 0 else None)
        _ = np.asarray(buf[:1, :1, -1:])   # force completion
        run_s = time.time() - t0
    got = ex.decrypt_outputs(buf)

    errors = wrong_bits = 0
    for k, want in oracle.items():
        bad = int(np.sum(np.asarray(want) != got[k]))
        if bad:
            errors += 1
            wrong_bits += bad
            print(f"MISMATCH on output {k}: want {np.asarray(want)} "
                  f"got {got[k]}", file=sys.stderr)

    total_boots = ex.num_bootstraps * args.batch
    # honest noise accounting: at the parameter set's per-bootstrap error
    # probability, a run of `total_boots` bootstraps EXPECTS flips — a
    # wrong-bit count at or below that expectation is the noise model
    # working, not a framework bug
    sol_pe = None if args.keys or args.test_params else sol.p_error
    print(json.dumps({
        "bit_exact": errors == 0,
        "wrong_bits": wrong_bits,
        "total_output_bits": len(oracle) * args.batch,
        "expected_flips": (round(sol_pe * total_boots, 3)
                           if sol_pe is not None else None),
        "outputs": len(oracle),
        "levels": len(ex.levels),
        "bootstraps": ex.num_bootstraps,
        "batch": args.batch,
        "mesh": dict(mesh.shape) if mesh is not None else None,
        "encrypt_s": round(enc_s, 3),
        "run_s": round(run_s, 3),
        "boots_per_sec": round(total_boots / run_s, 2) if run_s else None,
    }))
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
