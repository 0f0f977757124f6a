"""Headline benchmark: functional bootstraps per second per chip.

Runs the MXU conv fast path (keyswitch → blind rotate → sample extract) on a
batch of independent ciphertexts with ~128-bit parameters, verifies the
decrypted lookups, and prints ONE JSON line:

    {"metric": "bootstraps_per_sec_per_chip", "value": N, "unit": "boots/s",
     "vs_baseline": N/1000}

The baseline (1000 boots/s/chip) is this repo's north-star target
(BASELINE.json); the reference publishes no runtime numbers of its own
(BASELINE.md).
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="tiny params (CPU smoke test)")
    ap.add_argument("--orientation", default="fused",
                    choices=["matmul", "fused", "fused_otf", "keys_lhs",
                             "keys_lhs_bf16", "keys_rhs"])
    ap.add_argument("--bsk-limbs", type=int, default=4,
                    help="key limbs kept (matmul path; 3 = quantized BSK)")
    ap.add_argument("--trace", metavar="LOGDIR", default=None,
                    help="capture a JAX profiler trace of the timed loop")
    ap.add_argument("--preset", default="anchor",
                    choices=["anchor", "p8", "p16", "p32"],
                    help="parameter set: the ~128-bit p=4 anchor, or the "
                         "optimizer's picks for larger FBS sizes "
                         "(p16/p32 need --orientation fused_otf: their key "
                         "matrices exceed HBM)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfhe_fbs_map_tpu.ops.blind_rotate import (functional_bootstrap_fast,
                                                   prepare_fast_keys)
    from tfhe_fbs_map_tpu.tfhe import (TFHEParams, build_test_vector,
                                       decrypt_values, encrypt_values,
                                       generate_keys)

    dev = jax.devices()[0]
    if args.quick:
        params = TFHEParams(p=4, lwe_dim=32, glwe_dim=1, poly_size=128,
                            bsk_level=2, bsk_base_log=7, ksk_level=3,
                            ksk_base_log=4, lwe_noise_std=4.0,
                            glwe_noise_std=4.0)
        args.batch = min(args.batch, 32)
    elif args.preset != "anchor":
        # the parameter optimizer's picks for larger FBS sizes (see
        # optimizer/optimizer.py; values pinned here so the bench is stable)
        if args.preset in ("p16", "p32") and args.orientation == "fused":
            # precomputed key matrices exceed HBM at N >= 1024 — go straight
            # to the compact rotation-strip form instead of the OOM fallback
            args.orientation = "fused_otf"
        # optimize(p, sq_norm2=2) picks — the bench workload is a fresh
        # bootstrap output fed back through an XOR-shaped lincomb (norm2 <=
        # 2); sweep cost estimates re-run the optimizer at each circuit's
        # actual norm2, so these presets only parameterize the bench.
        presets = {
            "p8": (8, 642, 2, 512, 2, 8, 6, 2),
            "p16": (16, 642, 1, 1024, 3, 6, 6, 2),
            "p32": (32, 706, 1, 2048, 3, 7, 7, 2),
        }
        p, n_, k_, N_, bl, bb, kl, kb = presets[args.preset]
        from tfhe_fbs_map_tpu.tfhe.params import min_noise_std_rel
        params = TFHEParams(p=p, lwe_dim=n_, glwe_dim=k_, poly_size=N_,
                            bsk_level=bl, bsk_base_log=bb, ksk_level=kl,
                            ksk_base_log=kb,
                            lwe_noise_std=min_noise_std_rel(n_) * 2.0 ** 32,
                            glwe_noise_std=min_noise_std_rel(k_ * N_)
                            * 2.0 ** 32)
    elif args.orientation in ("matmul", "fused", "fused_otf"):
        # ~128-bit anchor tuned for the s8 matmul path (optimize(4, 2) pick:
        # n=546 at the security-curve noise floor; base 2^8 x 2 levels keeps
        # the precomputed key-matrix limbs at ~10.3 GB in HBM).
        from tfhe_fbs_map_tpu.tfhe.params import min_noise_std_rel
        params = TFHEParams(p=4, lwe_dim=546, glwe_dim=2, poly_size=512,
                            bsk_level=2, bsk_base_log=8, ksk_level=4,
                            ksk_base_log=3,
                            lwe_noise_std=min_noise_std_rel(546) * 2.0 ** 32,
                            glwe_noise_std=min_noise_std_rel(1024)
                            * 2.0 ** 32)
    else:
        # ~128-bit anchor: kN = 1024 GLWE, n = 630 LWE (see tfhe/params.py)
        params = TFHEParams(p=4, lwe_dim=630, glwe_dim=2, poly_size=512,
                            bsk_level=3, bsk_base_log=7, ksk_level=5,
                            ksk_base_log=3,
                            lwe_noise_std=2.0 ** (32 - 15.0),
                            glwe_noise_std=2.0 ** (32 - 25.0))

    t0 = time.time()
    keys = generate_keys(params, seed=1)
    kw = ({"bsk_limbs": args.bsk_limbs}
          if args.orientation in ("matmul", "fused", "fused_otf") else {})
    try:
        fast = prepare_fast_keys(keys, orientation=args.orientation, **kw)
        _ = np.asarray(fast.bsk_kernels[:1, :1])  # real completion barrier
    except Exception as e:
        if args.orientation not in ("fused", "matmul") \
                or "RESOURCE_EXHAUSTED" not in str(e):
            raise
        # the ~11.9 GB precomputed key matrices did not fit (e.g. residue
        # from a crashed process holding HBM) — the compact-key kernel is
        # the designed fallback
        print(f"# {args.orientation} keys OOM; falling back to fused_otf",
              file=sys.stderr)
        args.orientation = "fused_otf"
        fast = prepare_fast_keys(keys, orientation="fused_otf", **kw)
        _ = np.asarray(fast.bsk_kernels[:1, :1])
    keygen_s = time.time() - t0
    print(f"# keygen done in {keygen_s:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(2)
    # XOR-style workload: lincomb values in [0,2], table [1,0,1]
    values = rng.integers(0, 3, args.batch)
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector([1, 0, 1], params)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (args.batch, params.poly_size))
    posts = jnp.full((args.batch,), np.int32(post))

    # warmup / compile
    t0 = time.time()
    out = functional_bootstrap_fast(fast, cts, tvs, posts)
    _ = np.asarray(out[:1, -1:])  # real completion barrier
    compile_s = time.time() - t0
    print(f"# compile+first-run {compile_s:.1f}s", file=sys.stderr)

    # correctness gate: the bench only counts verified bootstraps
    got = decrypt_values(keys, out)
    want = np.asarray([1, 0, 1])[values]
    n_bad = int(np.sum(got != want))
    if n_bad:
        print(f"CORRECTNESS FAILURE: {n_bad}/{args.batch} wrong",
              file=sys.stderr)

    import contextlib

    from tfhe_fbs_map_tpu.utils.profiling import jax_trace
    trace_cm = jax_trace(args.trace) if args.trace \
        else contextlib.nullcontext()
    t0 = time.time()
    with trace_cm:
        for _ in range(args.iters):
            out = functional_bootstrap_fast(fast, out, tvs, posts)
        # force completion with a host readback: block_until_ready is not
        # reliable on the tunneled axon backend
        _ = np.asarray(out[:1, -1:])
    elapsed = time.time() - t0

    # verify the timed loop too (f(x) = table[x] = 1-x on {0,1}: the chain
    # alternates), so every counted bootstrap is correctness-gated
    got_final = decrypt_values(keys, out)
    want_final = want if args.iters % 2 == 0 else 1 - want
    n_bad += int(np.sum(got_final != want_final))
    if n_bad:
        print(f"CORRECTNESS FAILURE (timed loop): {n_bad} wrong",
              file=sys.stderr)

    boots_per_sec = args.batch * args.iters / elapsed
    result = {
        "metric": "bootstraps_per_sec_per_chip",
        "value": round(boots_per_sec, 2),
        "unit": "boots/s",
        "vs_baseline": round(boots_per_sec / 1000.0, 3),
        "batch": args.batch,
        "params": {"n": params.lwe_dim, "k": params.glwe_dim,
                   "N": params.poly_size, "l_bsk": params.bsk_level,
                   "p": params.p},
        "device": str(dev),
        "keygen_s": round(keygen_s, 2),
        "compile_s": round(compile_s, 2),
        "ms_per_bootstrap": round(1000.0 * elapsed
                                  / (args.batch * args.iters), 4),
        "errors": n_bad,
    }
    print(json.dumps(result))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
