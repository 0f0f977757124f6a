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
    ap.add_argument("--native-p32", action="store_true",
                    help="run the p32 preset as ONE N=2048 bootstrap per "
                         "lookup (the pre-r4 path) instead of the staged "
                         "multi-digit pipeline")
    args = ap.parse_args()

    if args.preset == "p32" and not args.native_p32:
        return staged_p32_bench(args)

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
        if args.preset in ("p8", "p16", "p32") and args.orientation == "fused":
            # precomputed key matrices exceed HBM at N >= 1024, and p8's
            # 12.1 GB build sits at the budget edge (a build at that size
            # wedged the tunnel for 45 min, r4) — go straight to the
            # compact rotation-strip form instead of the OOM fallback
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


def staged_p32_bench(args) -> int:
    """p=32 preset: staged multi-digit functional bootstraps (tfhe/staged.py).

    Workload: five random 32-entry LUTs over one shared 5-bit encrypted
    address; each counted bootstrap is a FULL size-32 lookup (stage-1 size-16
    FBS at N=1024 + stage-2 size-8 select at N=512 — vs ONE N=2048 rotation
    on the --native-p32 path).  The five outputs become the next address
    (pre-scaled wire encodings make every lincomb multiplier 1), so the chain
    is decrypt-verified end to end: only correct lookups are counted.

    Parameters are ``optimize_staged(32, 4, 2)``'s pick, pinned for
    stability; the security noise floor comes from the same 128-bit curve as
    every other preset.
    """
    import jax
    import jax.numpy as jnp

    from tfhe_fbs_map_tpu.ops.blind_rotate import (functional_bootstrap_fast,
                                                   prepare_fast_keys)
    from tfhe_fbs_map_tpu.tfhe.encrypt import lwe_phase
    from tfhe_fbs_map_tpu.tfhe.params import TFHEParams, min_noise_std_rel
    from tfhe_fbs_map_tpu.tfhe.pbs import build_test_vector
    from tfhe_fbs_map_tpu.tfhe.staged import (encrypt_wires,
                                              generate_staged_keys,
                                              split_node)

    if args.quick:
        fam1 = TFHEParams(p=16, lwe_dim=16, glwe_dim=1, poly_size=256,
                          bsk_level=3, bsk_base_log=7, ksk_level=4,
                          ksk_base_log=4, lwe_noise_std=2.0,
                          glwe_noise_std=2.0)
        fam2 = TFHEParams(p=8, lwe_dim=16, glwe_dim=2, poly_size=128,
                          bsk_level=3, bsk_base_log=7, ksk_level=4,
                          ksk_base_log=4, lwe_noise_std=2.0,
                          glwe_noise_std=2.0)
        args.batch = min(args.batch, 8)
    else:
        # optimize_staged(32, sq_norm1=4, sq_norm2=2, max_p_error=1e-6) pick
        # (pinned).  The bench gates on errors == 0 over ~5-10k verified
        # lookups, so the preset targets 1e-6 per lookup rather than the
        # sweep pipeline's 4-sigma contract (the 4-sigma pick measured
        # 3247 boots/s with 2/4680 decode errors — PERF.md round 4).
        lwe_std = min_noise_std_rel(674) * 2.0 ** 32
        glwe_std = min_noise_std_rel(1024) * 2.0 ** 32
        fam1 = TFHEParams(p=16, lwe_dim=674, glwe_dim=1, poly_size=1024,
                          bsk_level=3, bsk_base_log=6, ksk_level=7,
                          ksk_base_log=2, lwe_noise_std=lwe_std,
                          glwe_noise_std=glwe_std)
        fam2 = TFHEParams(p=8, lwe_dim=674, glwe_dim=2, poly_size=512,
                          bsk_level=4, bsk_base_log=5, ksk_level=3,
                          ksk_base_log=4, lwe_noise_std=lwe_std,
                          glwe_noise_std=glwe_std)

    p, lanes = 32, 5
    coefs = [1, 2, 4, 8, 16]
    t0 = time.time()
    skeys = generate_staged_keys(p, fam1, fam2, seed=1)
    fast1 = prepare_fast_keys(skeys.keys1, orientation="fused_otf")
    fast2 = prepare_fast_keys(skeys.keys2, orientation="fused_otf")
    _ = np.asarray(fast1.bsk_kernels[:1, :1])
    _ = np.asarray(fast2.bsk_kernels[:1, :1])
    keygen_s = time.time() - t0
    print(f"# staged keygen done in {keygen_s:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(2)
    params_w = skeys.wire_params
    delta_w, delta2 = params_w.delta, skeys.keys2.params.delta
    # role scales: stage-1 wants 2*c_i*delta_w on roles 0-3, stage-2 wants
    # c4*delta_w on role 4 — pre-scaled production makes all multipliers 1
    scales = [2 * c for c in coefs[:4]] + [coefs[4]]
    tables = [rng.integers(0, 2, p).tolist() for _ in range(lanes)]
    splits = [split_node(coefs, 0, t, p) for t in tables]
    assert all(s is not None for s in splits)
    tv1s, post1s, tv2s, post2s = [], [], [], []
    for lane, s in enumerate(splits):
        tv1, post1 = build_test_vector(s.t1, skeys.keys1.params,
                                       out_delta=delta2)
        # lane output is next iteration's role-`lane` wire: emit pre-scaled
        tv2, post2 = build_test_vector(s.t2, skeys.keys2.params,
                                       out_delta=scales[lane] * delta_w)
        tv1s.append(tv1), post1s.append(post1)
        tv2s.append(tv2), post2s.append(post2)

    batch = args.batch
    bits = rng.integers(0, 2, (lanes, batch))
    regs = jnp.stack([jnp.asarray(encrypt_wires(skeys, bits[i], rng,
                                                scale=scales[i]))
                      for i in range(lanes)])          # [5, B, kN+1]

    n1, n2 = skeys.keys1.params.poly_size, skeys.keys2.params.poly_size
    tvs1 = jnp.asarray(np.repeat(np.stack(tv1s), batch, axis=0))  # [5B, N1]
    tvs2 = jnp.asarray(np.repeat(np.stack(tv2s), batch, axis=0))
    posts1 = jnp.asarray(np.repeat(np.asarray(post1s, np.int64)
                                   .astype(np.uint32).astype(np.int32),
                                   batch))
    posts2 = jnp.asarray(np.repeat(np.asarray(post2s, np.int64)
                                   .astype(np.uint32).astype(np.int32),
                                   batch))

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def step(regs):
        lin1 = regs[0] + regs[1] + regs[2] + regs[3]      # [B, d]
        x1 = jnp.tile(lin1, (lanes, 1))                   # [5B, d]
        g = functional_bootstrap_fast(fast1, x1, tvs1, posts1)
        x2 = g + jnp.tile(regs[4], (lanes, 1))
        out = functional_bootstrap_fast(fast2, x2, tvs2, posts2)
        return out.reshape(lanes, batch, -1)

    def model_step(bits):
        addr = sum(bits[i] * coefs[i] for i in range(lanes))
        return np.stack([np.asarray(tables[i])[addr] for i in range(lanes)])

    t0 = time.time()
    regs = step(regs)
    _ = np.asarray(regs[:1, :1, -1:])
    compile_s = time.time() - t0
    print(f"# compile+first-run {compile_s:.1f}s", file=sys.stderr)
    bits = model_step(bits)

    def verify(regs, bits) -> int:
        key = skeys.extracted_key
        phases = np.asarray(lwe_phase(key, regs.reshape(lanes * batch, -1)))
        u = phases.astype(np.uint32).astype(np.float64)
        got = np.round(u / delta_w).astype(np.int64) % (2 * p)
        want = (bits * np.asarray(scales)[:, None]).reshape(-1)
        return int(np.sum(got != want))

    n_bad = verify(regs, bits)
    if n_bad:
        print(f"CORRECTNESS FAILURE: {n_bad}/{lanes * batch} wrong",
              file=sys.stderr)

    import contextlib

    from tfhe_fbs_map_tpu.utils.profiling import jax_trace
    trace_cm = jax_trace(args.trace) if args.trace \
        else contextlib.nullcontext()
    t0 = time.time()
    with trace_cm:
        for _ in range(args.iters):
            regs = step(regs)
        _ = np.asarray(regs[:1, :1, -1:])
    elapsed = time.time() - t0
    for _ in range(args.iters):
        bits = model_step(bits)
    n_bad += verify(regs, bits)
    if n_bad:
        print(f"CORRECTNESS FAILURE (timed loop): {n_bad} wrong",
              file=sys.stderr)

    boots = lanes * batch * args.iters      # one staged p32 lookup per lane
    boots_per_sec = boots / elapsed
    result = {
        "metric": "bootstraps_per_sec_per_chip",
        "value": round(boots_per_sec, 2),
        "unit": "boots/s",
        "vs_baseline": round(boots_per_sec / 1000.0, 3),
        "batch": lanes * batch,
        "staged": True,
        "params": {"n": fam1.lwe_dim, "p": p,
                   "fam1": {"k": fam1.glwe_dim, "N": n1,
                            "l_bsk": fam1.bsk_level},
                   "fam2": {"k": fam2.glwe_dim, "N": n2,
                            "l_bsk": fam2.bsk_level}},
        "device": str(jax.devices()[0]),
        "keygen_s": round(keygen_s, 2),
        "compile_s": round(compile_s, 2),
        "ms_per_bootstrap": round(1000.0 * elapsed / boots, 4),
        "errors": n_bad,
    }
    print(json.dumps(result))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
