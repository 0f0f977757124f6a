"""Multi-chip scaling benchmark: dp-sharded batched bootstraps over a mesh.

Measures verified bootstraps/sec over ALL visible devices and the scaling
efficiency vs the single-chip rate (north-star: ≥80%, BASELINE.json).  The
ciphertext batch is data-parallel over the mesh's dp axis (each chip runs
the fused Pallas kernel on its slice; keys replicated — SURVEY.md §5
"level-wise batched bootstrapping").

On this environment only one real chip is tunneled, so the dp axis is
size 1 and efficiency is 1.0 by construction; on a real v5p slice the same
script exercises ICI/DCN scaling.  CPU dry-run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python experiments/bench_multichip.py --quick
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-chip", type=int, default=512)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--orientation", default="fused_otf",
                    choices=["fused", "fused_otf", "matmul"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force the CPU backend with N virtual devices "
                         "(scaling-efficiency study; the axon sitecustomize "
                         "overrides JAX_PLATFORMS, so the flag pins the "
                         "platform in-process)")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel mesh axis: shards the matmul-"
                         "orientation key contraction (partial external "
                         "products meet in a psum); requires "
                         "--orientation matmul for a sharded contraction")
    args = ap.parse_args()

    if args.cpu_devices:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count"
                  f"={args.cpu_devices}").strip()
    import jax
    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tfhe_fbs_map_tpu.ops.blind_rotate import prepare_fast_keys
    from tfhe_fbs_map_tpu.parallel.mesh import (make_mesh, shard_batch,
                                                shard_fast_keys,
                                                sharded_bootstrap)
    from tfhe_fbs_map_tpu.tfhe import (TFHEParams, build_test_vector,
                                       decrypt_values, encrypt_values,
                                       generate_keys)

    n_dev = len(jax.devices())
    if args.quick:
        params = TFHEParams(p=4, lwe_dim=16, glwe_dim=1, poly_size=128,
                            bsk_level=2, bsk_base_log=8, ksk_level=3,
                            ksk_base_log=4, lwe_noise_std=2.0,
                            glwe_noise_std=2.0)
        args.batch_per_chip = min(args.batch_per_chip, 16)
        args.iters = min(args.iters, 2)
    else:
        params = TFHEParams(p=4, lwe_dim=630, glwe_dim=2, poly_size=512,
                            bsk_level=2, bsk_base_log=8, ksk_level=5,
                            ksk_base_log=3,
                            lwe_noise_std=2.0 ** (32 - 15.0),
                            glwe_noise_std=2.0 ** (32 - 25.0))

    keys = generate_keys(params, seed=1)
    fast = prepare_fast_keys(keys, orientation=args.orientation)

    dp = n_dev // args.tp
    mesh = make_mesh(jax.devices(), dp=dp, tp=args.tp)
    fast_s = shard_fast_keys(mesh, fast)
    fn = sharded_bootstrap(mesh, fast_s)

    batch = args.batch_per_chip * dp
    rng = np.random.default_rng(2)
    values = rng.integers(0, 3, batch)
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector([1, 0, 1], params)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (batch, params.poly_size))
    posts = jnp.full((batch,), np.int32(post))

    cts_s = shard_batch(mesh, cts)
    tvs_s = shard_batch(mesh, tvs)
    posts_s = shard_batch(mesh, posts)

    out = fn(cts_s, tvs_s, posts_s)
    np.asarray(out[:1, -1:])  # compile + warmup (forced readback)

    got = decrypt_values(keys, out)
    want = np.asarray([1, 0, 1])[values]
    n_bad = int(np.sum(got != want))

    t0 = time.time()
    for _ in range(args.iters):
        out = fn(out, tvs_s, posts_s)
    np.asarray(out[:1, -1:])
    elapsed = time.time() - t0

    boots_per_sec = batch * args.iters / elapsed
    print(json.dumps({
        "metric": "bootstraps_per_sec_total",
        "value": round(boots_per_sec, 1),
        "devices": n_dev,
        "dp": dp,
        "tp": args.tp,
        "boots_per_sec_per_chip": round(boots_per_sec / n_dev, 1),
        "batch_per_chip": args.batch_per_chip,
        "orientation": args.orientation,
        "errors": n_bad,
    }))
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
