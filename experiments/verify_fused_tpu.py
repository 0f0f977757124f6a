"""Real-TPU bit-exactness check: fused Pallas blind rotate vs generic path.

Small n (fast keygen) but production-shaped tiles (N=512, k=2, B=512).
Prints PASS/FAIL; exits nonzero on mismatch.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from tfhe_fbs_map_tpu.ops.blind_rotate import (functional_bootstrap_fast,
                                               prepare_fast_keys)
from tfhe_fbs_map_tpu.tfhe import (TFHEParams, build_test_vector,
                                   encrypt_values, generate_keys)
from tfhe_fbs_map_tpu.tfhe.pbs import functional_bootstrap


def main() -> int:
    params = TFHEParams(p=4, lwe_dim=48, glwe_dim=2, poly_size=512,
                        bsk_level=2, bsk_base_log=8, ksk_level=5,
                        ksk_base_log=3, lwe_noise_std=2.0,
                        glwe_noise_std=2.0)
    keys = generate_keys(params, seed=3)
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--orientation", default="fused")
    args = ap.parse_args()
    fast = prepare_fast_keys(keys, orientation=args.orientation)
    np.asarray(fast.bsk_kernels[:1, :1, :1])
    print("# keys ready", file=sys.stderr)

    rng = np.random.default_rng(7)
    B = 512
    values = rng.integers(0, 3, B)
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector([1, 0, 1], params)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (B, params.poly_size))
    posts = jnp.full((B,), np.int32(post))

    out_fused = functional_bootstrap_fast(fast, cts, tvs, posts)
    np.asarray(out_fused[:1, -1:])
    print("# fused done", file=sys.stderr)
    out_ref = functional_bootstrap(keys, cts[:64], tvs[:64], posts[:64])
    bad = int(np.sum(np.asarray(out_fused[:64]) != np.asarray(out_ref)))
    print(f"fused-vs-generic mismatches: {bad} / {out_ref.size}")
    if bad:
        print("FAIL")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
