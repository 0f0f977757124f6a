"""Real-TPU bit-exactness of the fused_otf path at large-p parameter shapes.

The optimizer picks N=1024/2048 for p=16/32 (sweep envelope of the
reference, SURVEY.md §6) — key matrices no longer fit HBM precomputed, so
these shapes exercise the on-the-fly rebuild + batch slicing.  Small n keeps
the generic-oracle comparison fast.
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

SHAPES = [
    ("p16-like", TFHEParams(p=16, lwe_dim=24, glwe_dim=2, poly_size=1024,
                            bsk_level=3, bsk_base_log=7, ksk_level=5,
                            ksk_base_log=3, lwe_noise_std=2.0,
                            glwe_noise_std=2.0)),
    ("p32-like", TFHEParams(p=32, lwe_dim=16, glwe_dim=1, poly_size=2048,
                            bsk_level=3, bsk_base_log=8, ksk_level=5,
                            ksk_base_log=3, lwe_noise_std=2.0,
                            glwe_noise_std=2.0)),
]


def main() -> int:
    rc = 0
    for name, params in SHAPES:
        keys = generate_keys(params, seed=11)
        fast = prepare_fast_keys(keys, orientation="fused_otf")
        np.asarray(fast.bsk_kernels[:1, :1])
        B = 96  # above the VMEM batch tile at N=2048 → exercises slicing
        rng = np.random.default_rng(5)
        table = list(rng.integers(0, params.p, params.p))
        values = rng.integers(0, params.p, B)
        cts = encrypt_values(keys, values, rng)
        tv, post = build_test_vector(table, params)
        tvs = jnp.broadcast_to(jnp.asarray(tv), (B, params.poly_size))
        posts = jnp.full((B,), np.int32(post))

        got = functional_bootstrap_fast(fast, cts, tvs, posts)
        np.asarray(got[:1, -1:])
        want = functional_bootstrap(keys, cts[:16], tvs[:16], posts[:16])
        bad = int(np.sum(np.asarray(got[:16]) != np.asarray(want)))
        print(f"{name} (k={params.glwe_dim} N={params.poly_size}): "
              f"mismatches {bad}/{want.size} -> "
              f"{'PASS' if not bad else 'FAIL'}")
        sys.stdout.flush()
        rc |= 1 if bad else 0
    return rc


if __name__ == "__main__":
    sys.exit(main())
