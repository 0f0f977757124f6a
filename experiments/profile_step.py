"""Bisect the blind-rotate step cost on real TPU hardware.

Times isolated variants of the hot loop (shapes identical to bench.py's
matmul path, random key material — profiling needs shapes, not semantics):

  full        the production step (rotate + decompose + s8 matmul + combine)
  rot_only    one-hot monomial rotation only
  mm_only     the wide s8 matmul only (fixed digits)
  dec_only    gadget decomposition + limb combine only
  mm_rot      matmul + rotation (no decompose)

Prints one JSON line per variant with us/step and the implied boots/s.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from tfhe_fbs_map_tpu.ops.blind_rotate import _combine_limbs
from tfhe_fbs_map_tpu.ops.polymul import monomial_rotate_onehot
from tfhe_fbs_map_tpu.tfhe.numeric import I32, gadget_decompose
from tfhe_fbs_map_tpu.tfhe.params import TFHEParams


def main() -> int:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--steps", type=int, default=64, help="scan length")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    params = TFHEParams(p=4, lwe_dim=args.steps, glwe_dim=2, poly_size=512,
                        bsk_level=2, bsk_base_log=8, ksk_level=5,
                        ksk_base_log=3, lwe_noise_std=2.0 ** 17,
                        glwe_noise_std=2.0 ** 7)
    B = args.batch
    n, k1, N, l = args.steps, 3, 512, 2
    L = 4
    rows = k1 * l

    key = jax.random.PRNGKey(0)
    kerns = jax.random.randint(key, (n, rows * N, L * k1 * N),
                               -127, 127, dtype=jnp.int8)
    acc0 = jax.random.randint(key, (B, k1, N), -2**31, 2**31 - 1,
                              dtype=jnp.int32)
    a_t = jax.random.randint(key, (n, B), 0, 2 * N, dtype=jnp.int32)
    digits_fix = jax.random.randint(key, (B, rows * N), -127, 127,
                                    dtype=jnp.int8)

    def ext_prod(diff, kern_i):
        digits = gadget_decompose(diff, params.bsk_base_log, params.bsk_level)
        digits = jnp.moveaxis(digits, -1, 2).reshape(B, rows * N) \
            .astype(jnp.int8)
        prods = jnp.einsum("bt,td->bd", digits, kern_i,
                           preferred_element_type=I32)
        prods = prods.reshape(B, L, k1 * N)
        return _combine_limbs(prods, axis=1).reshape(B, k1, N)

    @jax.jit
    def full(acc):
        def step(acc, xs):
            a_i, kern_i = xs
            rotated = monomial_rotate_onehot(acc, a_i)
            return acc + ext_prod(rotated - acc, kern_i), None
        return jax.lax.scan(step, acc, (a_t, kerns))[0]

    @jax.jit
    def rot_only(acc):
        def step(acc, a_i):
            return monomial_rotate_onehot(acc, a_i) + 1, None
        return jax.lax.scan(step, acc, a_t)[0]

    @jax.jit
    def mm_only(acc):
        def step(acc, kern_i):
            prods = jnp.einsum("bt,td->bd", digits_fix, kern_i,
                               preferred_element_type=I32)
            prods = prods.reshape(B, L, k1 * N)
            return acc + _combine_limbs(prods, axis=1).reshape(B, k1, N), None
        return jax.lax.scan(step, acc, kerns)[0]

    @jax.jit
    def dec_only(acc):
        def step(acc, a_i):
            digits = gadget_decompose(acc, params.bsk_base_log,
                                      params.bsk_level)
            s = jnp.sum(digits.astype(I32), axis=-1)
            return acc + s, None
        return jax.lax.scan(step, acc, a_t)[0]

    @jax.jit
    def mm_rot(acc):
        def step(acc, xs):
            a_i, kern_i = xs
            rotated = monomial_rotate_onehot(acc, a_i)
            digits = (rotated - acc)[..., None] \
                .astype(jnp.int8).reshape(B, k1 * N)
            dig2 = jnp.concatenate([digits, digits], axis=1)
            prods = jnp.einsum("bt,td->bd", dig2, kern_i,
                               preferred_element_type=I32)
            prods = prods.reshape(B, L, k1 * N)
            return acc + _combine_limbs(prods, axis=1).reshape(B, k1, N), None
        return jax.lax.scan(step, acc, (a_t, kerns))[0]

    variants = [("full", full), ("rot_only", rot_only), ("mm_only", mm_only),
                ("dec_only", dec_only), ("mm_rot", mm_rot)]

    np.asarray(kerns[:1, :1, :1])  # materialize keys
    for name, fn in variants:
        out = fn(acc0)
        np.asarray(out[:1, :1, :1])  # compile + warmup
        t0 = time.time()
        for _ in range(args.iters):
            out = fn(out)
        np.asarray(out[:1, :1, :1])
        dt = time.time() - t0
        us_step = dt / (args.iters * n) * 1e6
        print(json.dumps({
            "variant": name, "us_per_step": round(us_step, 1),
            "ms_per_boot_at_n630": round(us_step * 630 / 1000 / B, 3),
            "implied_boots_per_s": round(B / (us_step * 630 / 1e6), 1),
        }))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
