"""Bisect the fused otf blind-rotate kernel on real TPU hardware.

Times the production kernel (p16/p32 preset shapes, random key bytes —
profiling needs shapes, not semantics) with phases disabled via the
``_DEBUG_SKIP`` knob in ops/fused_blind_rotate.py:

  full          rotate/decompose + strip build + block dots
  no_rot        strip build + dots       (isolates the barrel/decompose VPU)
  no_build      rotate + dots            (isolates the strip-build VPU)
  dots_only     block dots only          (MXU roofline of the contraction)
  vpu_only      rotate + build, no dots

Optionally sweeps the strip tile T.  Prints one JSON line per variant.

Usage: python experiments/profile_fused.py --preset p32 --batch 208
"""

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

VARIANTS = {
    "full": (),
    "no_rot": ("rot",),
    "no_build": ("build",),
    "dots_only": ("rot", "build"),
    "vpu_only": ("dots",),
    # rot compute kept, but reading tv_ref instead of out_ref: isolates the
    # cross-step accumulator RAW serialization from the rot op cost
    "rot_decoupled": ("rot_src",),
}

# bench.py pinned preset shapes (r4 re-pin: p16 moved to k=1/N=1024,
# p8 to l=2/b=8 — keep these in lockstep with bench.py `presets`)
PRESETS = {
    "p8": (8, 642, 2, 512, 2, 8),
    "p16": (16, 642, 1, 1024, 3, 6),
    "p32": (32, 706, 1, 2048, 3, 7),
    "anchor": (4, 546, 2, 512, 2, 8),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="p32", choices=list(PRESETS))
    ap.add_argument("--batch", type=int, default=208)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--tiles", default=None,
                    help="comma list of strip tiles to sweep (e.g. 128,256)")
    ap.add_argument("--variants", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tfhe_fbs_map_tpu.ops import fused_blind_rotate as fbr
    from tfhe_fbs_map_tpu.tfhe.params import TFHEParams, min_noise_std_rel

    p, n, k, N, l, b = PRESETS[args.preset]
    params = TFHEParams(p=p, lwe_dim=n, glwe_dim=k, poly_size=N,
                        bsk_level=l, bsk_base_log=b, ksk_level=4,
                        ksk_base_log=4,
                        lwe_noise_std=min_noise_std_rel(n) * 2.0 ** 32,
                        glwe_noise_std=min_noise_std_rel(k * N) * 2.0 ** 32)
    k1 = k + 1
    rows = k1 * l
    B = args.batch

    key = jax.random.PRNGKey(0)
    kerns = jax.random.randint(key, (n, 4 * k1, rows, 2 * N),
                               -127, 127, dtype=jnp.int8)
    b_init = jax.random.randint(key, (B, 1), 0, 2 * N, dtype=jnp.int32)
    a_t = jax.random.randint(key, (n, B, 1), 0, 2 * N, dtype=jnp.int32)
    tvs = jax.random.randint(key, (B, N), -2 ** 31, 2 ** 31 - 1,
                             dtype=jnp.int32)

    tiles = [int(t) for t in args.tiles.split(",")] if args.tiles else [None]
    variants = (args.variants.split(",") if args.variants
                else list(VARIANTS))

    for tile in tiles:
        fbr._TILE_OVERRIDE = tile
        for name in variants:
            fbr._DEBUG_SKIP = VARIANTS[name]
            fn = jax.jit(partial(fbr._blind_rotate_call, params=params,
                                 interpret=False))
            try:
                out = fn(b_init, a_t, tvs, kerns)
                _ = np.asarray(out[:1, :1, :1])
                t0 = time.time()
                for _i in range(args.iters):
                    out = fn(b_init, a_t, tvs, kerns)
                _ = np.asarray(out[:1, :1, :1])
                dt = (time.time() - t0) / args.iters
                print(json.dumps({
                    "variant": name, "tile": tile or fbr._tile(params),
                    "preset": args.preset, "batch": B,
                    "ms_per_call": round(dt * 1e3, 2),
                    "ms_per_boot": round(dt * 1e3 / B, 4),
                    "boots_per_s": round(B / dt, 1)}))
            except Exception as e:
                print(json.dumps({"variant": name, "tile": tile,
                                  "error": str(e)[:200]}))
            finally:
                fbr._DEBUG_SKIP = ()
        fbr._TILE_OVERRIDE = None
    return 0


if __name__ == "__main__":
    sys.exit(main())
