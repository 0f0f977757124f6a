"""Quantized (limb-dropped) bootstrapping key: still decrypts correctly at
test parameters; noise grows as modeled."""

import jax.numpy as jnp
import numpy as np

from tfhe_fbs_map_tpu.ops.blind_rotate import (functional_bootstrap_fast,
                                               prepare_fast_keys)
from tfhe_fbs_map_tpu.tfhe import (TEST_PARAMS, build_test_vector,
                                   decrypt_values, encrypt_values,
                                   generate_keys)


def test_three_limb_bsk_correct():
    keys = generate_keys(TEST_PARAMS, seed=21)
    fast = prepare_fast_keys(keys, orientation="matmul", bsk_limbs=3)
    rng = np.random.default_rng(0)
    table = [0, 1, 1, 0]
    values = rng.integers(0, len(table), 64)
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector(table, TEST_PARAMS)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (64, TEST_PARAMS.poly_size))
    posts = jnp.full((64,), np.int32(post))
    out = functional_bootstrap_fast(fast, cts, tvs, posts)
    got = decrypt_values(keys, out)
    assert np.array_equal(got, np.asarray(table)[values])
