"""The MXU conv fast path must agree exactly with the generic path."""

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_fbs_map_tpu.ops.blind_rotate import (external_product_conv,
                                               functional_bootstrap_fast,
                                               prepare_fast_keys)
from tfhe_fbs_map_tpu.tfhe import (TEST_PARAMS, build_test_vector,
                                   decrypt_values, encrypt_values,
                                   external_product, functional_bootstrap,
                                   generate_keys)


@pytest.fixture(scope="module")
def keys():
    return generate_keys(TEST_PARAMS, seed=13)


@pytest.fixture(scope="module",
                params=["keys_rhs", "keys_lhs", "keys_lhs_bf16", "matmul",
                        "fused", "fused_otf"])
def fast(request, keys):
    return prepare_fast_keys(keys, orientation=request.param)


def test_external_product_conv_matches_generic(keys, fast):
    rng = np.random.default_rng(0)
    p = TEST_PARAMS
    diff = rng.integers(0, 1 << 32, (5, p.glwe_dim + 1, p.poly_size),
                        dtype=np.uint32).astype(np.int32)
    diff = jnp.asarray(diff)
    # the fused orientations have no standalone external product (comp-major
    # chunk layout / VMEM-only key matrices); they are exercised end-to-end
    # through the full bootstrap test below
    if fast.orientation in ("fused", "fused_otf"):
        pytest.skip("fused paths covered by the full-bootstrap test")
    for i in (0, 3, p.lwe_dim - 1):
        want = external_product(diff, keys.bsk[i], p)
        got = external_product_conv(diff, fast.bsk_kernels[i], p,
                                    fast.orientation)
        assert np.array_equal(np.asarray(want).astype(np.uint32),
                              np.asarray(got).astype(np.uint32)), i


def test_fast_bootstrap_matches_generic(keys, fast):
    rng = np.random.default_rng(1)
    p = TEST_PARAMS
    table = [0, 1, 1, 0, 1]
    values = np.arange(len(table))
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector(table, p)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (len(table), p.poly_size))
    posts = jnp.full((len(table),), np.int32(post))

    want = functional_bootstrap(keys, cts, tvs, posts)
    got = functional_bootstrap_fast(fast, cts, tvs, posts)
    # identical ciphertexts: both paths are exact mod 2^32
    assert np.array_equal(np.asarray(want).astype(np.uint32),
                          np.asarray(got).astype(np.uint32))
    assert np.array_equal(decrypt_values(keys, got), np.asarray(table))
