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


def test_fused_batch_slicing(keys, monkeypatch):
    """Batches above the VMEM tile are processed in lax.map slices."""
    from tfhe_fbs_map_tpu.ops import fused_blind_rotate as fbr

    rng = np.random.default_rng(3)
    p = TEST_PARAMS
    table = [1, 0, 1, 1, 0]
    values = rng.integers(0, len(table), 21)
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector(table, p)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (len(values), p.poly_size))
    posts = jnp.full((len(values),), np.int32(post))
    fast = prepare_fast_keys(keys, orientation="fused")
    want = functional_bootstrap(keys, cts, tvs, posts)

    monkeypatch.setattr(fbr, "_max_batch", lambda *a: 8)  # force 3 slices
    # call the unjitted fn: the monkeypatched _max_batch must be read at
    # trace time, and the jitted wrapper may have a cached trace
    got = fbr.blind_rotate_fused.__wrapped__(
        *_fused_args(cts, tvs, keys, fast), p, True)
    got = jnp.moveaxis(got, 1, 0)
    a = got[:, :p.glwe_dim, :]
    a_ext = jnp.concatenate([a[..., :1], -a[..., :0:-1]], axis=-1)
    out = jnp.concatenate(
        [a_ext.reshape(len(values), p.glwe_dim * p.poly_size),
         got[:, p.glwe_dim, :1]], axis=1).at[:, -1].add(posts)
    assert np.array_equal(np.asarray(want).astype(np.uint32),
                          np.asarray(out).astype(np.uint32))


def _fused_args(cts, tvs, keys, fast):
    from tfhe_fbs_map_tpu.tfhe.pbs import keyswitch, modswitch
    p = keys.params
    n, N = p.lwe_dim, p.poly_size
    shifted = cts.at[:, -1].add(jnp.int32(p.half_window))
    small = keyswitch(shifted, keys)
    a_t = modswitch(small[:, :n], p)
    b_t = modswitch(small[:, n], p)
    b_init = ((2 * N - b_t) % (2 * N))[:, None].astype(jnp.int32)
    a_steps = jnp.transpose(a_t)[:, :, None].astype(jnp.int32)
    return b_init, a_steps, tvs, fast.bsk_kernels
