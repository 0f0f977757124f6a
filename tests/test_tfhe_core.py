"""Known-answer and statistical tests of the TFHE math core (CPU, tiny params)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_fbs_map_tpu.ops.polymul import (monomial_rotate, negacyclic_matrix,
                                          negacyclic_polymul,
                                          np_negacyclic_polymul)
from tfhe_fbs_map_tpu.tfhe import (TEST_PARAMS, TFHEKeys, build_test_vector,
                                   decode, decrypt_values, encode,
                                   encrypt_values, functional_bootstrap,
                                   generate_keys, keyswitch, lwe_encrypt,
                                   lwe_lincomb, lwe_phase)
from tfhe_fbs_map_tpu.tfhe.numeric import (gadget_decompose, gadget_recompose,
                                           signed_limbs)


def test_gadget_decompose_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 32, 1000, dtype=np.uint32).astype(np.int32)
    for b, l in [(7, 3), (4, 5), (8, 4), (16, 2)]:
        d = gadget_decompose(jnp.asarray(x), b, l)
        assert int(jnp.max(jnp.abs(d))) <= (1 << b) // 2
        rec = np.asarray(gadget_recompose(d, b))
        err = (x.astype(np.int64) - rec.astype(np.int64)) \
            .astype(np.uint32).astype(np.int32)
        # reconstruction error bounded by q / (2 B^l)
        assert np.max(np.abs(err.astype(np.int64))) <= (1 << (32 - b * l)) // 2


def test_signed_limbs_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 32, 500, dtype=np.uint32).astype(np.int32)
    limbs = np.asarray(signed_limbs(jnp.asarray(x), 4, 8)).astype(np.int64)
    assert np.max(np.abs(limbs)) <= 128
    rec = sum(limbs[:, i] << (8 * i) for i in range(4))
    assert np.array_equal(rec.astype(np.uint32),
                          x.astype(np.uint32))


def test_negacyclic_polymul_kat():
    rng = np.random.default_rng(2)
    for n in (8, 64):
        a = rng.integers(-100, 100, n).astype(np.int32)
        b = rng.integers(0, 1 << 32, n, dtype=np.uint32).astype(np.int32)
        want = np_negacyclic_polymul(a, b)
        got = np.asarray(negacyclic_polymul(jnp.asarray(a), jnp.asarray(b)))
        assert np.array_equal(want.astype(np.uint32), got.astype(np.uint32))


def test_negacyclic_small_identities():
    # X * X^(N-1) = X^N = -1
    n = 16
    x1 = np.zeros(n, dtype=np.int32); x1[1] = 1
    xn1 = np.zeros(n, dtype=np.int32); xn1[n - 1] = 1
    got = np.asarray(negacyclic_polymul(jnp.asarray(x1), jnp.asarray(xn1)))
    want = np.zeros(n, dtype=np.int32); want[0] = -1
    assert np.array_equal(got, want)


def test_monomial_rotate_matches_polymul():
    rng = np.random.default_rng(3)
    n = 32
    poly = rng.integers(0, 1 << 32, n, dtype=np.uint32).astype(np.int32)
    for amount in (0, 1, 5, n - 1, n, n + 3, 2 * n - 1):
        mono = np.zeros(n, dtype=np.int32)
        if amount < n:
            mono[amount] = 1
        else:
            mono[amount - n] = -1
        want = np_negacyclic_polymul(mono, poly)
        got = np.asarray(monomial_rotate(jnp.asarray(poly)[None, :],
                                         jnp.asarray([amount])))[0]
        assert np.array_equal(want.astype(np.uint32), got.astype(np.uint32)), \
            amount


@pytest.fixture(scope="module")
def keys() -> TFHEKeys:
    return generate_keys(TEST_PARAMS, seed=7)


def test_lwe_encrypt_decrypt(keys):
    rng = np.random.default_rng(4)
    values = rng.integers(0, 2 * TEST_PARAMS.p, 64)
    cts = encrypt_values(keys, values, rng)
    got = decrypt_values(keys, cts)
    assert np.array_equal(got, values)


def test_lwe_lincomb(keys):
    rng = np.random.default_rng(5)
    vals = np.array([1, 0, 1])
    cts = encrypt_values(keys, vals, rng)
    out = lwe_lincomb(cts, [2, 3, 1], 1, TEST_PARAMS)
    got = decrypt_values(keys, out[None, :])
    assert got[0] == (2 * 1 + 3 * 0 + 1 * 1 + 1) % (2 * TEST_PARAMS.p)


def test_keyswitch_preserves_phase(keys):
    rng = np.random.default_rng(6)
    values = rng.integers(0, TEST_PARAMS.p, 32)
    cts = encrypt_values(keys, values, rng)
    small = keyswitch(cts, keys)
    phases = np.asarray(lwe_phase(keys.lwe_key, small))
    assert np.array_equal(decode(phases, TEST_PARAMS), values)


def test_build_test_vector_modes():
    p = TEST_PARAMS.p  # 4
    d = TEST_PARAMS.delta
    # short table
    tv, post = build_test_vector([0, 1, 1], TEST_PARAMS)
    assert post == 0
    assert tv[0] == 0 and tv[-1] == d  # last window holds T[2]=1
    # mode1: len 2p, complement overlap
    tv, post = build_test_vector([0, 1, 1, 0, 1, 0, 0, 1], TEST_PARAMS)
    assert post == d // 2
    # mode3: overlap constant 1
    tv, post = build_test_vector([1, 0, 0, 1, 1], TEST_PARAMS)
    assert post == d
    # invalid: no mode fits
    with pytest.raises(AssertionError):
        build_test_vector([0, 1, 0, 0, 1, 1], TEST_PARAMS)


@pytest.mark.parametrize("table", [
    [0, 1, 0, 1],            # tau = p
    [0, 1, 1],               # tau < p
    [1, 0, 2, 1],            # multi-value
    [0, 1, 1, 0, 1, 0, 0, 1],  # tau = 2p, mode1
    [0, 1, 1, 0, 1],         # tau = p+1, mode1
    [0, 1, 1, 0, 0],         # tau = p+1, mode2 (overlap 0)
    [1, 1, 0, 1, 1],         # tau = p+1, mode3 (overlap 1)
])
def test_functional_bootstrap_tables(keys, table):
    rng = np.random.default_rng(8)
    tau = len(table)
    values = np.arange(tau)
    cts = encrypt_values(keys, values, rng)
    tv, post = build_test_vector(table, TEST_PARAMS)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (tau, TEST_PARAMS.poly_size))
    posts = jnp.full((tau,), np.int32(np.uint32(post).astype(np.int32)))
    out = functional_bootstrap(keys, cts, tvs, posts)
    got = decrypt_values(keys, out)
    assert np.array_equal(got, np.asarray(table)), (table, got.tolist())


def test_bootstrap_then_lincomb_then_bootstrap(keys):
    # the core executor pattern: FBS output feeds the next lincomb exactly
    rng = np.random.default_rng(9)
    a_vals = np.array([0, 1, 0, 1])
    b_vals = np.array([0, 0, 1, 1])
    cts_a = encrypt_values(keys, a_vals, rng)
    cts_b = encrypt_values(keys, b_vals, rng)

    # XOR via lincomb a - b + 1 -> table [1,0,1]
    lin = cts_a - cts_b
    lin = lin.at[:, -1].add(np.int32(TEST_PARAMS.delta))
    tv, post = build_test_vector([1, 0, 1], TEST_PARAMS)
    tvs = jnp.broadcast_to(jnp.asarray(tv), (4, TEST_PARAMS.poly_size))
    posts = jnp.full((4,), np.int32(post))
    x = functional_bootstrap(keys, lin, tvs, posts)
    assert np.array_equal(decrypt_values(keys, x), a_vals ^ b_vals)

    # then AND via lincomb x + b -> table [0,0,1] wait (x + b == 2) -> AND
    lin2 = x + cts_b
    tv2, post2 = build_test_vector([0, 0, 1], TEST_PARAMS)
    tvs2 = jnp.broadcast_to(jnp.asarray(tv2), (4, TEST_PARAMS.poly_size))
    posts2 = jnp.full((4,), np.int32(post2))
    y = functional_bootstrap(keys, lin2, tvs2, posts2)
    assert np.array_equal(decrypt_values(keys, y),
                          (a_vals ^ b_vals) & b_vals)
