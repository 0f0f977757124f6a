"""LWE encryption, decryption, encoding, and ciphertext lincombs.

Wire convention of the executor: every circuit wire is an LWE ciphertext
under the *extracted* (big, dimension kN) key, encoding the integer wire
value ``v`` as ``v * delta`` with the global scaling ``delta = q / 2p``
(:attr:`TFHEParams.delta`).  Integer lincombs — the cheap half of the mapped
programs (reference ``fbs_exec_env.py:215-217``) — are exact int32
combinations of ciphertexts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .keys import TFHEKeys
from .numeric import I32
from .params import Q_BITS, TFHEParams

__all__ = ["lwe_encrypt", "lwe_phase", "encode", "decode", "encrypt_values",
           "decrypt_values", "lwe_lincomb"]


def encode(values, params: TFHEParams) -> np.ndarray:
    return (np.asarray(values, dtype=np.int64) * params.delta) \
        .astype(np.uint32).astype(np.int32)


def decode(phases, params: TFHEParams) -> np.ndarray:
    """Nearest-multiple decode of decrypted phases -> values in [0, 2p)."""
    u = np.asarray(phases).astype(np.uint32).astype(np.float64)
    return (np.round(u / params.delta).astype(np.int64)) % (2 * params.p)


def lwe_encrypt(key: jnp.ndarray, mus, noise_std: float,
                rng: np.random.Generator) -> jnp.ndarray:
    """Encrypt torus values ``mus`` [B] under ``key`` [d] -> [B, d+1]."""
    mus = np.atleast_1d(np.asarray(mus)).astype(np.uint32).astype(np.int32)
    d = int(key.shape[0])
    batch = mus.shape[0]
    a = rng.integers(0, 1 << Q_BITS, (batch, d), dtype=np.uint32) \
        .astype(np.int32)
    e = np.round(rng.normal(0.0, noise_std, batch)).astype(np.int64) \
        .astype(np.uint32).astype(np.int32)
    a_j = jnp.asarray(a)
    b = jnp.einsum("bd,d->b", a_j, key, preferred_element_type=I32) \
        + jnp.asarray(mus) + jnp.asarray(e)
    return jnp.concatenate([a_j, b[:, None]], axis=1)


def lwe_phase(key: jnp.ndarray, cts: jnp.ndarray) -> jnp.ndarray:
    """Decrypt to phases: b - <a, s>.  ``cts`` [B, d+1] -> [B]."""
    d = int(key.shape[0])
    return cts[:, d] - jnp.einsum("bd,d->b", cts[:, :d], key,
                                  preferred_element_type=I32)


def encrypt_values(keys: TFHEKeys, values,
                   rng: np.random.Generator) -> jnp.ndarray:
    """Encrypt integer wire values under the big (extracted) key."""
    return lwe_encrypt(keys.extracted_key, encode(values, keys.params),
                       keys.params.glwe_noise_std, rng)


def decrypt_values(keys: TFHEKeys, cts: jnp.ndarray) -> np.ndarray:
    phases = np.asarray(lwe_phase(keys.extracted_key, cts))
    return decode(phases, keys.params)


def lwe_lincomb(cts: jnp.ndarray, coefs, const: int,
                params: TFHEParams) -> jnp.ndarray:
    """Homomorphic integer lincomb: sum_i coefs[i]*cts[i] + const.

    ``cts`` [T, d+1] ciphertexts of values v_i -> ciphertext of
    ``sum coefs*v + const`` (same encoding; noise grows with ||coefs||^2).
    """
    coefs = jnp.asarray(coefs, dtype=I32)
    out = jnp.einsum("t,td->d", coefs, cts, preferred_element_type=I32)
    const_mu = np.array(const * params.delta, dtype=np.int64) \
        .astype(np.uint32).astype(np.int32)
    return out.at[-1].add(jnp.asarray(const_mu))
