"""Pallas kernel: fused per-ciphertext rotation + CMux digit extraction.

The blind-rotate step needs, per ciphertext row b:

    diff   = X^{a_b} · ACC_b - ACC_b          (negacyclic monomial rotation)
    digits = gadget_decompose(diff)           (bit ops)

In XLA, the per-row rotation is either a gather (scalarized on TPU) or an
11-stage barrel of unfused concats — both measured ~1.5-7 ms per step at
B=256 and dominating the loop.  Here the rotation is ONE dynamic slice per
row out of the sign-extended buffer ``D = [acc, -acc, acc, -acc]`` held in
VMEM (valid for any amount in [0, 2N): X^a·acc = D[2N - a : 2N - a + N]),
with rotation amounts scalar-prefetched into SMEM; the decomposition runs
on the VPU in the same pass.  Output digits are written reversed along the
coefficient axis, ready to be the conv weights of the keys_lhs external
product (ops/blind_rotate.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tfhe.params import Q_BITS, TFHEParams

BT = 8  # batch rows per program


def _rot_decomp_kernel(a_ref, acc_ref, out_ref, dbuf, *, n, k1, levels,
                       base_log):
    i = pl.program_id(0)
    acc = acc_ref[...]                                   # [BT, k1, N] i32
    dbuf[...] = jnp.concatenate([acc, -acc, acc, -acc], axis=-1)

    half = jnp.uint32(1 << (base_log - 1))
    mask = jnp.uint32((1 << base_log) - 1)

    for r in range(BT):
        a = a_ref[i * BT + r]
        start = 2 * n - a
        rot = dbuf[r, :, pl.ds(start, n)]                # [k1, N]
        diff = rot - acc[r]

        # balanced gadget decomposition (most-significant level first)
        closest = diff.astype(jnp.uint32)
        shift = Q_BITS - base_log * levels
        if shift > 0:
            closest = (closest + jnp.uint32(1 << (shift - 1))) \
                >> jnp.uint32(shift)
        digits = []
        for _ in range(levels):
            d = closest & mask
            closest = closest >> jnp.uint32(base_log)
            carry = (d >= half).astype(jnp.uint32)
            digits.append(d.astype(jnp.int32)
                          - (carry.astype(jnp.int32) << base_log))
            closest = closest + carry
        # stack level-major: rows index = c*levels + lev, lev 0 = most sig
        dig = jnp.stack(digits[::-1], axis=1)            # [k1, l, N]
        out_ref[r] = dig.reshape(k1 * levels, n).astype(jnp.int8)


@functools.partial(jax.jit, static_argnums=(2, 3))
def rotate_decompose(acc: jnp.ndarray, amounts: jnp.ndarray,
                     params: TFHEParams, interpret: bool = False
                     ) -> jnp.ndarray:
    """[B, k+1, N] i32 + [B] i32 -> digits of (X^a·acc - acc), reversed:
    [B, (k+1)*l, N] int8."""
    batch, k1, n = acc.shape
    l, b = params.bsk_level, params.bsk_base_log
    assert batch % BT == 0, f"batch {batch} must be a multiple of {BT}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(batch // BT,),
        in_specs=[
            pl.BlockSpec((BT, k1, n), lambda i, a: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, k1 * l, n), lambda i, a: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BT, k1, 4 * n), jnp.int32)],
    )
    kernel = functools.partial(_rot_decomp_kernel, n=n, k1=k1, levels=l,
                               base_log=b)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((batch, k1 * l, n), jnp.int8),
        interpret=interpret,
    )(amounts, acc)
