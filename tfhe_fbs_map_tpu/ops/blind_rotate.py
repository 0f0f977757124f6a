"""MXU fast paths for the programmable bootstrap.

The blind-rotate hot loop costs ``n · (k+1)² · l · N²`` MACs per ciphertext —
all the FLOPs of the framework.  Orientations, fastest first (measured
numbers in PERF.md):

* ``"fused"`` (11.3k boots/s): same precomputed key matrices, but all n
  CMux steps run inside ONE Pallas kernel with the accumulator resident
  in VMEM (:mod:`tfhe_fbs_map_tpu.ops.fused_blind_rotate`).
* ``"matmul"`` (1.5k boots/s): XLA-level scan; the external product is ONE
  wide s8×s8→s32 ``dot_general`` per step (the MXU-native integer path) and
  the monomial rotation is a batched one-hot matmul.  HBM cost for both:
  ``n·L·rows·N·(k+1)·N`` bytes; optional BSK limb-drop quantization.
* ``"keys_lhs_bf16"`` / ``"keys_lhs"`` / ``"keys_rhs"``: convolution
  formulations (digit or key operand extended negacyclically to handle
  X^N = −1).  No precompute memory, but TPU XLA has no s8 conv path, so
  these run well below MXU rate; kept as memory-lean fallbacks and as
  differential references.

Exactness mod 2^32 everywhere: keys split into balanced 8-bit limbs
(s32 accumulation stays < 2^27; bf16 paths additionally sub-split digits so
f32 accumulation stays < 2^24), recombined with wrapping shifts.  Every
path is asserted bit-identical to the generic
:mod:`tfhe_fbs_map_tpu.tfhe.pbs` implementation in tests/test_fast_path.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..tfhe.keys import TFHEKeys
from ..tfhe.numeric import I32, gadget_decompose, signed_limbs
from ..tfhe.params import Q_BITS, TFHEParams
from .polymul import monomial_rotate, monomial_rotate_onehot

__all__ = ["FastKeys", "prepare_fast_keys", "functional_bootstrap_fast",
           "external_product_conv"]

N_LIMBS = 4
LIMB_BITS = 8


def _limb_kernels(polys: jnp.ndarray) -> jnp.ndarray:
    """[..., N] torus polys -> [..., N_LIMBS, N] int8 reversed conv kernels."""
    limbs = signed_limbs(polys, N_LIMBS, LIMB_BITS)      # [..., N, L]
    limbs = jnp.moveaxis(limbs, -1, -2)                  # [..., L, N]
    return limbs[..., ::-1].astype(jnp.int8)             # kernel reversal


class FastKeys:
    """Device-side preprocessed key material for the conv fast path.

    ``orientation`` selects which operand of the external-product conv holds
    the key: ``"keys_rhs"`` puts the key limbs in the conv weights (output
    channels = (k+1)·limbs = small), ``"keys_lhs"`` pre-extends the key
    negacyclically as the conv input and feeds the per-step digits as the
    weights, making the *ciphertext batch* the output-channel dimension —
    which is what fills the 128-lane MXU at realistic batch sizes.
    """

    def __init__(self, params: TFHEParams, bsk_kernels: jnp.ndarray,
                 ksk_limbs: jnp.ndarray, orientation: str = "keys_rhs"):
        self.params = params
        # keys_rhs: [n, (k+1)*N_LIMBS, rows, N] int8 — conv rhs per step
        # keys_lhs: [n, (k+1)*N_LIMBS, rows, 2N] int8 — extended conv lhs
        self.bsk_kernels = bsk_kernels
        # [N_LIMBS, kN*l_ks, n+1] int8 — key-switch matmul limbs
        self.ksk_limbs = ksk_limbs
        self.orientation = orientation


def prepare_fast_keys(keys: TFHEKeys, orientation: str = "matmul",
                      bsk_limbs: int = N_LIMBS) -> FastKeys:
    """``bsk_limbs`` < 4 (matmul orientation only) drops the least
    significant key limbs — BSK quantization: −25% MACs and memory per
    dropped limb for a bounded extra noise term of std
    ``sqrt(rows·N·(B²/12)·(2^(8·drop))²/12)`` per blind-rotate step."""
    params = keys.params
    if orientation not in ("matmul", "fused", "fused_otf"):
        assert params.bsk_base_log <= 7, (
            "conv fast path needs bootstrap digits that fit int8 after "
            f"negation (base_log {params.bsk_base_log} > 7)")
    else:
        assert params.bsk_base_log <= 8
    assert params.ksk_base_log <= 7

    n = params.lwe_dim
    k1 = params.glwe_dim + 1
    rows = k1 * params.bsk_level
    N = params.poly_size

    if orientation == "fused_otf":
        # Compact key form for the on-the-fly fused kernel: per (step, row,
        # limb λ, component c) the length-2N anti-periodic limb extension
        # E = [limbs(−poly)_λ, limbs(poly)_λ].  Row j of the negacyclic
        # matrix is the CYCLIC rotation roll(E, j)[N:2N] — the X^N = −1
        # sign structure lives in E's data, so rotation in limb space is
        # exact and the kernel rebuilds each [rows·N, N] chunk in VMEM by
        # log2(N) roll-doubling stages.  HBM: n·L·(k+1)·rows·2N bytes
        # (~46 MB at the bench anchor vs 11.9 GB precomputed).
        drop = N_LIMBS - bsk_limbs
        pos = signed_limbs(keys.bsk, N_LIMBS, LIMB_BITS)     # [n,r,k+1,N,L]
        neg = signed_limbs(-keys.bsk, N_LIMBS, LIMB_BITS)
        ext = jnp.concatenate([neg, pos], axis=-2)           # [n,r,k+1,2N,L]
        ext = ext[..., drop:]
        ext = jnp.transpose(ext, (0, 4, 2, 1, 3))            # [n,L,k+1,r,2N]
        kern = ext.reshape(n, bsk_limbs * k1, rows, 2 * N).astype(jnp.int8)

        kn_l = params.big_dim * params.ksk_level
        ksk_limbs = signed_limbs(
            keys.ksk.reshape(kn_l, params.lwe_dim + 1), N_LIMBS, LIMB_BITS)
        ksk_limbs = jnp.moveaxis(ksk_limbs, -1, 0).astype(jnp.int8)
        return FastKeys(params, kern, ksk_limbs, orientation)

    if orientation in ("matmul", "fused"):
        # Precomputed negacyclic matrices of every GGSW row poly, as int8
        # limbs: [n, L, rows*N, (k+1)*N].  The external product becomes one
        # s8xs8->s32 dot_general per limb — the MXU-native integer path.
        # Memory: n * L * rows*N * (k+1)*N bytes (e.g. 11.9 GB for
        # n=630, k=2, N=512, l=2).  Construction is gather-free (TPU
        # gathers scalarize): row j of the negacyclic matrix is X^j·poly,
        # and the stack of all N rotations is built by log2(N) doubling
        # steps of *static* negacyclic rolls; chunks accumulate into a
        # donated preallocated buffer.
        from .polymul import negacyclic_rotation_stack as all_rotations

        n_polys = rows * k1

        drop = N_LIMBS - bsk_limbs

        def build_chunk(bsk_chunk):                      # [c, rows, k+1, N]
            c = bsk_chunk.shape[0]
            polys = bsk_chunk.reshape(c * n_polys, N)
            mats = all_rotations(polys)
            mats = mats.reshape(c, rows, k1, N, N)       # [c, r, comp, j, t]
            limbs = signed_limbs(mats, N_LIMBS, LIMB_BITS)
            limbs = limbs[..., drop:]                    # quantized BSK
            # contraction dim (r, j) major; output dim (limb, comp, t):
            # limb-major so one wide matmul covers all limbs
            limbs = jnp.transpose(limbs, (0, 1, 3, 5, 2, 4))
            return limbs.reshape(c, rows * N, bsk_limbs * k1 * N) \
                .astype(jnp.int8)

        # ONE jit builds straight into the final [n, rows·N, L·k1·N] buffer:
        # a fori_loop whose carry is the output (XLA aliases the carry, so
        # dynamic_update_slice is in-place).  Reshaping OUTSIDE the jit
        # copies the full ~11.9 GB buffer and OOMs the chip; small chunks
        # keep the per-iteration int32 transients to a few hundred MB.
        import numpy as _np
        chunk = 1
        for c in (2, 3, 5, 7, 4, 6, 8, 9, 10, 16):
            if n % c == 0:
                chunk = c
                break
        bsk_r = keys.bsk.reshape(n // chunk, chunk, rows, k1, N)
        out_shape = (n, rows * N, bsk_limbs * k1 * N)

        @jax.jit
        def build_all(b):
            out = jnp.zeros(out_shape, jnp.int8)

            def body(idx, out):
                mat = build_chunk(b[idx])            # [chunk, rows·N, D]
                return jax.lax.dynamic_update_slice(
                    out, mat, (idx * chunk, 0, 0))

            return jax.lax.fori_loop(0, n // chunk, body, out)

        kern = build_all(bsk_r)
        _np.asarray(kern[:1, :1, :1])  # real completion barrier
        kn_l = params.big_dim * params.ksk_level
        ksk_limbs = signed_limbs(
            keys.ksk.reshape(kn_l, params.lwe_dim + 1),
            N_LIMBS, LIMB_BITS)
        ksk_limbs = jnp.moveaxis(ksk_limbs, -1, 0).astype(jnp.int8)
        return FastKeys(params, kern, ksk_limbs, orientation)

    if orientation == "keys_rhs":
        # bsk [n, rows, k+1, N] -> kernels [n, (c_out, limb), rows, N]
        kern = _limb_kernels(keys.bsk)                   # [n, rows, k+1, L, N]
        kern = jnp.moveaxis(kern, 1, 3)                  # [n, k+1, L, rows, N]
        kern = kern.reshape(n, k1 * N_LIMBS, rows, N)
    else:
        assert orientation in ("keys_lhs", "keys_lhs_bf16")
        # negacyclic extension e_K = [-K, K] in int32 FIRST: negating int8
        # limbs would overflow at -128; limb recombination is positionwise
        # linear, so limb-splitting the extended poly is equivalent.
        ext = jnp.concatenate([-keys.bsk, keys.bsk], axis=-1)  # [n,rows,k+1,2N]
        limbs = signed_limbs(ext, N_LIMBS, LIMB_BITS)    # [n,rows,k+1,2N,L]
        limbs = jnp.moveaxis(limbs, -1, -2)              # [n,rows,k+1,L,2N]
        limbs = jnp.moveaxis(limbs, 1, 3)                # [n,k+1,L,rows,2N]
        kern = limbs.reshape(n, k1 * N_LIMBS, rows, 2 * N)
        # bf16 holds the 8-bit limbs exactly; int8 for the s32 conv path
        kern = kern.astype(jnp.bfloat16 if orientation == "keys_lhs_bf16"
                           else jnp.int8)

    kn_l = params.big_dim * params.ksk_level
    ksk_limbs = signed_limbs(keys.ksk.reshape(kn_l, params.lwe_dim + 1),
                             N_LIMBS, LIMB_BITS)         # [kn_l, n+1, L]
    ksk_limbs = jnp.moveaxis(ksk_limbs, -1, 0).astype(jnp.int8)

    return FastKeys(params, kern, ksk_limbs, orientation)


def _combine_limbs(x: jnp.ndarray, axis: int,
                   drop: int = 0) -> jnp.ndarray:
    """Σ_m x_m << (8·(m+drop)) along ``axis`` (exact mod 2^32).

    ``drop`` > 0 means the least-significant limbs were omitted upstream
    (quantized bootstrapping key): remaining limbs shift up accordingly.
    """
    n_limbs = x.shape[axis]
    parts = [jnp.take(x, m, axis=axis).astype(I32)
             << (LIMB_BITS * (m + drop)) for m in range(n_limbs)]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def external_product_conv(diff: jnp.ndarray, kernels: jnp.ndarray,
                          params: TFHEParams,
                          orientation: str = "keys_rhs") -> jnp.ndarray:
    """GGSW ⊡ diff as one integer convolution: [B, k+1, N] -> [B, k+1, N]."""
    l, b = params.bsk_level, params.bsk_base_log
    k1 = params.glwe_dim + 1
    N = params.poly_size
    batch = diff.shape[0]

    digits = gadget_decompose(diff, b, l)                # [B, k+1, N, l]
    digits = jnp.moveaxis(digits, -1, 2)                 # [B, k+1, l, N]
    digits = digits.reshape(batch, k1 * l, N).astype(jnp.int8)

    if orientation == "matmul":
        # kernels: [rows*N, L*(k+1)*N] int8 precomputed negacyclic limbs,
        # limb-major in the output dim so all limbs ride ONE wide s8 matmul
        # (L < 4 means the low limbs were dropped — quantized BSK)
        flat = digits.reshape(batch, k1 * l * N)
        n_l = kernels.shape[1] // (k1 * N)
        prods = jnp.einsum("bt,td->bd", flat, kernels,
                           preferred_element_type=I32)   # [B, L*k1*N]
        prods = prods.reshape(batch, n_l, k1 * N)
        out = _combine_limbs(prods, axis=1, drop=N_LIMBS - n_l)
        return out.reshape(batch, k1, N)

    if orientation == "keys_rhs":
        # negacyclic extension of the digits: e[m] = d[m] (m>=0), -d[m+N]
        # (m<0)  =>  lhs = [-d, d]; kernels are the reversed key limbs.
        d_ext = jnp.concatenate([-digits, digits], axis=-1)  # [B, rows, 2N]
        out = jax.lax.conv_general_dilated(
            d_ext, kernels,
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=I32)                  # [B, k1*L, N+1]
        out = out[..., 1:]                               # valid window shift
        out = out.reshape(batch, k1, N_LIMBS, N)
        return _combine_limbs(out, axis=2)               # [B, k+1, N]

    if orientation == "keys_lhs":
        # keys_lhs: key limbs are the (pre-extended) conv input, reversed
        # digits are the weights; output channels = ciphertext batch
        # (fills MXU lanes).
        out = jax.lax.conv_general_dilated(
            kernels, digits[..., ::-1],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=I32)                  # [G, B, N+1]
        out = out[..., 1:]                               # [k1*L, B, N]
        out = out.reshape(k1, N_LIMBS, batch, N)
        out = _combine_limbs(out, axis=1)                # [k1, B, N]
        return jnp.moveaxis(out, 0, 1)                   # [B, k+1, N]

    # keys_lhs_bf16: TPU XLA has no s8 convolution path (s8 convs are
    # upcast to s32 and run at VPU rate).  The MXU path is bf16 with f32
    # accumulation, which is EXACT as long as every accumulated value
    # stays below 2^24.  Key limbs are <=128 (8 bits); splitting each
    # digit into sub-limbs d = 16*d_hi + d_lo (|d_lo|<=8, |d_hi|<=4)
    # bounds each conv accumulation by rows*N * 128*8 < 2^24.  Two bf16
    # convs (lo/hi) recombine exactly in int32.
    assert orientation == "keys_lhs_bf16"
    d_rev = digits[..., ::-1].astype(I32)
    d_lo = ((d_rev + 8) & 15) - 8                        # [-8, 7]
    d_hi = (d_rev - d_lo) >> 4                           # [-4, 4]
    outs = []
    for dsub in (d_lo, d_hi):
        o = jax.lax.conv_general_dilated(
            kernels, dsub.astype(jnp.bfloat16),
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)          # [G, B, N+1] f32
        outs.append(o[..., 1:].astype(I32))
    out = outs[0] + (outs[1] << 4)                       # [k1*L, B, N]
    out = out.reshape(k1, N_LIMBS, batch, N)
    out = _combine_limbs(out, axis=1)
    return jnp.moveaxis(out, 0, 1)


def keyswitch_fast(big_cts: jnp.ndarray, fast: FastKeys) -> jnp.ndarray:
    params = fast.params
    kn = params.big_dim
    batch = big_cts.shape[0]
    digits = gadget_decompose(big_cts[:, :kn], params.ksk_base_log,
                              params.ksk_level)
    flat = digits.reshape(batch, kn * params.ksk_level).astype(jnp.int8)
    prods = jnp.einsum("bt,mtd->bmd", flat, fast.ksk_limbs,
                       preferred_element_type=I32)       # [B, L, n+1]
    out = -_combine_limbs(prods, axis=1)
    return out.at[:, params.lwe_dim].add(big_cts[:, kn])


def _modswitch(x, params: TFHEParams):
    log2n1 = params.poly_size.bit_length()
    u = jnp.asarray(x).astype(jnp.uint32)
    return ((u + jnp.uint32(1 << (Q_BITS - log2n1 - 1)))
            >> jnp.uint32(Q_BITS - log2n1)).astype(I32)


@partial(jax.jit, static_argnums=(0, 1))
def _fbs_fast_impl(params: TFHEParams, orientation: str, bsk_kernels,
                   ksk_limbs, big_cts, test_polys, posts):
    fast = FastKeys(params, bsk_kernels, ksk_limbs, orientation)
    n, k, N = params.lwe_dim, params.glwe_dim, params.poly_size
    batch = big_cts.shape[0]

    shifted = big_cts.at[:, -1].add(I32(params.half_window))
    small = keyswitch_fast(shifted, fast)

    a_t = _modswitch(small[:, :n], params)
    b_t = _modswitch(small[:, n], params)

    if orientation in ("fused", "fused_otf"):
        # all n CMux steps in one Pallas kernel, accumulator VMEM-resident
        from .fused_blind_rotate import blind_rotate_fused
        b_init = ((2 * N - b_t) % (2 * N))[:, None]
        a_steps = jnp.transpose(a_t)[:, :, None]
        acc = blind_rotate_fused(b_init, a_steps, test_polys, bsk_kernels,
                                 params,
                                 jax.default_backend() != "tpu")
        acc = jnp.transpose(acc, (1, 0, 2))              # [B, k+1, N]
        a = acc[:, :k, :]
        a_ext = jnp.concatenate([a[..., :1], -a[..., :0:-1]], axis=-1)
        out = jnp.concatenate(
            [a_ext.reshape(batch, k * N), acc[:, k, :1]], axis=1)
        return out.at[:, -1].add(posts)

    v_init = monomial_rotate(test_polys, (2 * N - b_t) % (2 * N))
    acc = jnp.concatenate(
        [jnp.zeros((batch, k, N), dtype=I32), v_init[:, None, :]], axis=1)

    if orientation == "matmul":
        # MXU-native rotation; scan streams the per-step key slices
        def step(acc, xs):
            a_i, kern_i = xs
            rotated = monomial_rotate_onehot(acc, a_i)
            return acc + external_product_conv(
                rotated - acc, kern_i, params, orientation), None
        acc, _ = jax.lax.scan(step, acc, (a_t.T, bsk_kernels))
    else:
        def step(i, acc):
            rotated = monomial_rotate(acc, a_t[:, i][:, None])
            return acc + external_product_conv(rotated - acc, bsk_kernels[i],
                                               params, orientation)
        acc = jax.lax.fori_loop(0, n, step, acc)

    # sample extract
    a = acc[:, :k, :]
    a_ext = jnp.concatenate([a[..., :1], -a[..., :0:-1]], axis=-1)
    out = jnp.concatenate([a_ext.reshape(batch, k * N), acc[:, k, :1]],
                          axis=1)
    return out.at[:, -1].add(posts)


def functional_bootstrap_fast(fast: FastKeys, big_cts, test_polys, posts):
    """Batched FBS on the MXU conv path; semantics identical to
    :func:`tfhe_fbs_map_tpu.tfhe.pbs.functional_bootstrap`."""
    return _fbs_fast_impl(fast.params, fast.orientation, fast.bsk_kernels,
                          fast.ksk_limbs, big_cts, test_polys, posts)
