"""Fully-fused Pallas blind-rotate kernel.

One ``pallas_call`` executes all ``n`` CMux steps of the blind rotation
(the executor core the reference delegates to Zama Concrete — SURVEY.md §2
C18) with the accumulator resident in VMEM for the whole loop:

* grid = (n steps, bsk_limbs·(k+1) output chunks); key material streams
  HBM→VMEM one chunk per grid step, double-buffered by the Pallas
  pipeline — either a precomputed [rows·N, N] negacyclic matrix limb
  (orientation "fused") or a compact [rows, 2N] anti-periodic limb
  extension (orientation "fused_otf") expanded in VMEM into a
  **[rows·T, 2N] rotation strip** (only T ≪ N cyclic rotations per GGSW
  row); the negacyclic contraction then runs as (N/T)² block-dots whose
  rhs are static lane-slices of the strip — every [T, T] tile of the
  full negacyclic matrix is a T-aligned window of the strip, so the
  VPU rebuild traffic drops from N·2N to T·2N bytes per row (16× at
  N=2048) and the freed VMEM goes to a bigger ciphertext batch;
* the per-ciphertext monomial rotation is a **barrel shifter fused in
  VMEM**: log2(2N) stages of static ``pltpu.roll`` + per-row bit selects.
  (The XLA version of this materializes every stage through HBM — PERF.md;
  in-kernel it is pure VPU work.)
* gadget decomposition (VPU integer ops) writes int8 digits to a VMEM
  scratch once per step; each chunk then runs ONE s8×s8→s32 MXU ``dot``
  and accumulates the limb-shifted product straight into the accumulator
  (= the output block, flushed to HBM once at the end).

Accumulator layout is [k+1, B, N] — batch on sublanes, coefficients on
lanes, GLWE components as an un-tiled leading axis (a [B, k+1, N] layout
would waste 8/(k+1) of VMEM to sublane padding).

Bit-identical to :func:`tfhe_fbs_map_tpu.tfhe.pbs.blind_rotate` (asserted in
tests/test_fast_path.py); used by ``functional_bootstrap_fast`` via
orientation="fused".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tfhe.numeric import I32
from ..tfhe.params import TFHEParams

__all__ = ["blind_rotate_fused"]

U32 = jnp.uint32


def _barrel_rotate(x: jnp.ndarray, amt: jnp.ndarray,
                   interpret: bool) -> jnp.ndarray:
    """X^amt · x with per-row amounts: log2(2N) static-roll stages.

    ``x``: [B, N] int32 (N on lanes); ``amt``: [B, 1] int32 in [0, 2N).
    The barrel is ~40% of the otf kernel runtime at N=2048
    (profile_fused.py), so stage op count dominates the VPU budget.  The
    stages are PURE CYCLIC (roll + bit-select, 2 ops — no per-stage sign
    handling): a negacyclic rotation by ``a`` equals the cyclic rotation
    by ``a mod N`` with sign ``−1 iff (t < a mod N) XOR (a >= N)``, so all
    X^N = −1 bookkeeping collapses into one masked-negate epilogue.
    """
    n = x.shape[-1]
    out = x
    shift = 1
    while shift < n:                       # cyclic barrel over a mod N
        if interpret:
            rolled = jnp.roll(out, shift, axis=1)
        else:
            rolled = pltpu.roll(out, shift, axis=1)
        out = jnp.where((amt & shift) != 0, rolled, out)
        shift *= 2
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    neg = (col < (amt & (n - 1))) ^ ((amt & n) != 0)
    return jnp.where(neg, -out, out)


def _decompose_digits(diff: jnp.ndarray, base_log: int,
                      levels: int) -> list[jnp.ndarray]:
    """Balanced signed gadget digits, most-significant level first.

    Mirrors :func:`tfhe_fbs_map_tpu.tfhe.numeric.gadget_decompose` with
    elementwise uint32 ops.  ``diff``: [B, N] int32; digits ∈ [-2^(b-1),
    2^(b-1)) fit int8 for base_log ≤ 8.
    """
    b, l = base_log, levels
    u = diff.astype(U32)
    closest = (u + U32(1 << (31 - b * l))) >> U32(32 - b * l)
    half = 1 << (b - 1)
    mask = U32((1 << b) - 1)
    # biased form: adding `half` at every level position makes the digit
    # carries ride the single add's carry chain, so each digit is one
    # shift+mask+sub instead of the 6-op compare/carry loop (digit-exact
    # vs tfhe.numeric.gadget_decompose, asserted in tests/test_fast_path)
    w = closest + U32(sum(half << (b * i) for i in range(l)))
    return [((w >> U32(b * i)) & mask).astype(I32) - half
            for i in range(l)][::-1]


def _kernel(binit_ref, a_ref, tv_ref, kern_ref, out_ref, dig_ref,
            params: TFHEParams, n_limbs: int, interpret: bool):
    k1 = params.glwe_dim + 1
    l, b = params.bsk_level, params.bsk_base_log
    N = params.poly_size
    drop = 4 - n_limbs

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        for c in range(k1 - 1):
            out_ref[c] = jnp.zeros_like(out_ref[c])
        out_ref[k1 - 1] = _barrel_rotate(tv_ref[:], binit_ref[:], interpret)

    @pl.when(j == 0)
    def _rotate_and_decompose():
        # all k+1 components in ONE barrel/decompose pass ([k1·B, N]) —
        # same element volume, 3x fewer vector-op issues
        batch = dig_ref.shape[0]
        amt = a_ref[0]
        acc = out_ref[:].reshape(k1 * batch, N)
        amt_all = jnp.broadcast_to(amt[None], (k1,) + amt.shape) \
            .reshape(k1 * batch, 1)
        diff = _barrel_rotate(acc, amt_all, interpret) - acc
        for lev, d in enumerate(_decompose_digits(diff, b, l)):
            d8 = d.astype(jnp.int8)
            for c in range(k1):
                dig_ref[:, (c * l + lev) * N:(c * l + lev + 1) * N] = \
                    d8[c * batch:(c + 1) * batch]

    limb = j // k1
    comp = j % k1

    prods = jax.lax.dot_general(
        dig_ref[:], kern_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=I32)                   # [B, N]

    out_ref[comp] += prods << (8 * (limb + drop))


def _sub_batch(batch: int, N: int) -> int:
    """Barrel-rotate group size: keeps the ~4 live [SB, N] int32 temps of
    the rotate/decompose pass near 2 MB so they do not crowd the batch out
    of VMEM at large N."""
    sb = max(8, (1 << 19) // (4 * N) // 8 * 8)
    return min(batch, sb)


# Profiling knobs (experiments/profile_fused.py): skip kernel phases to
# bisect where the time goes ("rot", "build", "dots"), override the strip
# tile.  Never set in production paths.
_DEBUG_SKIP: tuple = ()
_TILE_OVERRIDE: int | None = None


def _kernel_otf(binit_ref, a_ref, tv_ref, kern_ref, out_ref, dig_ref,
                strip_ref, params: TFHEParams, n_limbs: int, tile: int,
                interpret: bool):
    """On-the-fly orientation: rotation-strip build + (N/T)² block dots.

    The full negacyclic matrix of a GGSW row poly has entries
    ``M[j, t] = E[N + t − j]`` (E = the [2N] anti-periodic limb extension;
    the index never wraps for j, t ∈ [0, N)).  Every [T, T] tile of M with
    j ∈ wT+[0,T), t ∈ uT+[0,T) is therefore a T-aligned lane-window of the
    small **rotation strip** ``S[jj, x] = E[(x − jj) mod 2N]`` (jj < T):
    ``M[wT+jj, uT+v] = S[jj, N + (u−w)T + v]``.  So building T cyclic
    rotations per row (T·2N bytes, vs N·2N for the full matrix) suffices,
    and the contraction runs as n_w² dots ``dig_tile[w] @ S[:, off:off+T]``
    with compile-time offsets.
    """
    k1 = params.glwe_dim + 1
    l, b = params.bsk_level, params.bsk_base_log
    N = params.poly_size
    rows = k1 * l
    drop = 4 - n_limbs
    T = tile
    n_w = N // T
    batch = out_ref.shape[1]
    sb = _sub_batch(batch, N)
    groups = [(o, min(sb, batch - o)) for o in range(0, batch, sb)]

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        for c in range(k1 - 1):
            out_ref[c] = jnp.zeros_like(out_ref[c])
        for off, g in groups:
            out_ref[k1 - 1, off:off + g, :] = _barrel_rotate(
                tv_ref[off:off + g, :], binit_ref[off:off + g, :], interpret)

    @pl.when(jnp.logical_and(j == 0, "rot" not in _DEBUG_SKIP))
    def _rotate_and_decompose():
        # sub-batched: the [SB, N] barrel temps stay small so VMEM goes to
        # the ciphertext batch instead; digits land tile-major in dig_ref
        # ([n_w, B, rows·T]) so each block dot's lhs is one contiguous load
        for c in range(k1):
            for off, g in groups:
                if "rot_src" in _DEBUG_SKIP:  # timing probe: break the
                    x = tv_ref[off:off + g, :]  # step-to-step RAW chain
                else:
                    x = out_ref[c, off:off + g, :]
                amt = a_ref[0, off:off + g, :]
                diff = _barrel_rotate(x, amt, interpret) - x
                for lev, d in enumerate(_decompose_digits(diff, b, l)):
                    d8 = d.astype(jnp.int8)
                    r = c * l + lev
                    for w in range(n_w):
                        dig_ref[w, off:off + g, r * T:(r + 1) * T] = \
                            d8[:, w * T:(w + 1) * T]

    limb = j // k1
    comp = j % k1

    # rotation strip: T cyclic rolls of each row's [2N] extension, by
    # log2(T) doubling stages (Mosaic has no int8 lane-rotate — "Rotate
    # with non-32-bit data" — but two lane-slices + a concat express the
    # same cyclic roll)
    for r in range(rows if "build" not in _DEBUG_SKIP else 0):
        strip_ref[r * T:r * T + 1, :] = kern_ref[0, 0, r:r + 1, :]
        s = 1
        while s < T:
            src = strip_ref[r * T:r * T + s, :]
            rolled = jnp.concatenate(
                [src[:, 2 * N - s:], src[:, :2 * N - s]], axis=1)
            strip_ref[r * T + s:r * T + 2 * s, :] = rolled
            s *= 2

    for u in range(n_w if "dots" not in _DEBUG_SKIP else 0):
        acc = jnp.zeros((batch, T), dtype=I32)
        for w in range(n_w):
            off = N + (u - w) * T
            acc = acc + jax.lax.dot_general(
                dig_ref[w], strip_ref[:, off:off + T],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=I32)               # [B, T]
        out_ref[comp, :, u * T:(u + 1) * T] += acc << (8 * (limb + drop))


VMEM_BUDGET = 13e6             # usable bytes out of the 16 MB/core


def _tile(params: TFHEParams) -> int:
    """Rotation-strip depth for the otf kernel: one full MXU lane tile."""
    if _TILE_OVERRIDE is not None:
        return min(_TILE_OVERRIDE, params.poly_size)
    return min(128, params.poly_size)


def _max_batch(params: TFHEParams, otf: bool) -> int:
    """Largest batch tile whose kernel working set fits VMEM."""
    k1 = params.glwe_dim + 1
    N = params.poly_size
    rows_n = k1 * params.bsk_level * N
    if otf:
        # rotation strip + sub-batched barrel temps (~4 live [SB, N] int32)
        fixed = rows_n * 2 * _tile(params) + 4 * 4 * N * _sub_batch(1 << 30, N)
        per_b = k1 * N * 4 + N * 4 + rows_n
    else:
        fixed = 2 * rows_n * N                     # dbl-buffered kern chunk
        # out + tv (int32) + digits (int8) + ~3 live barrel temps (int32)
        per_b = k1 * N * 4 + N * 4 + rows_n + 12 * N
    b = int((VMEM_BUDGET - fixed) // per_b)
    return max(8, (b // 8) * 8)


@functools.partial(jax.jit, static_argnums=(4, 5))
def blind_rotate_fused(b_init: jnp.ndarray, a_t: jnp.ndarray,
                       test_polys: jnp.ndarray, kernels: jnp.ndarray,
                       params: TFHEParams,
                       interpret: bool = False) -> jnp.ndarray:
    """All-steps-fused blind rotation → accumulator [k+1, B, N] int32.

    ``b_init``: [B, 1] int32 initial rotation amounts ((2N − b~) mod 2N);
    ``a_t``: [n, B, 1] int32 per-step amounts in [0, 2N);
    ``test_polys``: [B, N] int32; ``kernels``: either

    * [n, rows·N, L·(k+1)·N] int8 — precomputed negacyclic key-matrix limbs
      (``prepare_fast_keys`` orientation="fused"; limb-major output dim,
      streamed HBM→VMEM one chunk per grid step), or
    * [n, L·(k+1), rows, 2N] int8 — compact anti-periodic limb extensions
      (orientation="fused_otf": ~N×/512× less HBM; each chunk's matrix is
      rebuilt in VMEM by cyclic-roll doubling).

    Batches larger than the VMEM envelope are processed in slices via
    ``lax.map`` (one sequential kernel launch per slice).
    """
    batch, N = test_polys.shape
    otf_ = kernels.ndim == 4
    max_b = _max_batch(params, otf_)
    if batch > max_b:
        pad = (-batch) % max_b
        s = (batch + pad) // max_b

        def pad_to(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0) \
                if pad else x

        b_s = pad_to(b_init).reshape(s, max_b, 1)
        tv_s = pad_to(test_polys).reshape(s, max_b, N)
        a_s = jnp.moveaxis(pad_to(jnp.moveaxis(a_t, 1, 0)), 0, 1) \
            .reshape(a_t.shape[0], s, max_b, 1)
        a_s = jnp.moveaxis(a_s, 1, 0)                     # [s, n, max_b, 1]

        out = jax.lax.map(
            lambda xs: _blind_rotate_call(xs[0], xs[1], xs[2], kernels,
                                          params, interpret),
            (b_s, a_s, tv_s))                             # [s, k+1, max_b, N]
        out = jnp.moveaxis(out, 1, 0).reshape(
            params.glwe_dim + 1, s * max_b, N)
        return out[:, :batch]
    return _blind_rotate_call(b_init, a_t, test_polys, kernels, params,
                              interpret)


def _blind_rotate_call(b_init, a_t, test_polys, kernels,
                       params: TFHEParams, interpret: bool) -> jnp.ndarray:
    batch, N = test_polys.shape
    k1 = params.glwe_dim + 1
    l = params.bsk_level
    n = a_t.shape[0]
    rows_n = k1 * l * N
    otf = kernels.ndim == 4
    n_chunks = kernels.shape[1] if otf else kernels.shape[2] // N
    n_limbs = n_chunks // k1

    if otf:
        T = _tile(params)
        kern_spec = pl.BlockSpec((1, 1, k1 * l, 2 * N),
                                 lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
        # tile-major per-step digits + the shared rotation strip
        scratch = [pltpu.VMEM((N // T, batch, k1 * l * T), jnp.int8),
                   pltpu.VMEM((k1 * l * T, 2 * N), jnp.int8)]
        body = functools.partial(_kernel_otf, params=params,
                                 n_limbs=n_limbs, tile=T,
                                 interpret=interpret)
    else:
        kern_spec = pl.BlockSpec((1, rows_n, N), lambda i, j: (i, 0, j),
                                 memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((batch, rows_n), jnp.int8)]  # per-step digits
        body = functools.partial(_kernel, params=params, n_limbs=n_limbs,
                                 interpret=interpret)

    return pl.pallas_call(
        body,
        grid=(n, n_chunks),
        in_specs=[
            pl.BlockSpec((batch, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, N), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            kern_spec,
        ],
        out_specs=pl.BlockSpec((k1, batch, N), lambda i, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k1, batch, N), jnp.int32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(b_init, a_t, test_polys, kernels)
