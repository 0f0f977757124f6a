"""TFHE parameter optimizer: (precision p, sq_norm2) → (params, cost, p_error).

Drop-in for the role of the patched concrete-optimizer in the reference
pipeline (``experiments/add_exec_estimates.py:9-16`` invokes
``optimizer --precision=<p> --sq-norm2=<norm2>`` and parses the
second-to-last comma field as the bootstrap cost).  Differences by design:

* the cost model is a **TPU roofline** (MXU int8 MACs + HBM streaming at
  large ciphertext batch), not a CPU FFT model — costs are microseconds per
  bootstrap at batch saturation;
* security is enforced via the 128-bit curve ``min_noise_std_rel``
  (tfhe/params.py) for both the LWE and GLWE keys;
* candidates are restricted to the MXU s8-matmul fast path by default:
  gadget base_log ≤ 8 (digits must fit int8) and the precomputed negacyclic
  key-matrix limbs must fit the HBM budget
  (``n · 4 · (k+1)·l·N · (k+1)·N`` bytes ≤ 12 GB).

A C++ implementation of the same grid search lives in
``native/optimizer.cpp`` (built via ctypes) for harness-scale sweeps; this
module is the reference implementation and fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..tfhe.params import TFHEParams, min_noise_std_rel, Q
from .noise import P_ERROR_4_SIGMA, p_error_atomic

__all__ = ["Solution", "optimize", "bootstrap_cost_us"]

# TPU v5e-class roofline constants (per chip)
MXU_INT8_OPS = 394e12          # ops/s (2 ops per MAC)
HBM_BYTES = 820e9              # bytes/s
# measured MXU utilizations of the fused Pallas blind-rotate kernel (r2,
# v5e): streamed precomputed key matrices (0.70 measured at the anchor) vs
# the on-the-fly rotation-strip rebuild (0.45-0.72 across the p8/p16/p32
# presets; 0.55 is the flat mid-point) — ops/fused_blind_rotate.py, PERF.md
MXU_EFF_FUSED = 0.65
MXU_EFF_OTF = 0.55
MATMUL_HBM_BUDGET = 12e9       # precomputed key-matrix budget (bytes)
GENERIC_PATH_SLOWDOWN = 140.0  # measured generic-vs-fused ratio (r1)


@dataclass(frozen=True)
class Solution:
    params: TFHEParams
    cost: float                # microseconds per bootstrap (batch-amortized)
    p_error: float
    bsk_limbs: int = 4         # < 4: limb-dropped (quantized) BSK matrices


def bootstrap_cost_us(n: int, k: int, N: int, br_l: int, ks_l: int,
                      bsk_limbs: int = 4) -> float:
    """Roofline model: µs per bootstrap at large batch.

    Key matrices that fit the HBM budget stream from HBM (orientation
    "fused"); larger sets rebuild negacyclic tiles in VMEM (orientation
    "fused_otf") at a lower measured MXU utilization.  ``bsk_limbs`` < 4
    (quantized BSK) removes the dropped limbs' MACs and bytes.
    """
    mat_bytes = n * float(bsk_limbs) * (k + 1) * br_l * N * (k + 1) * N
    eff = MXU_EFF_FUSED if mat_bytes <= MATMUL_HBM_BUDGET else MXU_EFF_OTF
    # blind rotate: n conv steps of rows x N x (k+1) x N MACs per kept limb
    br_macs = n * (k + 1) ** 2 * br_l * N * N * bsk_limbs
    # keyswitch: kN*l x (n+1) matmul x 4 limbs
    ks_macs = k * N * ks_l * (n + 1) * 4
    compute_s = 2.0 * (br_macs + ks_macs) / (MXU_INT8_OPS * eff)
    # per-ct HBM traffic: ACC read+write+rotate per step (batch >> 1 keeps
    # key streaming amortized)
    acc_bytes = n * 3 * (k + 1) * N * 4
    mem_s = acc_bytes / HBM_BYTES
    return max(compute_s, mem_s) * 1e6


def optimize(p: int, sq_norm2: float,
             max_p_error: float = P_ERROR_4_SIGMA,
             fast_path_only: bool = True,
             security_bits: int = 128) -> Solution | None:
    """Grid-search the cheapest parameter set meeting the error target.

    ``fast_path_only=True`` restricts to the fused Pallas fast path
    (gadget base ≤ 2^8 so digits fit int8); the on-the-fly key form
    removes the old HBM-budget constraint, so the generic fallback only
    triggers for parameter regimes outside the int8-digit envelope.
    """
    best = _optimize_inner(p, sq_norm2, max_p_error, True)
    if best is None:
        best = _optimize_inner(p, sq_norm2, max_p_error, False)
        if best is not None:
            best = Solution(best.params,
                            best.cost * GENERIC_PATH_SLOWDOWN,
                            best.p_error)
    return best


def _optimize_inner(p: int, sq_norm2: float, max_p_error: float,
                    fast_path_only: bool) -> Solution | None:
    best: Solution | None = None

    glwe_shapes = [(1, 1024), (2, 512), (1, 2048), (2, 1024), (3, 512),
                   (4, 512), (2, 2048), (1, 4096)]
    # int8 digits (the MXU fast path) need base ≤ 2^8; the generic
    # gather-based fallback can use wider digits
    max_base = 8 if fast_path_only else 12

    # BSK limb-drop quantization is a fast-path (matmul/fused) key layout
    # knob: the generic gather path always uses exact keys
    drops = (0, 1) if fast_path_only else (0,)

    for k, N in glwe_shapes:
        if N < 2 * p:        # need at least one poly coeff per half-window
            continue
        glwe_std = min_noise_std_rel(k * N) * Q
        for n in range(450, 1100, 32):
            lwe_std = min_noise_std_rel(n) * Q
            for br_b in range(4, max_base + 1):
                for br_l in range(1, 5):
                    if br_b * br_l > 32:
                        continue
                    for ks_b in range(2, max_base + 1):
                        for ks_l in range(1, 9):
                            if ks_b * ks_l > 32:
                                continue
                            for drop in drops:
                                cost = bootstrap_cost_us(n, k, N, br_l,
                                                         ks_l, 4 - drop)
                                if best is not None and cost >= best.cost:
                                    continue
                                perr = p_error_atomic(
                                    p, sq_norm2, n, k, N, br_l, br_b, ks_l,
                                    ks_b, lwe_std, glwe_std,
                                    dropped_limbs=drop)
                                if perr > max_p_error:
                                    continue
                                params = TFHEParams(
                                    p=p, lwe_dim=n, glwe_dim=k, poly_size=N,
                                    bsk_level=br_l, bsk_base_log=br_b,
                                    ksk_level=ks_l, ksk_base_log=ks_b,
                                    lwe_noise_std=lwe_std,
                                    glwe_noise_std=glwe_std)
                                best = Solution(params, cost, perr, 4 - drop)
    return best


def format_solution_line(sol: Solution) -> str:
    """Concrete-optimizer-compatible output row: the estimate pipeline
    parses ``split(',')[-2]`` as the cost (add_exec_estimates.py:14-16)."""
    pr = sol.params
    return (f"  {pr.glwe_dim}, {pr.poly_size}, {pr.lwe_dim}, "
            f"{pr.bsk_level},{pr.bsk_base_log}, "
            f"{pr.ksk_level},{pr.ksk_base_log}, "
            f"{int(round(sol.cost))}, {sol.p_error:.1e}")
