"""Launch-aware program-level runtime predictor.

The per-boot roofline (:func:`optimizer.bootstrap_cost_us`) is accurate at
kernel-batch saturation but ignores three program-level terms that the r4
measurements exposed (PERF.md lesson 21: the staged Kreyvium-1152 run
measured 861 boots/s vs 4016 native at EQUAL modeled per-boot cost —
reconstructing the run shows both pipelines even picked the *same*
(k=2, N=512, l=4) family, so the whole 4.7x gap was program-level):

* **per-level-call fixed cost** — one jitted level step dispatches a fused
  Pallas call whose rotation-strip rebuild (orientation ``fused_otf``) or
  key-matrix stream (``fused``) does not scale with batch, plus the
  dispatch/launch latency of the call itself (large over the tunneled
  backend);
* **level padding** — per-level bootstrap counts are bucketed to powers of
  two so level shapes share compiled kernels
  (``runtime/executor.py``);
* **two calls per level** for the staged dual-family pipeline.

:func:`predict_native_us` / :func:`predict_staged_us` price a whole
program at a given evaluation batch; the runtime CLI routes
staged-vs-native on this prediction instead of the r4 fixed 0.8 margin
(``runtime/cli.py``).  Constants are calibrated on hardware by
``experiments/calibrate_runtime.py`` into ``optimizer/calibration.json``
(committed package data); physics-derived defaults apply when a family has
no calibration entry.

Role in the reference pipeline: the reference's estimate contract is
``(precision, sq_norm2) → cost`` per bootstrap
(``/root/reference/experiments/add_exec_estimates.py:9-16``); this module
is the program-level extension that makes the estimate trustworthy as a
*routing decision*, not only as a per-boot readout.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

from ..tfhe.params import TFHEParams
from .optimizer import (HBM_BYTES, MATMUL_HBM_BUDGET, Solution,
                        StagedSolution, bootstrap_cost_us)

__all__ = ["predict_native_us", "predict_staged_us", "call_fixed_us",
           "slope_us", "load_calibration", "bucket"]

# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------

_CAL_PATH = Path(__file__).with_name("calibration.json")

# Physics-derived defaults (used when calibration.json has no entry):
# dispatch latency of one jitted level step on the tunneled single-chip
# backend, and the VPU bandwidth of the rotation-strip rebuild (measured
# ~20 ms for the 2.1 GB p32 strip traffic, PERF.md lesson 11/14).
DEFAULT_DISPATCH_US = 2000.0
DEFAULT_STRIP_GBPS = 100.0


def load_calibration() -> dict:
    if _CAL_PATH.is_file():
        with open(_CAL_PATH) as f:
            return json.load(f)
    return {}


_CAL = load_calibration()


def _fam_key(params: TFHEParams) -> str:
    return f"{params.glwe_dim},{params.poly_size},{params.bsk_level}"


def bucket(nb: int) -> int:
    """Power-of-two level padding (``CircuitExecutor`` shape bucketing)."""
    b = 1
    while b < nb:
        b *= 2
    return b


def _pick_otf(params: TFHEParams) -> bool:
    k1 = params.glwe_dim + 1
    mat_bytes = (params.lwe_dim * k1 * params.bsk_level * params.poly_size
                 * 4 * k1 * params.poly_size)
    return mat_bytes > MATMUL_HBM_BUDGET


def _kernel_calls(params: TFHEParams, rows: int, otf: bool) -> int:
    """Pallas sub-calls for a kernel batch of ``rows`` ( _max_batch VMEM
    slicing, ops/fused_blind_rotate.py)."""
    try:
        from ..ops.fused_blind_rotate import _max_batch
        mb = _max_batch(params, otf)
    except Exception:
        mb = 512
    return max(1, math.ceil(rows / max(1, mb)))


def call_fixed_us(params: TFHEParams, rows: int,
                  orientation: str | None = None) -> float:
    """Fixed (batch-independent) cost of one level's bootstrap call, µs.

    ``rows`` is the kernel batch (padded bootstraps × evaluation batch):
    it sets how many VMEM-sliced Pallas sub-calls run, each paying the
    strip-rebuild / key-stream fixed work.  Dispatch is paid once per
    level step.
    """
    dispatch = float(_CAL.get("dispatch_us", DEFAULT_DISPATCH_US))
    otf = _pick_otf(params) if orientation is None \
        else orientation == "fused_otf"
    n, k, N = params.lwe_dim, params.glwe_dim, params.poly_size
    l = params.bsk_level
    if otf:
        # rotation-strip rebuild: n chunks × (k+1)·l rows × [T=128, 2N] i8
        strip_bytes = n * (k + 1) * l * 128 * 2 * N
        per_call = strip_bytes / (float(_CAL.get("strip_gbps",
                                                 DEFAULT_STRIP_GBPS)) * 1e3)
    else:
        # streamed key matrices re-read from HBM every call
        mat_bytes = n * 4.0 * (k + 1) * l * N * (k + 1) * N
        per_call = mat_bytes / HBM_BYTES * 1e6
    return dispatch + per_call * _kernel_calls(params, rows, otf)


def slope_us(params: TFHEParams, cost_us: float | None = None) -> float:
    """Per-boot marginal cost (µs): the roofline estimate scaled by the
    family's measured calibration factor when one exists."""
    if cost_us is None:
        cost_us = bootstrap_cost_us(params.lwe_dim, params.glwe_dim,
                                    params.poly_size, params.bsk_level,
                                    params.ksk_level)
    cal = _CAL.get("families", {}).get(_fam_key(params))
    if cal is not None and "slope_scale" in cal:
        return cost_us * float(cal["slope_scale"])
    return cost_us


def predict_native_us(sol: Solution, level_nbs: list[int],
                      batch: int) -> float:
    """Per-evaluation runtime (µs) of the native single-family plan."""
    s = slope_us(sol.params, sol.cost)
    total = 0.0
    for nb in level_nbs:
        nbp = bucket(nb)
        total += nbp * s + call_fixed_us(sol.params, nbp * batch) / batch
    return total


def predict_staged_us(ssol: StagedSolution,
                      level_routes: list[tuple[int, int, int]],
                      batch: int) -> float:
    """Per-evaluation runtime (µs) of the staged dual-family plan.

    ``level_routes``: per-level (n_split, n_f1, n_f2) from
    :func:`runtime.executor.staged_level_routes` — each level runs one
    fam1 call batched ``bucket(ns + nf1)`` and one fam2 call batched
    ``bucket(ns + nf2)`` (``_staged_level_step``).
    """
    s1 = slope_us(ssol.params1)
    s2 = slope_us(ssol.params2)
    total = 0.0
    for ns, nf1, nf2 in level_routes:
        if ns + nf1:
            nbp = bucket(ns + nf1)
            total += nbp * s1 + call_fixed_us(ssol.params1,
                                              nbp * batch) / batch
        if ns + nf2:
            nbp = bucket(ns + nf2)
            total += nbp * s2 + call_fixed_us(ssol.params2,
                                              nbp * batch) / batch
    return total
