"""Staged dual-family executor: homomorphic runs bit-exact vs the oracle.

Covers the three node routings of the staged compile (f2 single, f1
single, two-stage split), scaled wire encodings, fanout at mixed
multipliers, negacyclic mode-C tables, the mesh-sharded step, and the
native-fallback error for unsplittable programs."""

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.lut_program import LutProgram
from tfhe_fbs_map_tpu.runtime.executor import CircuitExecutor
from tfhe_fbs_map_tpu.tfhe.params import TFHEParams
from tfhe_fbs_map_tpu.tfhe.staged import StagedKeys, generate_staged_keys

P32_F1 = TFHEParams(p=16, lwe_dim=16, glwe_dim=1, poly_size=256,
                    bsk_level=3, bsk_base_log=7, ksk_level=4, ksk_base_log=4,
                    lwe_noise_std=2.0, glwe_noise_std=2.0)
P32_F2 = TFHEParams(p=8, lwe_dim=16, glwe_dim=2, poly_size=128,
                    bsk_level=3, bsk_base_log=7, ksk_level=4, ksk_base_log=4,
                    lwe_noise_std=2.0, glwe_noise_std=2.0)


@pytest.fixture(scope="module")
def skeys32() -> StagedKeys:
    return generate_staged_keys(32, P32_F1, P32_F2, seed=9)


def build_mixed_program(rng) -> LutProgram:
    """All three routings + fanout with heterogeneous multipliers."""
    prog = LutProgram()
    w = [prog.input(f"w{i}") for i in range(5)]
    def tbl(n):
        t = rng.integers(0, 2, n)
        t[rng.integers(0, n)] = 0          # tables must contain a 0
        return t.tolist()

    # split node: 32-entry address LUT
    addr = prog.linear([1, 2, 4, 8, 16], w, 0)
    a = prog.bootstrap(addr, tbl(addr.max_val + 1))
    # f2 single: small LUT over (a, w0) — fanout of w0 at a new multiplier
    lin_b = prog.linear([1, 2], [a, w[0]], 0)
    b = prog.bootstrap(lin_b, tbl(lin_b.max_val + 1))
    # f1 single: LUT over a value bound of 12 (routes to the p/2 family)
    lin_c = prog.linear([1, 2, 4, 5], [b, w[1], w[2], a], 0)
    c = prog.bootstrap(lin_c, tbl(lin_c.max_val + 1))
    # negacyclic split node: tau = 64, C = 1
    half = rng.integers(0, 2, 32)
    t_nega = half.tolist() + (1 - half).tolist()
    d = prog.bootstrap(
        prog.linear([1, 2, 4, 8, 16, 32], w + [c], 0), t_nega)
    prog.output("o_split", a)
    prog.output("o_small", b)
    prog.output("o_mid", c)
    prog.output("o_nega", d)
    prog.output("o_lin", prog.linear([1, 2], [a, d], 0))
    return prog


def test_staged_executor_mixed(skeys32):
    rng = np.random.default_rng(2)
    prog = build_mixed_program(rng)
    ex = CircuitExecutor(prog, skeys32)
    assert ex.staged and ex.num_bootstraps == 4
    values = {f"w{i}": rng.integers(0, 2, 16) for i in range(5)}
    oracle = prog.eval(values)
    got = ex.run_cleartext(values, seed=5)
    for k, want in oracle.items():
        np.testing.assert_array_equal(
            got[k] % 64, np.asarray(want) % 64, err_msg=k)


def test_staged_executor_mesh(skeys32):
    import jax

    from tfhe_fbs_map_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(3)
    prog = build_mixed_program(rng)
    mesh = make_mesh(jax.devices()[:4], dp=4, tp=1)
    ex = CircuitExecutor(prog, skeys32, mesh=mesh)
    values = {f"w{i}": rng.integers(0, 2, 8) for i in range(5)}
    oracle = prog.eval(values)
    got = ex.run_cleartext(values, seed=6)
    for k, want in oracle.items():
        np.testing.assert_array_equal(
            got[k] % 64, np.asarray(want) % 64, err_msg=k)


def test_staged_executor_mapped_circuit():
    """A real mapped circuit (aes_sbox at fbs_size 16) through the staged
    executor at p=16 — every node routes as an f1/f2 single."""
    from tfhe_fbs_map_tpu.frontend.circuits import build_bench
    from tfhe_fbs_map_tpu.frontend.mapping.heuristic import HeuristicMapper
    circ = build_bench("aes_sbox")
    prog = HeuristicMapper(cone_merger="search", fbs_size=16).map(circ)
    prog.remove_dangling_nodes()
    # fam1 on the p grid: every p=16 mapper table runs as a single boot,
    # fam2 takes the small ones at select-family cost
    skeys = generate_staged_keys(16, P32_F1, P32_F2, seed=11)
    ex = CircuitExecutor(prog, skeys)
    rng = np.random.default_rng(7)
    values = {n.name: rng.integers(0, 2, 8)
              for n in prog.nodes if n.kind == "input"}
    oracle = prog.eval(values)
    got = ex.run_cleartext(values, seed=8)
    for k, want in oracle.items():
        np.testing.assert_array_equal(
            got[k] % 32, np.asarray(want) % 32, err_msg=k)


def test_staged_executor_rejects_unsplittable(skeys32):
    prog = LutProgram()
    w = [prog.input(f"w{i}") for i in range(20)]
    t = list(np.random.default_rng(0).integers(0, 2, 21))
    t[0] = 0
    # 20 weight-1 inputs: no m=16 split, tau=21 > 16 so no single either
    prog.output("o", prog.bootstrap(prog.linear([1] * 20, w, 0), t))
    with pytest.raises(ValueError, match="staged pipeline cannot realize"):
        CircuitExecutor(prog, skeys32)


def test_staged_executor_p10_select_grid():
    """p=10: the select family sits on the p/2=5 grid (8 does not divide
    10, so the q/16 grid is incommensurable with the q/20 wire grid) —
    a Kreyvium-class program routes small tables to it correctly."""
    from tfhe_fbs_map_tpu.frontend.circuits import build_bench
    from tfhe_fbs_map_tpu.frontend.mapping.heuristic import HeuristicMapper
    circ = build_bench("kreyvium_iter_v1")
    prog = HeuristicMapper(cone_merger="search", fbs_size=10).map(circ)
    prog.remove_dangling_nodes()
    f1 = TFHEParams(p=10, lwe_dim=16, glwe_dim=1, poly_size=256,
                    bsk_level=3, bsk_base_log=7, ksk_level=4, ksk_base_log=4,
                    lwe_noise_std=2.0, glwe_noise_std=2.0)
    f2 = TFHEParams(p=5, lwe_dim=16, glwe_dim=2, poly_size=128,
                    bsk_level=3, bsk_base_log=7, ksk_level=4, ksk_base_log=4,
                    lwe_noise_std=2.0, glwe_noise_std=2.0)
    skeys = generate_staged_keys(10, f1, f2, seed=13)
    ex = CircuitExecutor(prog, skeys)
    assert ex.route_counts["f2"] >= 1       # small tables hit the 5-grid
    rng = np.random.default_rng(14)
    values = {n.name: rng.integers(0, 2, 8)
              for n in prog.nodes if n.kind == "input"}
    oracle = prog.eval(values)
    got = ex.run_cleartext(values, seed=15)
    for k, want in oracle.items():
        np.testing.assert_array_equal(
            got[k] % 20, np.asarray(want) % 20, err_msg=k)
