"""AIG logic optimization (frontend/opt.py) — semantics + quality.

The pass plays the role of the reference's abc preprocessing
(``gen_makefile_iscas85.bash:41``: strash + genlib map/unmap); these tests
pin (a) bit-exact semantics preservation on every bundled circuit and on
random LUT soups, (b) the structural guarantees: XOR recollapse, strash
sharing, constant propagation, and never-worse gate counts.
"""

import glob
import itertools

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.bit_circuit import BitCircuit
from tfhe_fbs_map_tpu.frontend.opt import optimize
from tfhe_fbs_map_tpu.frontend.parsers import (parse_bench, parse_blif,
                                               parse_bristol)


def _gate_count(circ):
    s = circ.stats()
    return s["nb_and"] + s["nb_xor"] + s["nb_lut"]


def _assert_equiv(circ, opt, n_vec=200, seed=0):
    rng = np.random.default_rng(seed)
    vals = {i.name: rng.integers(0, 2, n_vec) for i in circ.inputs}
    want, got = circ.eval(vals), opt.eval(vals)
    assert want.keys() == got.keys()
    ones = np.ones(n_vec, dtype=np.int64)
    for k in want:
        assert np.array_equal(np.asarray(want[k]) * ones,
                              np.asarray(got[k]) * ones), k


def test_all_two_input_tables_exact():
    av, bv = np.array([0, 0, 1, 1]), np.array([0, 1, 0, 1])
    for bits in itertools.product((0, 1), repeat=4):
        if min(bits) == max(bits):
            continue
        c = BitCircuit()
        a, b = c.add_input("a"), c.add_input("b")
        c.set_output("y", c.lut([a, b], bits))
        o = optimize(c)
        want = c.eval({"a": av, "b": bv})["y"]
        got = o.eval({"a": av, "b": bv})["y"]
        assert np.array_equal(want * np.ones(4, int),
                              got * np.ones(4, int)), bits


def test_random_three_input_luts_exact():
    rng = np.random.default_rng(7)
    vals = {f"x{i}": np.array([(j >> (2 - i)) & 1 for j in range(8)])
            for i in range(3)}
    for _ in range(25):
        t = tuple(int(v) for v in rng.integers(0, 2, 8))
        if min(t) == max(t):
            continue
        c = BitCircuit()
        ins = [c.add_input(f"x{i}") for i in range(3)]
        c.set_output("y", c.lut(ins, t))
        _assert_equiv(c, optimize(c), n_vec=8, seed=1)
        # 3-input Shannon path: eval on the exhaustive vectors too
        w = c.eval(vals)["y"]
        g = optimize(c).eval(vals)["y"]
        assert np.array_equal(w * np.ones(8, int), g * np.ones(8, int)), t


def test_nand_soup_xor_recollapses_to_one_gate():
    c = BitCircuit()
    a, b = c.add_input("a"), c.add_input("b")
    n1 = c.not_(c.and_(a, b))
    n2 = c.not_(c.and_(c.not_(a), c.not_(b)))
    c.set_output("y", c.and_(n1, n2))          # structurally = XOR(a, b)
    o = optimize(c)
    s = o.stats()
    assert s["nb_xor"] == 1 and _gate_count(o) == 1
    _assert_equiv(c, o, n_vec=4)


def test_strash_shares_identical_subexpressions():
    c = BitCircuit()
    a, b, d = c.add_input("a"), c.add_input("b"), c.add_input("d")
    # the same AND built twice feeds two gates — strash must share it
    c.set_output("y1", c.or_(c.and_(a, b), d))
    c.set_output("y2", c.xor_(c.and_(a, b), d))
    o = optimize(c)
    assert _gate_count(o) <= 3
    _assert_equiv(c, o)


def test_constant_propagation():
    from tfhe_fbs_map_tpu.frontend.bit_circuit import CONST1
    c = BitCircuit()
    a = c.add_input("a")
    x = c.lut([a, a], (0, 1, 1, 0), name="never")  # a XOR a = 0... via lut
    c.set_output("y", c.lut([x, a], (0, 1, 1, 1)))  # 0 OR a = a
    o = optimize(c)
    assert _gate_count(o) == 0                      # collapses to a wire
    _assert_equiv(c, o)
    c2 = BitCircuit()
    a2 = c2.add_input("a")
    c2.set_output("z", CONST1)
    c2.set_output("w", a2)
    o2 = optimize(c2)
    _assert_equiv(c2, o2)


@pytest.mark.parametrize("path", sorted(
    glob.glob("benchmarks/generated/*_iter_*.blif")
    + glob.glob("benchmarks/generated/a*.blif")
    + glob.glob("benchmarks/generated/half*.blif")
    + glob.glob("benchmarks/iscas85/*.bench")
    + glob.glob("benchmarks/bristol/*.txt")))
def test_bundled_circuits_equiv_and_not_worse(path):
    if path.endswith(".bench"):
        circ = parse_bench(path)
    elif path.endswith(".txt"):
        circ = parse_bristol(path)
    else:
        circ = parse_blif(path)
    opt = optimize(circ)
    _assert_equiv(circ, opt, seed=42)
    assert _gate_count(opt) <= _gate_count(circ)
    assert [i.name for i in opt.inputs] == [i.name for i in circ.inputs]
    assert list(opt.outputs) == list(circ.outputs)


def test_sequential_unroll_equiv():
    circ = parse_bench("benchmarks/iscas89/s27.bench", unroll_frames=4)
    opt = optimize(circ)
    _assert_equiv(circ, opt, seed=3)
    assert _gate_count(opt) <= _gate_count(circ)


def test_mapping_quality_not_worse_on_optimized_xag():
    """End-to-end: the optimized circuit maps to <= bootstraps."""
    from tfhe_fbs_map_tpu.frontend import HeuristicMapper
    circ = parse_blif("benchmarks/generated/trivium_iter_v2.blif")
    opt = optimize(circ)
    m = HeuristicMapper(cone_merger="search", fbs_size=8)
    nb0 = m.map(circ).stats()["nb_bootstrap"]
    nb1 = HeuristicMapper(cone_merger="search", fbs_size=8) \
        .map(opt).stats()["nb_bootstrap"]
    assert nb1 <= nb0


def test_cli_opt_flag(tmp_path):
    from tfhe_fbs_map_tpu.frontend.cli import main
    out = tmp_path / "c17.lbf"
    rc = main(["benchmarks/iscas85/c17.bench", "--type", "bench",
               "--fbs_size", "4", "--opt", "--output_lbf", str(out)])
    assert rc == 0 and out.exists()


def test_random_dags_equiv():
    """Property sweep: 40 random 2-input-LUT DAGs (with consts, NOTs,
    shared fanout, random output phases) optimize to equivalent circuits
    with never-worse gate counts."""
    from tfhe_fbs_map_tpu.frontend.bit_circuit import CONST0, CONST1

    rng = np.random.default_rng(1234)
    for case in range(40):
        c = BitCircuit()
        pool = [c.add_input(f"i{k}") for k in range(int(rng.integers(2, 6)))]
        pool += [CONST0, CONST1]
        n_gates = int(rng.integers(1, 40))
        for g in range(n_gates):
            k = int(rng.integers(1, 3))
            fanins = [pool[int(rng.integers(0, len(pool)))]
                      for _ in range(k)]
            while k == 2 and fanins[0] is fanins[1]:
                fanins[1] = pool[int(rng.integers(0, len(pool)))]
            t = rng.integers(0, 2, 1 << k)
            if t.min() == t.max():
                t[0] = 1 - t[0]
            node = c.lut(fanins, tuple(int(v) for v in t))
            pool.append(node)
        n_out = int(rng.integers(1, 4))
        for o in range(n_out):
            c.set_output(f"o{o}", pool[int(rng.integers(0, len(pool)))])
        opt = optimize(c)
        _assert_equiv(c, opt, n_vec=64, seed=case)
        c.remove_dangling_nodes()
        assert _gate_count(opt) <= _gate_count(c), case


def test_pruned_unused_input_survives():
    """remove_dangling_nodes() keeps unused inputs in `circuit.inputs` (the
    interface) while pruning them from `circuit.nodes`; optimize() must
    still emit them (r2 advisor finding: KeyError in the emission loop)."""
    c = BitCircuit()
    a = c.add_input("a")
    c.add_input("unused")
    c.set_output("o", c.not_(a))
    c.remove_dangling_nodes()
    assert len(c.inputs) == 2
    opt = optimize(c)
    assert [i.name for i in opt.inputs] == ["a", "unused"]
    _assert_equiv(c, opt, n_vec=16, seed=3)
