"""Differential tests: mapped FBS programs must be bit-exact vs the source
circuit on random vectors — the reference's load-bearing correctness mechanism
(map_circuit.py:137-180)."""

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend import (BasicMapper, BitCircuit,
                                       HeuristicMapper, CONST0)


def demo_circuit():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    d = c.and_(a, b)
    e = c.xor_(c.add_input("c"), d)
    f = c.lut([e, d], [0, 1, 0, 0])
    c.set_output("d", d)
    c.set_output("e", e)
    c.set_output("f", f)
    return c


def random_circuit(seed: int, n_inputs: int = 6, n_gates: int = 40):
    rng = np.random.default_rng(seed)
    c = BitCircuit()
    wires = [c.add_input(f"i{k}") for k in range(n_inputs)]
    tables_2in = [(0, 0, 0, 1), (0, 1, 1, 0), (0, 1, 1, 1), (1, 0, 0, 1),
                  (1, 1, 1, 0), (1, 0, 0, 0), (0, 1, 0, 0), (0, 0, 1, 0)]
    for k in range(n_gates):
        kind = rng.integers(0, 10)
        if kind == 0 and len(wires) > 1:
            w = c.not_(wires[rng.integers(0, len(wires))])
        else:
            i1, i2 = rng.choice(len(wires), size=2, replace=False)
            table = tables_2in[rng.integers(0, len(tables_2in))]
            w = c.lut([wires[i1], wires[i2]], table)
        wires.append(w)
    for k in range(8):
        c.set_output(f"o{k}", wires[-(k + 1)])
    return c


def check_bit_exact(circuit, mapper, n_vectors=200, seed=42):
    rng = np.random.default_rng(seed)
    vals = {i.name: rng.integers(0, 2, n_vectors) for i in circuit.inputs}
    want = circuit.eval(vals)
    prog = mapper.map(circuit)
    prog.remove_dangling_nodes()
    got = prog.eval(vals)
    assert want.keys() == got.keys()
    for k in want:
        # broadcasting comparison: constant outputs evaluate to scalars
        assert np.all(want[k] == got[k]), f"output {k} mismatch"
    return prog


def test_basic_mapper_demo():
    prog = check_bit_exact(demo_circuit(), BasicMapper())
    assert prog.stats()["nb_bootstrap"] == 3


@pytest.mark.parametrize("merger,p", [("naive", 3), ("naive", 4),
                                      ("naive", 8), ("naive", 16),
                                      ("search", 2), ("search", 3),
                                      ("search", 4), ("search", 8),
                                      ("search", 16)])
def test_heuristic_demo(merger, p):
    mapper = HeuristicMapper(cone_merger=merger, fbs_size=p,
                             max_fbs_size=2 * p)
    check_bit_exact(demo_circuit(), mapper)


def test_naive_p2_unmappable():
    from tfhe_fbs_map_tpu.frontend.mapping.heuristic import MappingError
    c = BitCircuit()
    a, b = c.add_input("a"), c.add_input("b")
    c.set_output("g", c.and_(a, b))
    mapper = HeuristicMapper(cone_merger="naive", fbs_size=2, max_fbs_size=4)
    with pytest.raises(MappingError):
        mapper.map(c)


@pytest.mark.parametrize("merger", ["naive", "search"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("p", [4, 7, 12])
def test_heuristic_random_circuits(merger, seed, p):
    mapper = HeuristicMapper(cone_merger=merger, fbs_size=p,
                             max_fbs_size=2 * p)
    check_bit_exact(random_circuit(seed), mapper)


@pytest.mark.parametrize("p", [3, 8])
def test_strict_fbs_size(p):
    mapper = HeuristicMapper(cone_merger="search", fbs_size=p,
                             max_fbs_size=p)
    prog = check_bit_exact(random_circuit(7), mapper)
    assert prog.stats()["max_lut_size"] <= p


def test_max_fbs_uses_negacyclic_extension():
    mapper = HeuristicMapper(cone_merger="search", fbs_size=4,
                             max_fbs_size=8)
    prog = check_bit_exact(random_circuit(9), mapper)
    assert prog.stats()["max_lut_size"] <= 8


def test_support_cap_forces_bootstrap():
    mapper = HeuristicMapper(cone_merger="search", fbs_size=16,
                             max_fbs_size=32, max_truth_table_size=3)
    check_bit_exact(random_circuit(11, n_inputs=8, n_gates=30), mapper)


def test_search_beats_basic_on_xor_chain():
    # p-ary xor chains are the heuristic's best case: ceil(log) fewer boots.
    c = BitCircuit()
    ws = [c.add_input(f"i{k}") for k in range(8)]
    acc = ws[0]
    for w in ws[1:]:
        acc = c.xor_(acc, w)
    c.set_output("x", acc)
    basic = BasicMapper().map(c)
    heur = HeuristicMapper(cone_merger="search", fbs_size=9,
                           max_fbs_size=18).map(c)
    heur.remove_dangling_nodes()
    assert heur.stats()["nb_bootstrap"] < basic.stats()["nb_bootstrap"]
    assert heur.stats()["nb_bootstrap"] == 1


def test_const_input_gates():
    c = BitCircuit()
    a = c.add_input("a")
    g = c.lut([a, CONST0], [0, 1, 1, 0])  # a XOR 0 via explicit lut
    c.set_output("g", g)
    for mapper in (BasicMapper(),
                   HeuristicMapper(cone_merger="search", fbs_size=4)):
        check_bit_exact(c, mapper)


def test_output_is_input():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    c.set_output("a_out", a)
    c.set_output("g", c.and_(a, b))
    mapper = HeuristicMapper(cone_merger="search", fbs_size=4)
    check_bit_exact(c, mapper)


def test_negated_output():
    c = BitCircuit()
    a = c.add_input("a")
    c.set_output("na", c.not_(a))
    for mapper in (BasicMapper(),
                   HeuristicMapper(cone_merger="search", fbs_size=4)):
        check_bit_exact(c, mapper)


def test_numeric_wire_names_do_not_collide_with_consts():
    """ISCAS .bench wires are named "0"/"1"/"2"… — resolution must be by
    node identity, not name, or an input named "1" is misread as CONST1
    (this broke the basic mapper on c17: outputs silently wrong)."""
    import numpy as np

    from tfhe_fbs_map_tpu.frontend.bit_circuit import BitCircuit, CONST1
    from tfhe_fbs_map_tpu.frontend.mapping.basic import BasicMapper
    from tfhe_fbs_map_tpu.frontend.mapping.heuristic import HeuristicMapper
    from tfhe_fbs_map_tpu.frontend.opt import optimize

    c = BitCircuit()
    one = c.add_input("1")          # input whose NAME is "1"
    two = c.add_input("2")
    g = c.lut([one, two], (1, 0, 0, 0), name="g")   # NOR
    h = c.lut([g, CONST1], (0, 1, 1, 0), name="h")  # g XOR const1 = NOT g
    c.set_output("o", h)

    vals = {"1": np.array([0, 0, 1, 1]), "2": np.array([0, 1, 0, 1])}
    want = c.eval(vals)["o"]
    assert np.array_equal(want, np.array([0, 1, 1, 1]))  # OR

    for prog in (BasicMapper().map(c),
                 HeuristicMapper(cone_merger="search", fbs_size=4).map(c),
                 None):
        if prog is None:
            got = optimize(c).eval(vals)["o"]
        else:
            got = prog.eval(vals)["o"]
        assert np.array_equal(np.asarray(got) * np.ones(4, np.int64),
                              want), type(prog)


def test_search_plus_and_best_modes():
    """search+ = trial-repair variant (bit-exact); best = race of search
    and search+, never worse than either on (nb_bootstrap, norm2)."""
    import glob

    import numpy as np

    from tfhe_fbs_map_tpu.frontend.mapping.heuristic import (HeuristicMapper,
                                                             map_best)
    from tfhe_fbs_map_tpu.frontend.parsers import parse_blif

    rng = np.random.default_rng(9)
    for path in sorted(glob.glob("benchmarks/generated/*_iter_v1.blif")) + \
            ["benchmarks/generated/aes_sbox.blif"]:
        circ = parse_blif(path)
        vals = {i.name: rng.integers(0, 2, 100) for i in circ.inputs}
        want = circ.eval(vals)
        for p in (4, 8):
            ref = HeuristicMapper(cone_merger="search", fbs_size=p).map(circ)
            plus = HeuristicMapper(cone_merger="search+",
                                   fbs_size=p).map(circ)
            best = map_best(circ, fbs_size=p)
            for prog in (plus, best):
                got = prog.eval(vals)
                for k in want:
                    assert np.array_equal(
                        np.asarray(want[k]) * np.ones(100, np.int64),
                        np.asarray(got[k]) * np.ones(100, np.int64)), (path, p, k)
            ref.remove_dangling_nodes()
            plus.remove_dangling_nodes()
            kb = best.stats()["nb_bootstrap"]
            assert kb <= ref.stats()["nb_bootstrap"], (path, p)
            assert kb <= plus.stats()["nb_bootstrap"], (path, p)
