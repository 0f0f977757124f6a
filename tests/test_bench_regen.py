"""Regenerated ISCAS85/89-class suites: files exist, parse, match golden."""

import os

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.circuits.bench_regen import (REGEN85, REGEN89,
                                                            verify_circuit)
from tfhe_fbs_map_tpu.frontend.parsers import parse_bench

BASE = os.path.join(os.path.dirname(__file__), "..", "benchmarks")


def test_all_suite_files_vendored():
    for name in REGEN85:
        assert os.path.exists(os.path.join(BASE, "iscas85", f"{name}.bench"))
    for name in REGEN89:
        assert os.path.exists(os.path.join(BASE, "iscas89", f"{name}.bench"))
    assert len(REGEN85) >= 9 and len(REGEN89) >= 10


@pytest.mark.parametrize("name", ["c432r", "c880r", "c6288r", "c499r"])
def test_regen85_golden(name):
    gen, golden, _ = REGEN85[name]
    verify_circuit(name, gen().serialize(), golden, sequential=False,
                   n_vec=64)


@pytest.mark.parametrize("name", ["s344r", "s1423r", "s298r"])
def test_regen89_golden(name):
    gen, golden, _ = REGEN89[name]
    verify_circuit(name, gen().serialize(), golden, sequential=True,
                   n_vec=32, frames=4)


def test_c6288r_is_a_multiplier():
    text = open(os.path.join(BASE, "iscas85", "c6288r.bench")).read()
    circ = parse_bench(text)
    rng = np.random.default_rng(0)
    vals = {n.name: rng.integers(0, 2, 16) for n in circ.inputs}
    out = circ.eval(vals)
    x = sum(np.asarray(vals[f"X{i}"], dtype=object) << i for i in range(16))
    y = sum(np.asarray(vals[f"Y{i}"], dtype=object) << i for i in range(16))
    p = sum((np.asarray(out[f"P{i}"], dtype=object) & 1) << i
            for i in range(32))
    assert np.all(p == x * y)


def test_vendored_files_match_golden():
    """The checked-in .bench text itself (not just the generator) verifies."""
    for name in ("c1908r", "c7552r"):
        gen, golden, _ = REGEN85[name]
        text = open(os.path.join(BASE, "iscas85", f"{name}.bench")).read()
        verify_circuit(name, text, golden, sequential=False, n_vec=64)
    for name in ("s5378r", "s9234r"):
        gen, golden, _ = REGEN89[name]
        text = open(os.path.join(BASE, "iscas89", f"{name}.bench")).read()
        verify_circuit(name, text, golden, sequential=True, n_vec=32)


def test_full_iscas89_envelope():
    """Every circuit the reference sweeps (gen_makefile_iscas89.bash:14-43)
    has a regenerated counterpart (r5: full 30-circuit envelope)."""
    from tfhe_fbs_map_tpu.frontend.circuits.bench_regen import REGEN89
    ref = ["s1196", "s1238", "s13207", "s1423", "s1488", "s1494", "s15850",
           "s208", "s27", "s298", "s344", "s349", "s35932", "s382",
           "s38417", "s38584", "s386", "s400", "s420", "s444", "s510",
           "s526", "s5378", "s641", "s713", "s820", "s832", "s838",
           "s9234", "s953"]
    have = set(REGEN89) | {"s27"}   # s27 ships via circuits/generators
    missing = [c for c in ref if f"{c}r" not in have and c not in have]
    assert not missing, missing


def test_pla_fsm_golden_multiframe():
    """The PLA-FSM regen vehicle matches its golden model over unrolled
    frames (state feedback across clocks)."""
    import numpy as np
    from tfhe_fbs_map_tpu.frontend.circuits.bench_regen import (
        gen_pla_fsm, verify_circuit)
    gen, golden = gen_pla_fsm(9, 5, 4, 20, 3, 3, seed=99)
    b = gen()
    verify_circuit("pla_fsm", b.serialize("test"), golden, sequential=True,
                   n_vec=64, frames=4)
