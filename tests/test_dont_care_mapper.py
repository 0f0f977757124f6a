"""Sparse-mvt don't-care mode ("search+dc"): the reference's open TODO
(map_to_fbs.py:8-11).  Holes in the multi-value table are free per
position in the negacyclic overlap check, admitting strictly more merges;
plain "search" stays reference-parity (tests/test_reference_parity.py)."""

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.circuits import build_bench
from tfhe_fbs_map_tpu.frontend.mapping.cones import ConeSpace
from tfhe_fbs_map_tpu.frontend.mapping.heuristic import HeuristicMapper
from tfhe_fbs_map_tpu.frontend.parsers import parse_bench


def test_dc_space_accepts_more():
    """Sparse tv [1,-,0 | 0,-,1] at p=3: the complement overlap needs the
    two holes filled with DIFFERENT values ((1,0),(hole,hole),(0,1)), so
    neither global fill passes the strict check but per-hole freedom
    does."""
    strict = ConeSpace(3, 6)
    dc = ConeSpace(3, 6, dont_care=True)
    tt = np.array([1, 0, 0, 1])
    mvt = np.array([0, 2, 3, 5])
    assert not strict.lut_ok(tt, mvt)
    assert dc.lut_ok(tt, mvt)
    tv = dc.fbs_test_vector(tt, mvt)
    assert len(tv) == 6
    p = 3
    c = tv[0] + tv[p]
    assert all(tv[x] + tv[x + p] == c for x in range(len(tv) - p))
    # realized entries keep the defined values
    assert tv[0] == 1 and tv[2] == 0 and tv[3] == 0 and tv[5] == 1


@pytest.mark.parametrize("name,p", [("aes_sbox", 8), ("ascon_lut", 10)])
def test_dc_mapping_is_correct(name, p):
    circ = build_bench(name)
    prog = HeuristicMapper(cone_merger="search+dc", fbs_size=p).map(circ)
    prog.remove_dangling_nodes()
    rng = np.random.default_rng(3)
    vals = {i.name: rng.integers(0, 2, 64) for i in circ.inputs}
    want, got = circ.eval(vals), prog.eval(vals)
    for k in want:
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(got[k]), err_msg=k)


def test_dc_wins_on_c880r():
    """Regression for the measured don't-care win (>=5% on >=3 regen
    benchmarks; see PERF.md round 4): c880r at p=12: 61 -> 53."""
    circ = parse_bench(open("benchmarks/iscas85/c880r.bench").read())
    boots = {}
    for m in ("search", "search+dc"):
        prog = HeuristicMapper(cone_merger=m, fbs_size=12).map(circ)
        prog.remove_dangling_nodes()
        boots[m] = prog.stats()["nb_bootstrap"]
        rng = np.random.default_rng(4)
        vals = {i.name: rng.integers(0, 2, 32) for i in circ.inputs}
        want, got = circ.eval(vals), prog.eval(vals)
        for k in want:
            np.testing.assert_array_equal(np.asarray(want[k]),
                                          np.asarray(got[k]))
    assert boots["search+dc"] <= 0.95 * boots["search"]
