"""Mapping-parity oracle against the actual reference implementation.

Bridges our :class:`BitCircuit` into the reference's ``BitExecEnv``
(``/root/reference/fbs_mapper/bit_exec_env.py``), runs the reference
``MapToFBSHeur``/``MapToFBSBasic`` (``/root/reference/fbs_mapper/
map_to_fbs.py:15-547``) side by side with our mappers, and asserts equal
``nb_bootstrap`` / ``norm2_linprod`` / ``max_lut_size`` — the three metrics
the paper's tables are built from.

Grid: 9 generated-suite benchmarks x p in {3, 4, 6, 8, 16} x
{naive, search} = 90 heuristic configs, plus 9 basic-mapper configs.
Skipped when ``/root/reference`` is not present.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.bit_circuit import BitCircuit, K_INPUT
from tfhe_fbs_map_tpu.frontend.circuits import build_bench
from tfhe_fbs_map_tpu.frontend.mapping.basic import BasicMapper
from tfhe_fbs_map_tpu.frontend.mapping.heuristic import (HeuristicMapper,
                                                         MappingError)

REF = Path("/root/reference/fbs_mapper")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference checkout not available")

BENCHES = ["full_adder", "half_adder", "aoi21", "oai21", "_2_input_gates",
           "ascon_lut", "simon_iter", "trivium_iter_v1", "aes_sbox"]
FBS_SIZES = [3, 4, 6, 8, 16]
MERGERS = ["naive", "search"]

STATS_KEYS = ("nb_bootstrap", "norm2_linprod", "max_lut_size")


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules (they use flat sibling imports)."""
    sys.path.insert(0, str(REF))
    try:
        import bit_exec_env
        import map_to_fbs
        yield bit_exec_env, map_to_fbs
    finally:
        sys.path.remove(str(REF))


def to_ref_env(circ: BitCircuit, bee):
    """Rebuild our BitCircuit as a reference BitExecEnv, gate for gate."""
    Env = bee.BitExecEnv
    env = Env()
    wires = {"0": Env.CONST0, "1": Env.CONST1}
    for node in circ.nodes:
        if node.kind == K_INPUT:
            wires[node.name] = env.input(node.name)
        else:
            fanins = [wires[f.name] for f in node.fanins]
            wires[node.name] = env.op_lut(fanins, list(node.table),
                                          name=node.name)
    for name, out in circ.outputs.items():
        env.output(name, wires[out.name])
    return env


@pytest.fixture(scope="module")
def circuits(ref):
    bee, _ = ref
    out = {}
    for name in BENCHES:
        circ = build_bench(name)
        circ.remove_dangling_nodes()
        out[name] = (circ, to_ref_env(circ, bee))
    return out


def _ref_stats(map_to_fbs, env, mapper_name: str, p: int):
    if mapper_name == "basic":
        mapper = map_to_fbs.MapToFBSBasic()
    else:
        mapper = map_to_fbs.MapToFBSHeur(
            cone_merger=mapper_name, fbs_size=p, max_fbs_size=2 * p,
            max_truth_table_size=16)
    try:
        lut_env = mapper.map(env)
    except AssertionError:
        return None  # terminal assert, map_to_fbs.py:545
    lut_env.remove_dangling_nodes()
    return lut_env.stats()


def _our_stats(circ: BitCircuit, mapper_name: str, p: int):
    if mapper_name == "basic":
        mapper = BasicMapper()
    else:
        mapper = HeuristicMapper(cone_merger=mapper_name, fbs_size=p,
                                 max_fbs_size=2 * p,
                                 max_truth_table_size=16)
    try:
        prog = mapper.map(circ)
    except MappingError:
        return None
    prog.remove_dangling_nodes()

    # differential oracle on the way: the mapped program must stay bit-exact
    rng = np.random.default_rng(42)
    vals = {inp.name: rng.integers(0, 2, 64) for inp in circ.inputs}
    src, got = circ.eval(vals), prog.eval(vals)
    for k in src:
        assert np.array_equal(src[k], got[k]), f"bit-exactness lost on {k}"
    return prog.stats()


@pytest.mark.parametrize("bench", BENCHES)
def test_heuristic_parity(ref, circuits, bench):
    _, map_to_fbs = ref
    circ, env = circuits[bench]
    checked = 0
    for merger in MERGERS:
        for p in FBS_SIZES:
            theirs = _ref_stats(map_to_fbs, env, merger, p)
            ours = _our_stats(circ, merger, p)
            cfg = f"{bench}/{merger}/p={p}"
            assert (theirs is None) == (ours is None), \
                f"{cfg}: mappability differs (ref={theirs}, ours={ours})"
            if theirs is None:
                checked += 1
                continue
            for key in STATS_KEYS:
                assert theirs[key] == ours[key], \
                    f"{cfg}: {key} ref={theirs[key]} ours={ours[key]}"
            checked += 1
    assert checked == len(MERGERS) * len(FBS_SIZES)


@pytest.mark.parametrize("variant,p", [(2, 7), (2, 12), (3, 16)])
def test_stream_parity(ref, variant, p):
    """Truncated Trivium keystream — deep cones with large supports, the
    regime where the vectorized coefficient search must still match the
    reference scan (the full 1152-round streams are the r1 sweep-timeout
    configs; 32 rounds covers the same cone shapes)."""
    from tfhe_fbs_map_tpu.frontend.circuits.generators import _stream_bench
    bee, map_to_fbs = ref
    circ = _stream_bench(variant, kreyvium=False, iters=32)
    circ.remove_dangling_nodes()
    env = to_ref_env(circ, bee)
    theirs = _ref_stats(map_to_fbs, env, "search", p)
    ours = _our_stats(circ, "search", p)
    assert theirs is not None and ours is not None
    for key in STATS_KEYS:
        assert theirs[key] == ours[key], \
            f"stream_v{variant}/p={p}: {key} ref={theirs[key]} " \
            f"ours={ours[key]}"


@pytest.mark.parametrize("bench", BENCHES)
def test_basic_parity(ref, circuits, bench):
    _, map_to_fbs = ref
    circ, env = circuits[bench]
    theirs = _ref_stats(map_to_fbs, env, "basic", 2)
    ours = _our_stats(circ, "basic", 2)
    assert theirs is not None and ours is not None
    for key in STATS_KEYS:
        assert theirs[key] == ours[key], \
            f"{bench}/basic: {key} ref={theirs[key]} ours={ours[key]}"
