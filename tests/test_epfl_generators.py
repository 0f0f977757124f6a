"""EPFL-style regenerated arithmetic benchmarks (functional equivalents of
the suite the reference fetches over the network, gen_makefile_epfl.bash:7)."""

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.circuits import EPFL_GENERATORS

V = 32
W = 128


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _word(vals, prefix, width):
    return sum(np.asarray(vals[f"{prefix}{i}"], dtype=object) << i
               for i in range(width))


def test_multiplier_square(rng):
    for name in ("multiplier", "square"):
        c = EPFL_GENERATORS[name]()
        vals = {i.name: rng.integers(0, 2, 8) for i in c.inputs}
        out = c.eval(vals)
        a = _word(vals, "a", 64)
        b = _word({f"b{i}": vals[f"b{i}"] for i in range(64)}, "b", 64) \
            if name == "multiplier" else a
        got = sum(np.asarray(out[f"p{i}"], dtype=object) << i
                  for i in range(128))
        assert np.all(got == a * b), name


def test_epfl_signature_scale():
    sigs = {"adder": (256, 129), "bar": (135, 128), "max": (512, 130),
            "multiplier": (128, 128), "square": (64, 128)}
    for name, (n_in, n_out) in sigs.items():
        c = EPFL_GENERATORS[name]()
        c.remove_dangling_nodes()
        s = c.stats()
        assert (s["nb_inp"], s["nb_out"]) == (n_in, n_out), name


def test_adder(rng):
    c = EPFL_GENERATORS["adder"]()
    vals = {i.name: rng.integers(0, 2, V) for i in c.inputs}
    out = c.eval(vals)
    a, b = _word(vals, "a", W), _word(vals, "b", W)
    got = sum(np.asarray(out[f"s{i}"], dtype=object) << i
              for i in range(W + 1))
    assert np.all(got == a + b)


def test_bar(rng):
    c = EPFL_GENERATORS["bar"]()
    vals = {i.name: rng.integers(0, 2, V) for i in c.inputs}
    out = c.eval(vals)
    d = np.array([[int(vals[f"d{i}"][v]) for i in range(W)]
                  for v in range(V)])
    sh = [sum(int(vals[f"s{j}"][v]) << j for j in range(7))
          for v in range(V)]
    got = np.array([[int(out[f"o{i}"][v]) for i in range(W)]
                    for v in range(V)])
    want = np.array([np.roll(d[v], sh[v]) for v in range(V)])
    assert np.array_equal(got, want)


def test_max_with_ties(rng):
    c = EPFL_GENERATORS["max"]()
    vals = {i.name: rng.integers(0, 2, V) for i in c.inputs}
    for i in range(W):  # ties must still pick a row holding the max
        vals[f"x3_{i}"] = vals[f"x1_{i}"].copy()
    out = c.eval(vals)
    xs = [_word(vals, f"x{k}_", W) for k in range(4)]
    got = _word(out, "m", W)
    want = np.maximum.reduce(xs)
    assert np.all(got == want)
    for v in range(V):
        idx = int(out["idx1"][v]) * 2 + int(out["idx0"][v])
        assert xs[idx][v] == want[v]


def test_sweep_ensure_epfl(tmp_path):
    from experiments.sweep import ensure_epfl
    ensure_epfl(tmp_path)
    from tfhe_fbs_map_tpu.frontend.circuits import EPFL_GENERATORS
    blifs = sorted(p.name for p in tmp_path.glob("*.blif"))
    assert blifs == sorted(f"{n}.blif" for n in EPFL_GENERATORS)
    # regeneration is idempotent and respects fetched files
    marker = tmp_path / "adder.blif"
    before = marker.read_text()
    ensure_epfl(tmp_path)
    assert marker.read_text() == before


def test_mappable_at_small_p():
    """The regenerated adder maps end-to-end bit-exactly."""
    from tfhe_fbs_map_tpu.frontend import HeuristicMapper
    c = EPFL_GENERATORS["adder"](width=8)
    c.remove_dangling_nodes()
    prog = HeuristicMapper(cone_merger="search", fbs_size=8).map(c)
    rng = np.random.default_rng(5)
    vals = {i.name: rng.integers(0, 2, 64) for i in c.inputs}
    w, g = c.eval(vals), prog.eval(vals)
    for k in w:
        assert np.array_equal(np.asarray(w[k]) * np.ones(64, np.int64),
                              np.asarray(g[k]) * np.ones(64, np.int64)), k


# ---------------------------------------------------------------------------
# random_control class + div/sqrt (epfl_control.py regenerations)
# ---------------------------------------------------------------------------

def test_epfl_control_golden(rng):
    """Every regenerated random_control/div/sqrt member matches its numpy
    golden model on random vectors (the bench_regen verification
    discipline)."""
    from tfhe_fbs_map_tpu.frontend.circuits.epfl_control import (
        EPFL_CONTROL_GENERATORS, EPFL_CONTROL_GOLDEN)
    for name, gen in EPFL_CONTROL_GENERATORS.items():
        c = gen()
        c.remove_dangling_nodes()
        vals = {i.name: rng.integers(0, 2, 48) for i in c.inputs}
        got = c.eval(vals)
        want = EPFL_CONTROL_GOLDEN[name](vals)
        for k, w in want.items():
            g = np.asarray(got[k]).astype(np.int64) & 1
            assert np.all(g == (np.asarray(w, dtype=np.int64) & 1)), \
                (name, k)


def test_epfl_control_signatures():
    """I/O signatures match the original EPFL members (no dangling PIs)."""
    from tfhe_fbs_map_tpu.frontend.circuits.epfl_control import \
        EPFL_CONTROL_GENERATORS
    sigs = {"arbiter": (256, 129), "cavlc": (10, 11), "ctrl": (7, 26),
            "dec": (8, 256), "i2c": (147, 142), "int2float": (11, 7),
            "priority": (128, 8), "router": (60, 30), "voter": (1001, 1),
            "div": (128, 128), "sqrt": (128, 64)}
    for name, (n_in, n_out) in sigs.items():
        c = EPFL_CONTROL_GENERATORS[name]()
        c.remove_dangling_nodes()
        s = c.stats()
        assert (s["nb_inp"], s["nb_out"]) == (n_in, n_out), (name, s)


def test_epfl_div_edge_cases():
    from tfhe_fbs_map_tpu.frontend.circuits.epfl_control import (
        epfl_div, golden_div)
    c = epfl_div()
    c.remove_dangling_nodes()
    # targeted vectors: div by zero, a < d, a == d, max values
    cases = [(0, 0), (5, 0), (3, 7), (7, 7), (2**64 - 1, 1),
             (2**64 - 1, 2**64 - 1), (123456789, 1000)]
    vals = {f"a{i}": np.array([(a >> i) & 1 for a, _ in cases])
            for i in range(64)}
    vals.update({f"d{i}": np.array([(d >> i) & 1 for _, d in cases])
                 for i in range(64)})
    got = c.eval(vals)
    want = golden_div(vals)
    for k, w in want.items():
        assert np.all((np.asarray(got[k]).astype(np.int64) & 1) == w), k


def test_epfl_sqrt_edge_cases():
    from tfhe_fbs_map_tpu.frontend.circuits.epfl_control import (
        epfl_sqrt, golden_sqrt)
    c = epfl_sqrt()
    c.remove_dangling_nodes()
    cases = [0, 1, 2, 3, 4, 15, 16, 17, (1 << 128) - 1, (1 << 127),
             (1 << 64) - 1, 10**30]
    vals = {f"n{i}": np.array([(x >> i) & 1 for x in cases])
            for i in range(128)}
    got = c.eval(vals)
    want = golden_sqrt(vals)
    for k, w in want.items():
        assert np.all((np.asarray(got[k]).astype(np.int64) & 1) == w), k
