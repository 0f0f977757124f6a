import io

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend import LutProgram, parse_lbf


def build_demo():
    # Mirrors the reference smoke program (fbs_exec_env.py:279-301).
    env = LutProgram()
    a = env.input("a")
    b = env.input("b")
    c = env.const(1)
    d = env.linear([1, 2], [a, b])
    e = env.linear([1, 1], [c, d])
    f = env.bootstrap(e, [1, 0, 1, 1, 0])
    g = env.linear([2, 1], [a, f])
    h = env.bootstrap(g, [1, 1, 0, 2])
    i = env.bootstrap(h, [1, 0, 1])
    env.output("f", f)
    env.output("g", g)
    env.output("h", h)
    return env


def test_eval_demo():
    env = build_demo()
    out = env.eval({"a": [1, 0], "b": [1, 0]})
    # e = a + 2b + 1; f = [1,0,1,1,0][e]; g = 2a + f; h = [1,1,0,2][g]
    assert list(out["f"]) == [0, 0]
    assert list(out["g"]) == [2, 0]
    assert list(out["h"]) == [0, 1]


def test_value_bounds_and_assert():
    env = LutProgram()
    a = env.input("a")
    b = env.input("b")
    lin = env.linear([2, 3], [a, b], const_coef=1)
    assert lin.max_val == 6
    with pytest.raises(AssertionError):
        env.bootstrap(lin, [0, 1, 1])  # wrong table length
    env.bootstrap(lin, [0, 1, 1, 0, 1, 1, 0])


def test_negative_coef_bound():
    env = LutProgram()
    a = env.input("a")
    lin = env.linear([-1], [a], const_coef=1)
    assert lin.max_val == 1  # max(0, -1*1) contributes 0


def test_linear_flattening():
    env = LutProgram()
    a = env.input("a")
    b = env.input("b")
    l1 = env.linear([1, 2], [a, b], const_coef=3)
    l2 = env.linear([2, 1], [l1, a])
    assert l2.const == 6
    assert [(c, v.name) for c, v in l2.terms] == [(2, "a"), (4, "b"), (1, "a")]


def test_cse():
    env = LutProgram()
    a = env.input("a")
    b = env.input("b")
    l1 = env.linear([1, 2], [a, b])
    l2 = env.linear([1, 2], [a, b])
    assert l1 is l2
    t1 = env.bootstrap(l1, [0, 1, 0, 1])
    t2 = env.bootstrap(l2, [0, 1, 0, 1])
    assert t1 is t2
    assert env.input("a") is a


def test_stats_norm2():
    env = build_demo()
    s = env.stats()
    assert s["nb_inp"] == 2
    assert s["nb_bootstrap"] == 3
    assert s["max_lut_size"] == 5
    # norm2: d = 1+4 = 5; e = 5 (flattened); g = 4+1 = 5
    assert s["norm2_linprod"] == 5


def test_dangling_removal():
    env = LutProgram()
    a = env.input("a")
    b = env.input("b")
    l1 = env.linear([1, 2], [a, b])
    env.linear([5, 1], [a, b])  # dangling
    t = env.bootstrap(l1, [0, 1, 1, 0])
    env.output("t", t)
    env.remove_dangling_nodes()
    assert env.stats()["nb_linprod"] == 1


def test_lbf_roundtrip():
    env = build_demo()
    buf = io.StringIO()
    env.write_lbf(buf)
    text = buf.getvalue()
    assert ".inputs a b" in text
    assert ".bootstrap" in text

    prog2 = parse_lbf(text)
    vals = {"a": [0, 1, 0, 1], "b": [0, 0, 1, 1]}
    out1 = env.eval(vals)
    out2 = prog2.eval(vals)
    for k in out1:
        assert np.array_equal(out1[k], out2[k]), k


def test_lbf_const_output():
    env = LutProgram()
    env.input("a")
    env.output("z", env.const(1))
    buf = io.StringIO()
    env.write_lbf(buf)
    prog2 = parse_lbf(buf.getvalue())
    assert np.all(np.asarray(prog2.eval({"a": [0, 1]})["z"]) == 1)


def test_fbs_size_roundtrip_and_inference():
    """Negacyclic half-tables are tied to the mapping-time p: the .lbf
    records it (superset stanza), and inference recovers the smallest
    valid p for reference-format files (regression: a len-17 table mapped
    at p=10 must NOT be re-executed at p=9)."""
    import io

    from tfhe_fbs_map_tpu.frontend.lut_program import LutProgram, parse_lbf

    prog = LutProgram(fbs_size=10)
    x = prog.input("x")
    # len-17 table satisfying t[i] + t[i+10] == 1 on the overlap (mode 1)
    table = [0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0]
    assert all(table[i] + table[i + 10] == 1 for i in range(7))
    lin = prog.linear([16], [x], const_coef=0)  # value bound 16 → 17 entries
    prog.output("y", prog.bootstrap(lin, table))

    buf = io.StringIO()
    prog.write_lbf(buf)
    text = buf.getvalue()
    assert ".fbs_size 10" in text
    again = parse_lbf(text)
    assert again.fbs_size == 10

    # reference-format file (no stanza): inference must reject p=9
    stripped = "\n".join(ln for ln in text.splitlines()
                         if not ln.startswith(".fbs_size"))
    legacy = parse_lbf(stripped)
    assert legacy.fbs_size is None
    assert legacy.min_fbs_size() == 10
