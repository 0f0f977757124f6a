import io
import subprocess
import sys

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend import BitCircuit, HeuristicMapper
from tfhe_fbs_map_tpu.frontend.parsers import (parse_bench, parse_blif,
                                               parse_bristol)

BLIF_ADDER = """\
# full adder
.model fa
.inputs a b cin
.outputs sum cout
.names a b n1
01 1
10 1
.names n1 cin sum
01 1
10 1
.names a b n2
11 1
.names n1 cin n3
11 1
.names n2 n3 cout
00 0
.end
"""


def test_parse_blif_full_adder():
    c = parse_blif(BLIF_ADDER)
    assert [i.name for i in c.inputs] == ["a", "b", "cin"]
    vals = {"a": [0, 0, 0, 0, 1, 1, 1, 1],
            "b": [0, 0, 1, 1, 0, 0, 1, 1],
            "cin": [0, 1, 0, 1, 0, 1, 0, 1]}
    out = c.eval(vals)
    total = np.asarray(vals["a"]) + np.asarray(vals["b"]) + np.asarray(vals["cin"])
    assert np.array_equal(out["sum"], total % 2)
    assert np.array_equal(out["cout"], total // 2)


def test_parse_blif_dont_care_and_const():
    text = """\
.model m
.inputs a b
.outputs o z1 z0
.names a b o
1- 1
-1 1
.names z1
1
.names z0
.end
"""
    c = parse_blif(text)
    out = c.eval({"a": [0, 0, 1, 1], "b": [0, 1, 0, 1]})
    assert list(out["o"]) == [0, 1, 1, 1]  # OR via don't-cares
    assert np.all(out["z1"] == 1)
    assert np.all(out["z0"] == 0)


def test_parse_blif_continuation_lines():
    text = (".model m\n.inputs a \\\nb\n.outputs o\n"
            ".names a b o\n11 1\n.end\n")
    c = parse_blif(text)
    assert [i.name for i in c.inputs] == ["a", "b"]


def test_blif_roundtrip_through_export():
    from test_mappers import random_circuit
    c = random_circuit(3)
    buf = io.StringIO()
    c.to_blif(buf, model_name="rt")
    c2 = parse_blif(buf.getvalue())
    rng = np.random.default_rng(5)
    vals = {i.name: rng.integers(0, 2, 100) for i in c.inputs}
    o1, o2 = c.eval(vals), c2.eval(vals)
    for k in o1:
        assert np.all(o1[k] == o2[k]), k


BRISTOL_ADD = """\
4 8
2 2 2
1 2
2 1 0 2 4 XOR
2 1 0 2 5 AND
2 1 1 3 6 XOR
2 1 6 5 7 AND
"""


def test_parse_bristol():
    c = parse_bristol(BRISTOL_ADD)
    assert len(c.inputs) == 4
    vals = {f"i_{k}": [0, 1, 1] for k in range(4)}
    out = c.eval(vals)
    assert set(out.keys()) == {"6", "7"}


BENCH_C17 = """\
# c17 iscas85
INPUT(1)
INPUT(2)
INPUT(3)
INPUT(6)
INPUT(7)
OUTPUT(22)
OUTPUT(23)
10 = NAND(1, 3)
11 = NAND(3, 6)
16 = NAND(2, 11)
19 = NAND(11, 7)
22 = NAND(10, 16)
23 = NAND(16, 19)
"""


def test_parse_bench_c17():
    c = parse_bench(BENCH_C17)
    assert len(c.inputs) == 5
    rng = np.random.default_rng(1)
    vals = {i.name: rng.integers(0, 2, 200) for i in c.inputs}
    out = c.eval(vals)
    # independent model of c17
    g = {k: np.asarray(vals[k]) for k in ("1", "2", "3", "6", "7")}
    n10 = 1 - g["1"] * g["3"]
    n11 = 1 - g["3"] * g["6"]
    n16 = 1 - g["2"] * n11
    n19 = 1 - n11 * g["7"]
    assert np.array_equal(out["22"], 1 - n10 * n16)
    assert np.array_equal(out["23"], 1 - n16 * n19)
    # and it must map bit-exactly
    prog = HeuristicMapper(cone_merger="search", fbs_size=8).map(c)
    got = prog.eval(vals)
    for k in out:
        assert np.all(out[k] == got[k])


def test_parse_bench_multi_input_and_sequential():
    text = """\
INPUT(a)
INPUT(b)
INPUT(c)
OUTPUT(q)
OUTPUT(w)
w = AND(a, b, c)
q = DFF(d)
d = XOR(q, a)
"""
    c = parse_bench(text, unroll_frames=3)
    # 3 frames x 3 inputs
    assert len(c.inputs) == 9
    vals = {i.name: np.array([1]) for i in c.inputs}
    out = c.eval(vals)
    # q starts at 0; q_f0 = 0 (pre-frame state), xor accumulates a=1 each frame
    assert np.all(out["q_f0"] == 0)
    assert np.all(out["q_f1"] == 1)
    assert np.all(out["q_f2"] == 0)
    assert np.all(out["w_f0"] == 1)


def test_bench_out_of_order_gates():
    text = """\
INPUT(a)
INPUT(b)
OUTPUT(o)
o = AND(x, y)
x = NOT(a)
y = OR(a, b)
"""
    c = parse_bench(text)
    out = c.eval({"a": [0, 0, 1], "b": [0, 1, 1]})
    assert list(out["o"]) == [0, 1, 0]
