import io

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend import BitCircuit, CONST0, CONST1


def test_builder_and_eval():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    d = c.and_(a, b)
    e = c.xor_(a, b)
    f = c.lut([a, b], [0, 1, 0, 0])
    c.set_output("d", d)
    c.set_output("e", e)
    c.set_output("f", f)

    vals = {"a": [0, 0, 1, 1], "b": [0, 1, 0, 1]}
    out = c.eval(vals)
    assert list(out["d"]) == [0, 0, 0, 1]
    assert list(out["e"]) == [0, 1, 1, 0]
    # MSB-first: row index = 2*a + b, table [0,1,0,0] -> (~a & b)
    assert list(out["f"]) == [0, 1, 0, 0]


def test_constant_folding():
    c = BitCircuit()
    a = c.add_input("a")
    assert c.and_(a, CONST0) is CONST0
    assert c.and_(a, CONST1) is a
    assert c.or_(a, CONST1) is CONST1
    assert c.or_(a, CONST0) is a
    assert c.xor_(a, CONST0) is a
    assert c.not_(CONST0) is CONST1
    n = c.xor_(a, CONST1)
    assert n.kind == "not"
    # none of the folded calls should have appended gates except the not
    assert sum(1 for x in c.nodes if x.is_gate) == 1


def test_const_output_eval():
    c = BitCircuit()
    a = c.add_input("a")
    c.set_output("z", c.and_(a, CONST0))
    out = c.eval({"a": [0, 1]})
    assert np.all(out["z"] == 0)


def test_eval_msb_first_3input():
    c = BitCircuit()
    x = [c.add_input(f"x{i}") for i in range(3)]
    table = [0, 1, 0, 1, 1, 0, 0, 1]
    g = c.lut(x, table)
    c.set_output("g", g)
    rng = np.random.default_rng(0)
    vals = {f"x{i}": rng.integers(0, 2, 64) for i in range(3)}
    out = c.eval(vals)
    idx = vals["x0"] * 4 + vals["x1"] * 2 + vals["x2"]
    assert np.array_equal(out["g"], np.asarray(table)[idx])


def test_remove_dangling():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    d = c.and_(a, b)
    c.xor_(a, b)  # dangling
    c.set_output("d", d)
    c.remove_dangling_nodes()
    assert sum(1 for x in c.nodes if x.is_gate) == 1
    assert len(c.inputs) == 2  # interface preserved


def test_stats():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    d = c.and_(a, b)
    e = c.xor_(a, d)
    f = c.not_(e)
    c.set_output("f", f)
    s = c.stats()
    assert s["nb_inp"] == 2 and s["nb_and"] == 1 and s["nb_xor"] == 1
    assert s["nb_not"] == 1 and s["nb_out"] == 1


def test_to_blif_roundtrip_text():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    d = c.or_(a, b, name="d")
    c.set_output("d", d)
    buf = io.StringIO()
    c.to_blif(buf, model_name="m")
    text = buf.getvalue()
    assert ".model m" in text
    assert ".inputs a b" in text
    assert ".outputs d" in text
    # OR has three 1-rows, one 0-row: sparser polarity is 0
    assert "00 0" in text


def test_duplicate_name_rejected():
    c = BitCircuit()
    a = c.add_input("a")
    b = c.add_input("b")
    c.and_(a, b, name="g")
    with pytest.raises(AssertionError):
        c.xor_(a, b, name="g")
