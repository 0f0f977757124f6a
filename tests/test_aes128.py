"""Generated Bristol AES-128: FIPS-197 correctness and frontend parsing."""

import os

import numpy as np
import pytest

from tfhe_fbs_map_tpu.frontend.circuits.aes128 import (
    _SBOX, _bits_to_bytes, _bytes_to_bits, _eval_netlist, aes128_reference,
    emit_aes128)

AES_PATH = os.path.join(os.path.dirname(__file__), "..",
                        "benchmarks", "bristol", "aes_128.txt")


def test_reference_aes_fips197():
    key = bytes(range(16))
    pt = bytes(int(f"{h}{h}", 16) for h in "0123456789abcdef")
    assert aes128_reference(key, pt).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _SBOX[0x53] == 0xED and _SBOX[0] == 0x63


@pytest.fixture(scope="module")
def netlist() -> str:
    if os.path.exists(AES_PATH):
        with open(AES_PATH) as f:
            return f.read()
    return emit_aes128()          # emit_aes128 verifies before returning


def test_netlist_shape(netlist):
    header = netlist.splitlines()[0].split()
    n_gates = int(header[0])
    n_and = sum(1 for ln in netlist.splitlines() if ln.endswith(" AND"))
    # 200 Boyar-Peralta S-boxes (160 rounds + 40 key schedule) x 32 ANDs:
    # the same multiplicative complexity as the public aes_128.txt
    assert n_and == 6400
    assert 25000 < n_gates < 40000


def test_netlist_random_vectors(netlist):
    rng = np.random.default_rng(1)
    for _ in range(3):
        key = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        pt = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
        got = _bits_to_bytes(_eval_netlist(
            netlist, _bytes_to_bits(pt) + _bytes_to_bits(key)))
        assert got == aes128_reference(key, pt)


def test_netlist_parses_into_frontend(netlist):
    from tfhe_fbs_map_tpu.frontend.parsers import parse_bristol
    circ = parse_bristol(netlist)
    key = bytes(range(16))
    pt = bytes(int(f"{h}{h}", 16) for h in "0123456789abcdef")
    bits = _bytes_to_bits(pt) + _bytes_to_bits(key)
    values = {f"i_{w}": bits[w] for w in range(256)}
    out = circ.eval(values)
    got_bits = [int(np.asarray(out[name]).reshape(-1)[0])
                for name in sorted(circ.outputs, key=int)]
    assert _bits_to_bytes(got_bits).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
