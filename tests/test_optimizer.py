import subprocess
import sys

import pytest

from tfhe_fbs_map_tpu.optimizer import (P_ERROR_4_SIGMA, optimize,
                                        p_error_atomic)
from tfhe_fbs_map_tpu.tfhe.params import (DEFAULT_PARAMS, min_noise_std_rel,
                                          Q)


def test_security_curve_anchors():
    # classic TFHE points: (630, 2^-15), (1024, 2^-25)
    assert abs(min_noise_std_rel(630) / 2 ** -15.4 - 1) < 0.6
    assert abs(min_noise_std_rel(1024) / 2 ** -25.1 - 1) < 0.6


@pytest.mark.parametrize("p,norm2", [(2, 2), (4, 10), (8, 20), (16, 50)])
def test_optimize_meets_target(p, norm2):
    sol = optimize(p, norm2)
    assert sol is not None, (p, norm2)
    assert sol.p_error <= P_ERROR_4_SIGMA
    assert sol.params.bsk_base_log <= 8  # int8-digit constraint
    # security: noise at or above the 128-bit curve
    assert sol.params.lwe_noise_std >= \
        min_noise_std_rel(sol.params.lwe_dim) * Q * 0.99


def test_cost_monotone_in_precision():
    costs = [optimize(p, 4).cost for p in (2, 8, 32)]
    assert costs[0] <= costs[1] <= costs[2]


def test_higher_norm2_not_cheaper():
    a = optimize(4, 1)
    b = optimize(4, 100)
    assert a is not None and b is not None
    assert b.cost >= a.cost * 0.99


def test_default_params_close_to_model():
    # the hand-picked anchor set must satisfy its own error target at p=4
    pr = DEFAULT_PARAMS
    perr = p_error_atomic(4, 4, pr.lwe_dim, pr.glwe_dim, pr.poly_size,
                          pr.bsk_level, pr.bsk_base_log, pr.ksk_level,
                          pr.ksk_base_log, pr.lwe_noise_std,
                          pr.glwe_noise_std)
    assert perr < 1e-3


def test_cli_contract():
    res = subprocess.run(
        [sys.executable, "-m", "tfhe_fbs_map_tpu.optimizer",
         "--precision", "9", "--sq-norm2", "14"],
        capture_output=True, text=True, cwd="/root/repo")
    assert res.returncode == 0, res.stderr
    line = res.stdout.strip().splitlines()[-1]
    # the estimate pipeline parses the 2nd-to-last comma field as cost
    cost = int(line.split(",")[-2].strip())
    assert cost > 0
