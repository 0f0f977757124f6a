"""The native C++ optimizer must agree with the Python reference model."""

import pytest

from tfhe_fbs_map_tpu.optimizer import P_ERROR_4_SIGMA, optimize
from tfhe_fbs_map_tpu.optimizer.native import (native_available,
                                               optimize_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


@pytest.mark.parametrize("p,norm2", [(2, 2), (4, 10), (8, 20), (16, 50),
                                     (32, 5)])
def test_native_matches_python(p, norm2):
    py = optimize(p, norm2, max_p_error=P_ERROR_4_SIGMA)
    cc = optimize_native(p, norm2, max_p_error=P_ERROR_4_SIGMA)
    assert (py is None) == (cc is None)
    if py is None:
        return
    assert py.params == cc.params, (py.params, cc.params)
    assert abs(py.cost - cc.cost_us if hasattr(cc, 'cost_us') else
               py.cost - cc.cost) < 1e-6


def test_native_is_fast():
    import time
    t0 = time.time()
    for p in range(2, 12):
        optimize_native(p, 10, max_p_error=P_ERROR_4_SIGMA)
    assert time.time() - t0 < 5.0
