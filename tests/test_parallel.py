"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def test_eight_virtual_devices():
    import jax
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoints():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    import jax
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]

    g.dryrun_multichip(8)


@pytest.mark.parametrize("orientation,dp,tp", [("matmul", 4, 2),
                                               ("fused", 8, 1),
                                               ("fused_otf", 4, 2)])
def test_sharded_bootstrap_matches_single_device(orientation, dp, tp):
    import jax

    import __graft_entry__ as g
    from tfhe_fbs_map_tpu.ops.blind_rotate import (functional_bootstrap_fast,
                                                   prepare_fast_keys)
    from tfhe_fbs_map_tpu.parallel.mesh import (make_mesh, shard_batch,
                                                shard_fast_keys,
                                                sharded_bootstrap)

    params, fast, cts, tvs, posts = g._tiny_setup(seed=5)
    if orientation != fast.orientation:
        from tfhe_fbs_map_tpu.tfhe import generate_keys
        keys = generate_keys(params, seed=5)
        fast = prepare_fast_keys(keys, orientation=orientation)
    want = np.asarray(functional_bootstrap_fast(fast, cts, tvs, posts))

    mesh = make_mesh(jax.devices(), dp=dp, tp=tp)
    fast_s = shard_fast_keys(mesh, fast)
    fn = sharded_bootstrap(mesh, fast_s)
    got = np.asarray(fn(shard_batch(mesh, cts), shard_batch(mesh, tvs),
                        shard_batch(mesh, posts)))
    assert np.array_equal(want.astype(np.uint32), got.astype(np.uint32))
