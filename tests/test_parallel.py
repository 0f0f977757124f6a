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


# ---------------------------------------------------------------------------
# Mesh-parallel CircuitExecutor (dp-sharded wire buffer, VERDICT r1 item 1)
# ---------------------------------------------------------------------------

def _mesh_run(bench, orientation, dp, tp, batch=16, seed=7):
    import jax

    from tfhe_fbs_map_tpu.frontend import HeuristicMapper
    from tfhe_fbs_map_tpu.frontend.circuits import build_bench
    from tfhe_fbs_map_tpu.ops.blind_rotate import prepare_fast_keys
    from tfhe_fbs_map_tpu.parallel.mesh import make_mesh
    from tfhe_fbs_map_tpu.runtime.executor import CircuitExecutor
    from tfhe_fbs_map_tpu.tfhe import TEST_PARAMS, generate_keys

    keys = generate_keys(TEST_PARAMS, seed=seed)
    circ = build_bench(bench)
    prog = HeuristicMapper(cone_merger="search",
                           fbs_size=TEST_PARAMS.p).map(circ)
    prog.remove_dangling_nodes()

    rng = np.random.default_rng(seed + 1)
    vals = {i.name: rng.integers(0, 2, batch) for i in circ.inputs}
    want = circ.eval(vals)

    fast = None if orientation == "generic" else \
        prepare_fast_keys(keys, orientation=orientation)
    mesh = make_mesh(None, dp=dp, tp=tp)
    ex = CircuitExecutor(prog, keys, fast_keys=fast, mesh=mesh)
    got = ex.run_cleartext(vals, seed=seed + 2)
    for k in want:
        assert np.array_equal(np.asarray(want[k]), got[k]), k
    return ex


@pytest.mark.parametrize("orientation,dp,tp",
                         [("generic", 8, 1), ("fused_otf", 8, 1),
                          ("matmul", 4, 2)])
def test_mesh_executor_full_adder(orientation, dp, tp):
    """Full mapped circuit through the dp-sharded executor: bit-exact on
    the 8-virtual-device mesh for the shard_map paths (generic, fused
    Pallas) and the GSPMD path (matmul, tp-sharded key contraction)."""
    ex = _mesh_run("full_adder", orientation, dp, tp)
    assert ex.num_bootstraps >= 1 and ex.mesh is not None


def test_mesh_executor_aes_sbox_realistic():
    """Realistic shapes (49 bootstraps / 11 levels at TEST_PARAMS) through
    the mesh executor — sharding bugs can't hide behind toy circuits."""
    ex = _mesh_run("aes_sbox", "generic", 8, 1, batch=8)
    assert ex.num_bootstraps >= 40
    assert len(ex.levels) >= 8


def test_init_distributed_single_process_noop(monkeypatch):
    """No coordinator env => single-process fallback, nothing initialized."""
    from tfhe_fbs_map_tpu.parallel.distributed import (global_mesh,
                                                       init_distributed)
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() is False
    mesh = global_mesh(tp=2)
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] == 2


@pytest.mark.parametrize("tp", [16, 3, 0])
def test_global_mesh_rejects_cross_host_tp(tp):
    """tp must DIVIDE the local device count: tp=16 on an 8-device host
    would span processes and put the key-contraction psum on DCN (the
    r2 assert's `tp % local == 0` disjunct wrongly accepted it)."""
    from tfhe_fbs_map_tpu.parallel.distributed import global_mesh
    with pytest.raises(AssertionError):
        global_mesh(tp=tp)
