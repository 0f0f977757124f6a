"""Worker process for the multi-process jax.distributed test.

Launched by tests/test_distributed_multiprocess.py as
``python tests/_distributed_worker.py <coordinator> <num_procs> <pid>``.
Each process owns 2 virtual CPU devices; the global (dp=4, tp=1) mesh spans
both processes.  One batched generic bootstrap runs dp-sharded across the
global mesh; every process decrypts the allgathered result and checks it
bit-exactly (prints DISTRIBUTED_OK on success).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tfhe_fbs_map_tpu.parallel.distributed import (global_mesh,  # noqa: E402
                                                   init_distributed)


def main() -> int:
    assert init_distributed(coordinator, num_procs, pid) is True
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 2 * num_procs
    assert jax.local_device_count() == 2

    mesh = global_mesh(tp=1)
    assert mesh.shape["dp"] == 2 * num_procs and mesh.shape["tp"] == 1

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tfhe_fbs_map_tpu.tfhe import (TFHEParams, build_test_vector,
                                       encrypt_values, generate_keys)
    from tfhe_fbs_map_tpu.tfhe.encrypt import lwe_phase, decode
    from tfhe_fbs_map_tpu.tfhe.pbs import functional_bootstrap

    params = TFHEParams(p=4, lwe_dim=16, glwe_dim=1, poly_size=128,
                        bsk_level=2, bsk_base_log=8, ksk_level=3,
                        ksk_base_log=4, lwe_noise_std=2.0,
                        glwe_noise_std=2.0)
    # identical seeds on every process -> identical keys and plaintexts
    keys = generate_keys(params, seed=3)
    rng = np.random.default_rng(4)
    batch = 8
    values = rng.integers(0, 3, batch)
    cts = np.asarray(encrypt_values(keys, values, rng))
    tv, post = build_test_vector([1, 0, 1], params)
    tvs = np.broadcast_to(np.asarray(tv), (batch, params.poly_size)).copy()
    posts = np.full((batch,), np.int32(post))

    # each process contributes its dp slice of the global batch
    dp = mesh.shape["dp"]
    per = batch // dp
    lo = pid * jax.local_device_count() * per
    hi = lo + jax.local_device_count() * per
    sh = NamedSharding(mesh, P("dp"))
    g_cts = jax.make_array_from_process_local_data(sh, cts[lo:hi])
    g_tvs = jax.make_array_from_process_local_data(sh, tvs[lo:hi])
    g_posts = jax.make_array_from_process_local_data(sh, posts[lo:hi])

    bsk = jax.device_put(keys.bsk, NamedSharding(mesh, P()))
    ksk = jax.device_put(keys.ksk, NamedSharding(mesh, P()))

    @jax.jit
    def step(bsk, ksk, cts, tvs, posts):
        from tfhe_fbs_map_tpu.tfhe.keys import TFHEKeys
        k = TFHEKeys(params=params, lwe_key=None, glwe_key=None,
                     bsk=bsk, ksk=ksk)
        return functional_bootstrap(k, cts, tvs, posts)

    out = step(bsk, ksk, g_cts, g_tvs, g_posts)

    from jax.experimental import multihost_utils
    full = multihost_utils.process_allgather(out, tiled=True)
    phases = np.asarray(lwe_phase(keys.extracted_key, jnp.asarray(full)))
    got = decode(phases, params)
    want = np.asarray([1, 0, 1])[values]
    assert np.array_equal(got, want), (got, want)
    print(f"DISTRIBUTED_OK pid={pid} procs={jax.process_count()} "
          f"devices={jax.device_count()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
