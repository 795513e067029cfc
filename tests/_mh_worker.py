"""Worker process for tests/test_multihost.py: one of N processes of a
multi-host CPU run (4 virtual devices per process). Prints one JSON line
with the sharded train-step loss; the test compares it against the
single-process value."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)


def main():
    import numpy as np
    import optax
    import jax.numpy as jnp

    from fourdgs.parallel import multihost
    from fourdgs.parallel import distributed as D
    from fourdgs.core.camera import Camera
    from fourdgs.render.pipeline import RenderConfig
    from __graft_entry__ import _tiny_scene

    assert multihost.initialize(), "JAX_COORDINATOR env missing"
    assert jax.process_count() == int(os.environ["JAX_NUM_PROCESSES"])
    assert jax.local_device_count() == 4
    mesh = multihost.host_mesh()

    n = 8 * jax.device_count()
    params_np = {k: np.asarray(v) for k, v in _tiny_scene(n=n, seed=1).items()}
    sl = multihost.process_local_slice(n)
    params = {k: multihost.shard_host_data(v[sl], mesh)
              for k, v in params_np.items()}

    camera = Camera.create(position=(0.0, 0.0, 0.0), width=64, height=32)
    cfg = RenderConfig(max_splats_per_tile=128, splat_chunk=32,
                       max_tiles_per_splat=8)
    target = jnp.zeros((camera.height, camera.width, 4))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step = jax.jit(D.make_sharded_train_step(camera, mesh, optimizer, cfg,
                                             exchange="alltoall"))
    p2, opt2, loss = step(params, opt_state, target, jnp.asarray(0.5))
    jax.block_until_ready(loss)
    # Updated params are sharded across processes; a global L1 (computed on
    # device, result replicated) gives a cheap cross-process agreement check.
    params_l1 = float(sum(float(jnp.sum(jnp.abs(v))) for v in p2.values()))
    print(json.dumps({"process": jax.process_index(),
                      "loss": float(loss),
                      "params_l1": params_l1}), flush=True)


if __name__ == "__main__":
    main()
