"""Worker for the 2-process multihost test (spawned by test_multihost.py).

Proves the multihost branches execute for real — not just read well:
  * env-driven ``initialize_distributed`` (parallel/mesh.py) forms a
    2-process jax.distributed CPU cluster (Gloo collectives)
  * ``put_batch`` assembles a GLOBAL array from process-local shards via
    jax.make_array_from_process_local_data — including the per-host-batch-1
    case the shape[0]==1 heuristic used to misroute (advisor round-2 #4)
  * the eval batch-count agreement all-gather (train_muse.py eval loop)
  * collective ``save_checkpoint`` with non-fully-addressable arrays
    (trainer.py:392-451)

Usage: python multihost_worker.py <process_id> <num_processes> <port> <tmpdir>
"""

import os
import sys


def main():
    pid, nproc, port, tmpdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["MUSE_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["MUSE_NUM_PROCESSES"] = str(nproc)
    os.environ["MUSE_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from open_muse_tpu.parallel.mesh import (create_mesh,
                                             initialize_distributed,
                                             local_batch_slice, put_batch)

    assert initialize_distributed() is True
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(dp=jax.device_count())

    # -- put_batch: global batch 8, each host contributes its slice ---------
    global_batch = 8
    sl = local_batch_slice(global_batch)
    full = np.arange(global_batch * 3, dtype=np.float32).reshape(global_batch, 3)
    batch = {
        "image_tokens": full[sl],
        "empty_embeds": np.ones((1, 4, 2), np.float32),  # replicated by NAME
        "texts": ["a", "b"],
    }
    placed = put_batch(batch, mesh)
    assert placed["image_tokens"].shape == (global_batch, 3)
    assert placed["empty_embeds"].sharding.is_equivalent_to(
        NamedSharding(mesh, P()), 3)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
        placed["image_tokens"])
    expected = float(full.sum())
    assert float(total) == expected, (float(total), expected)
    print(f"worker {pid}: put_batch global sum ok ({float(total)})", flush=True)

    # -- per-host batch of 1 (global == process count): MUST still assemble
    #    a global batch tensor, not replicate (advisor round-2 finding #4)
    tiny_global = np.arange(nproc * 2, dtype=np.float32).reshape(nproc, 2)
    tiny = {"image_tokens": tiny_global[pid:pid + 1]}
    placed_tiny = put_batch(tiny, mesh)
    assert placed_tiny["image_tokens"].shape == (nproc, 2), \
        placed_tiny["image_tokens"].shape
    print(f"worker {pid}: batch-1-per-host sharded globally ok", flush=True)

    # -- eval batch-count agreement (train_muse.py eval loop) ----------------
    from jax.experimental import multihost_utils

    n_local = 3 if pid == 0 else 5  # uneven shard split
    counts = multihost_utils.process_allgather(np.int32(n_local))
    assert int(np.min(counts)) == 3
    print(f"worker {pid}: eval count agreement ok (min=3)", flush=True)

    # -- collective save_checkpoint with sharded (non-addressable) state ----
    from open_muse_tpu.training import trainer as T

    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = optax.sgd(1e-2)
    state = T.create_train_state(params, tx, mesh=mesh)
    T.save_checkpoint(tmpdir, state, checkpoints_total_limit=2)
    multihost_utils.sync_global_devices("after_save")
    restored = T.load_checkpoint(os.path.join(tmpdir, "checkpoint-0"), state)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(restored.params["dense"]["kernel"])),
        np.ones((4, 4)))
    print(f"worker {pid}: collective checkpoint save/restore ok", flush=True)


if __name__ == "__main__":
    main()
