"""Device-mesh construction for GSPMD training/inference.

The reference's only parallelism is NCCL data-parallel DDP via accelerate
(SURVEY.md §2.4, training/train_muse.py:261-267).  TPU-native equivalent: one
``jax.sharding.Mesh`` with three logical axes —

  dp    data parallel (batch sharding; grad all-reduce rides ICI)
  fsdp  parameter/optimizer sharding (ZeRO-3 analog, reference only hooked
        DeepSpeed stage<3, train_muse.py:269-272)
  tp    tensor parallel (attention heads / MLP columns)

plus ``jax.distributed.initialize`` for multi-host DCN setup.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "MeshAxes", "initialize_distributed",
           "local_batch_slice", "batch_sharding", "replicated", "put_batch"]

MeshAxes = ("dp", "fsdp", "tp")


def create_mesh(dp: Optional[int] = None, fsdp: int = 1, tp: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('dp','fsdp','tp') mesh; dp defaults to all remaining devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % (fsdp * tp) != 0:
            raise ValueError(f"{n} devices not divisible by fsdp*tp={fsdp * tp}")
        dp = n // (fsdp * tp)
    if dp * fsdp * tp != n:
        raise ValueError(f"dp*fsdp*tp={dp * fsdp * tp} != {n} devices")
    mesh_devices = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(mesh_devices, MeshAxes)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host DCN initialization (replaces torch.distributed.run c10d
    rendezvous, slurm_scripts/research_run_512.slurm:43-51).

    Called by every trainer CLI at startup.  Explicit args win; otherwise the
    MUSE_COORDINATOR_ADDRESS / MUSE_NUM_PROCESSES / MUSE_PROCESS_ID env vars
    (exported per-worker by tpu_scripts/launch_pod.sh) drive the rendezvous.
    No-op single-process so single-host runs need no env.  Returns True when
    the cluster was initialized."""
    import os

    if num_processes is None:
        num_processes = int(os.environ.get("MUSE_NUM_PROCESSES", "1"))
    if num_processes is None or num_processes <= 1:
        # TPU pod: jax.distributed.initialize() with NO args discovers the
        # topology from the TPU metadata server.  EXPLICIT opt-in only
        # (MUSE_AUTO_DISTRIBUTED=1, exported by tpu_scripts/launch_pod.sh):
        # pod env markers like TPU_WORKER_HOSTNAMES also appear on
        # single-chip tunnel hosts, where no-arg initialize() fails.
        if os.environ.get("MUSE_AUTO_DISTRIBUTED") == "1":
            jax.distributed.initialize()
            return True
        return False
    if coordinator_address is None:
        coordinator_address = os.environ.get("MUSE_COORDINATOR_ADDRESS")
    if process_id is None:
        pid = os.environ.get("MUSE_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch sharded over dp and fsdp (fsdp also splits the batch for
    activation memory; params gather as needed)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# dict keys that carry broadcast tensors (one row shared by the whole batch)
# rather than per-sample rows — these replicate instead of batch-sharding.
# Keyed by NAME, not by shape[0]==1: a per-host batch of 1 (global batch ==
# process count) must still shard/assemble as a batch tensor.
REPLICATED_BATCH_KEYS = frozenset({"empty_embeds", "empty_cond_embeds"})


def put_batch(batch: dict, mesh: Mesh,
              replicated_keys=REPLICATED_BATCH_KEYS) -> dict:
    """Place a host-local batch dict onto the mesh with the batch dim sharded
    over ('dp','fsdp').  Scalars and entries named in ``replicated_keys``
    (broadcast tensors like the CFG empty-prompt embeds) replicate.

    Single-host: plain jax.device_put.  Multi-host: each host contributes its
    local slice of the global batch (accelerate split_batches semantics —
    the caller loads global_batch/process_count samples per host, see
    local_batch_slice) and jax.make_array_from_process_local_data assembles
    the global sharded array.
    """
    import numpy as np  # noqa: F811 (shadow ok)

    batch_sh = batch_sharding(mesh)
    rep = replicated(mesh)
    multihost = jax.process_count() > 1

    def place(k, v):
        if isinstance(v, (list, tuple)) and v and isinstance(v[0], str):
            return v  # raw text rides along for host-side use
        arr = np.asarray(v)
        sh = rep if arr.ndim == 0 or k in replicated_keys else batch_sh
        if multihost:
            return jax.make_array_from_process_local_data(sh, arr)
        return jax.device_put(arr, sh)

    return {k: place(k, v) for k, v in batch.items()}


def local_batch_slice(global_batch: int, process_index: Optional[int] = None,
                      process_count: Optional[int] = None) -> slice:
    """Per-host slice of the global batch (accelerate split_batches=True
    semantics: global batch fixed regardless of host count,
    train_muse.py:266)."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per_host = global_batch // process_count
    return slice(process_index * per_host, (process_index + 1) * per_host)
