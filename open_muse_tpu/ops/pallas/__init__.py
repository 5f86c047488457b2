"""Pallas TPU kernels + the shared dispatch policy.

``kernels_enabled()`` is the one gate every default-on kernel consults
(VQ argmin, fused sampling, fused CFG sampling):

- single-device TPU: ON (the measured-win configuration, STATUS.md);
- multi-device: ON only inside a ``parallel.kernel_mesh`` context — the
  row-parallel kernels then run under ``shard_map`` so the SPMD partitioner
  never all-gathers around the opaque ``pallas_call`` (round-4 verdict
  item 5);
- non-TPU backends: ON only with ``MUSE_TPU_PALLAS_INTERPRET=1``, which also
  flips the kernels into interpreter mode — this lets CI and the multichip
  dryrun exercise the real kernel code paths (sharded included) on the
  virtual CPU mesh.

Per-kernel env switches (MUSE_TPU_PALLAS_SAMPLE / _SAMPLE_CFG / _VQ / _GLU /
_ATTN_SUBLAYER) still override individually.  The WEIGHT-consuming kernels
(GLU matmul, fused attention sublayer) have a stricter mesh condition than
the row-parallel ones: multi-device only inside a kernel_mesh whose weight
axes are trivial (``parallel.kernel_mesh.replicated_weight_mesh`` — dp-only
serving with replicated params); on fsdp/tp meshes they stay on the XLA
path, where GSPMD manages the weight collectives.
"""

from __future__ import annotations

import os

import jax

__all__ = ["kernels_enabled", "interpret_mode"]


def interpret_mode() -> bool:
    """True when kernels should run in Pallas interpreter mode (CPU CI)."""
    return os.environ.get("MUSE_TPU_PALLAS_INTERPRET", "0") == "1"


def kernels_enabled() -> bool:
    """Shared default-on policy for the row-parallel kernels."""
    if jax.default_backend() == "tpu":
        if jax.device_count() == 1:
            return True
        from ...parallel.kernel_mesh import current_kernel_mesh

        return current_kernel_mesh() is not None
    return interpret_mode()
