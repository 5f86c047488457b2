"""Optimizers: adamw / fused adamw / 8-bit adamw / bf16-moment adamw / lion.

Reference parity: training/train_muse.py:405-424 dispatches adamw,
apex FusedAdam, bitsandbytes AdamW8bit and a hand-rolled Lion
(training/optimizer.py:20-81).  On TPU:

  * optax.adamw IS the fused adam — XLA fuses the update into one kernel, so
    "fused_adamw" is an alias;
  * "8bit_adamw" is a REAL 8-bit-state optimizer: blockwise int8 moments
    with per-256-block absmax scales and a log-spaced dynamic codebook
    (quant8.py) — the same ~4x optimizer-memory saving bitsandbytes
    AdamW8bit gets, implemented as a pure optax/XLA transform;
  * "bf16_adamw" keeps adam first moments in bfloat16 via ``mu_dtype``
    (2x saving, zero quantization error — the lighter-touch option);
  * lion is optax.lion (sign-momentum, same math as training/optimizer.py:43-79).

Weight-decay masking excludes biases, norms and embeddings
(train_muse.py:427-437).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["get_optimizer", "decay_mask_fn"]

NO_DECAY_SUBSTRINGS = ("bias", "scale", "gamma", "beta", "embedding", "gammas",
                       "running_mean", "running_var")


def decay_mask_fn(params):
    """True where weight decay applies (reference excludes bias/LN/embeddings,
    train_muse.py:427-437)."""

    def keep(path, leaf):
        name = ".".join(str(getattr(k, "key", k)) for k in path).lower()
        return not any(s in name for s in NO_DECAY_SUBSTRINGS)

    return jax.tree_util.tree_map_with_path(keep, params)


def get_optimizer(
    name: str,
    learning_rate,  # float or optax schedule
    beta1: float = 0.9,
    beta2: float = 0.999,
    weight_decay: float = 0.01,
    epsilon: float = 1e-8,
    use_8bit: Optional[bool] = None,
    max_grad_norm: Optional[float] = None,
):
    name = name.lower()
    if name in ("adamw", "fused_adamw"):
        tx = optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=epsilon,
                         weight_decay=weight_decay, mask=decay_mask_fn)
    elif name == "8bit_adamw":
        from .quant8 import adamw8bit

        tx = adamw8bit(learning_rate, b1=beta1, b2=beta2, eps=epsilon,
                       weight_decay=weight_decay, mask=decay_mask_fn)
    elif name == "bf16_adamw":
        tx = optax.adamw(learning_rate, b1=beta1, b2=beta2, eps=epsilon,
                         weight_decay=weight_decay, mask=decay_mask_fn,
                         mu_dtype=jnp.bfloat16)
    elif name == "lion":
        tx = optax.lion(learning_rate, b1=beta1, b2=beta2,
                        weight_decay=weight_decay, mask=decay_mask_fn)
    else:
        raise ValueError(f"optimizer {name} not supported")

    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
