"""EMA of model weights as a pure pytree transform.

Reference parity: muse/modeling_ema.py:8-244 (decay warmup schedules,
update_every gating, store/restore swap, save/load as a pretrained dir with
EMA hyperparams in the config).  TPU-native: the update is a single fused
``tree_map`` under jit; the shadow tree shards exactly like the params.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["EMAModel"]


@functools.partial(jax.jit, donate_argnums=(0,))
def _ema_update(shadow, params, one_minus_decay):
    return jax.tree_util.tree_map(
        lambda s, p: s - one_minus_decay * (s - p.astype(s.dtype)), shadow, params)


class EMAModel:
    def __init__(self, params, decay: float = 0.9999, min_decay: float = 0.0,
                 update_after_step: int = 0, update_every: int = 1,
                 use_ema_warmup: bool = False, inv_gamma: float = 1.0,
                 power: float = 2 / 3, model_cls=None, model_config=None):
        self.shadow_params = jax.tree_util.tree_map(jnp.asarray, params)
        self.temp_stored_params = None
        self.decay = decay
        self.min_decay = min_decay
        self.update_after_step = update_after_step
        self.update_every = update_every
        self.use_ema_warmup = use_ema_warmup
        self.inv_gamma = inv_gamma
        self.power = power
        self.optimization_step = 0
        self.cur_decay_value = None
        self.model_cls = model_cls
        self.model_config = model_config

    def get_decay(self, optimization_step: int) -> float:
        # reference modeling_ema.py:89-106
        step = max(0, optimization_step - self.update_after_step - 1)
        if step <= 0:
            return 0.0
        if self.use_ema_warmup:
            cur = 1 - (1 + step / self.inv_gamma) ** -self.power
        else:
            cur = (1 + step) / (10 + step)
        return max(min(cur, self.decay), self.min_decay)

    def step(self, params):
        # reference modeling_ema.py:108-126
        self.optimization_step += 1
        if (self.optimization_step - 1) % self.update_every != 0:
            return
        decay = self.get_decay(self.optimization_step)
        self.cur_decay_value = decay
        self.shadow_params = _ema_update(self.shadow_params, params,
                                         jnp.float32(1.0 - decay))

    def copy_to(self):
        """Returns the EMA params (functional: callers assign them)."""
        return self.shadow_params

    def store(self, params):
        self.temp_stored_params = params

    def restore(self):
        if self.temp_stored_params is None:
            raise RuntimeError("No params stored; call `store` before `restore`")
        params, self.temp_stored_params = self.temp_stored_params, None
        return params

    def state_dict(self) -> Dict[str, Any]:
        return {
            "decay": self.decay,
            "min_decay": self.min_decay,
            "optimization_step": self.optimization_step,
            "update_after_step": self.update_after_step,
            "update_every": self.update_every,
            "use_ema_warmup": self.use_ema_warmup,
            "inv_gamma": self.inv_gamma,
            "power": self.power,
        }

    def load_state_dict(self, state: Dict[str, Any]):
        for k, v in state.items():
            if hasattr(self, k) and v is not None:
                setattr(self, k, v)

    def save_pretrained(self, path: str):
        # reference stuffs EMA hyperparams into config.json (modeling_ema.py:74-87)
        if self.model_cls is None or self.model_config is None:
            raise ValueError("save_pretrained needs model_cls and model_config")
        model = self.model_cls(config=self.model_config, params=self.shadow_params)
        model.save_pretrained(path)
        import json
        import os

        cfg_path = os.path.join(path, "config.json")
        with open(cfg_path) as f:
            cfg = json.load(f)
        cfg.update(self.state_dict())
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=2, sort_keys=True)

    @classmethod
    def from_pretrained(cls, path: str, model_cls) -> "EMAModel":
        import json
        import os

        model = model_cls.from_pretrained(path)
        with open(os.path.join(path, "config.json")) as f:
            cfg = json.load(f)
        ema = cls(model.params, model_cls=model_cls, model_config=model.config)
        ema.load_state_dict({k: cfg.get(k) for k in ema.state_dict()})
        return ema
