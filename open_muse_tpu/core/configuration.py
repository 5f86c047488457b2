"""Config runtime: `transformers`-style config save/load for JAX models.

Reference parity: muse/modeling_utils.py:804-1170 (ConfigMixin, FrozenDict,
register_to_config).  The reference captures torch-module ``__init__`` kwargs
into a frozen dict serialized as ``config.json`` with a ``_class_name`` tag
used for pipeline class dispatch (muse/pipeline_muse.py:319-339).

TPU-native redesign: configs are plain dataclasses (hashable, usable as static
jit arguments), models are pure flax.linen modules parameterized by a config,
and the on-disk ``config.json`` format is byte-compatible with the reference so
its published checkpoints load directly.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

__all__ = ["BaseConfig", "ConfigMixin", "register_to_config", "load_config_dict"]

CONFIG_NAME = "config.json"


def _freeze(value):
    """Lists in JSON become tuples so configs stay hashable (jit-static)."""
    if isinstance(value, list):
        return tuple(_freeze(v) for v in value)
    return value


def _thaw(value):
    if isinstance(value, tuple):
        return [_thaw(v) for v in value]
    return value


@dataclasses.dataclass(frozen=True)
class BaseConfig:
    """Base class for all model configs.

    Subclasses are frozen dataclasses; instances are hashable and can be
    passed as static arguments through ``jax.jit``.
    """

    @classmethod
    def from_dict(cls, config_dict: Dict[str, Any]) -> Tuple["BaseConfig", Dict[str, Any]]:
        """Build a config from a dict, returning (config, unused_kwargs).

        Unknown keys (e.g. reference-internal bookkeeping like
        ``num_resolutions`` that the torch side re-registers at init,
        muse/modeling_maskgit_vqgan.py:370-372) are returned, not fatal.
        """
        field_names = {f.name for f in dataclasses.fields(cls)}
        used, unused = {}, {}
        for key, value in config_dict.items():
            if key in field_names:
                used[key] = _freeze(value)
            else:
                unused[key] = value
        return cls(**used), unused

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for f in dataclasses.fields(self):
            out[f.name] = _thaw(getattr(self, f.name))
        return out

    def replace(self, **changes) -> "BaseConfig":
        changes = {k: _freeze(v) for k, v in changes.items()}
        return dataclasses.replace(self, **changes)


def load_config_dict(pretrained_model_path: str, subfolder: str = None) -> Dict[str, Any]:
    """Read a ``config.json`` from a local directory (reference:
    muse/modeling_utils.py:916-1010 minus hub download, which is gated on
    network availability)."""
    path = pretrained_model_path
    if subfolder is not None:
        path = os.path.join(path, subfolder)
    config_file = os.path.join(path, CONFIG_NAME)
    if not os.path.isfile(config_file):
        raise EnvironmentError(f"{path} does not contain a {CONFIG_NAME} file")
    with open(config_file, "r", encoding="utf-8") as f:
        return json.load(f)


class ConfigMixin:
    """Mixin giving model wrappers reference-compatible config I/O.

    Class attrs expected on users:
      - ``config_class``: the BaseConfig dataclass
      - ``_class_name``: string written to / matched against ``config.json``
        (kept identical to the reference torch class names so checkpoints
        interoperate, muse/pipeline_muse.py:319-339).
    """

    config_class = None
    _class_name = None
    # extra legacy aliases accepted when dispatching on _class_name
    _class_name_aliases: Tuple[str, ...] = ()

    @classmethod
    def load_config(cls, pretrained_model_name_or_path: str, subfolder: str = None, **kwargs):
        return load_config_dict(pretrained_model_name_or_path, subfolder=subfolder)

    @classmethod
    def from_config(cls, config, **kwargs):
        if isinstance(config, dict):
            config, _ = cls.config_class.from_dict({**config, **kwargs})
        return cls(config=config)

    def save_config(self, save_directory: str):
        os.makedirs(save_directory, exist_ok=True)
        config_dict = self.config.to_dict()
        config_dict["_class_name"] = self._class_name
        config_dict["_framework"] = "open_muse_tpu"
        with open(os.path.join(save_directory, CONFIG_NAME), "w", encoding="utf-8") as f:
            json.dump(config_dict, f, indent=2, sort_keys=True)


def register_to_config(init):
    """Compatibility shim for reference-style ``@register_to_config``
    (muse/modeling_utils.py:1128).  Our configs are dataclasses, so this is a
    no-op marker kept so downstream code written against the reference API
    imports cleanly."""
    return init
