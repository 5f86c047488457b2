"""Model runtime: `transformers`-style save/load for flax.linen models.

Reference parity: muse/modeling_utils.py:228-770 (ModelMixin.from_pretrained /
save_pretrained / _load_pretrained_model).  TPU-native redesign:

  * the compute graph is a pure ``flax.linen`` module; weights live in an
    explicit params pytree (no module state), so everything jits/shards.
  * ``jax.eval_shape`` replaces accelerate's meta-device ``init_empty_weights``
    (reference modeling_utils.py:521-559): we never materialize random weights
    when loading a checkpoint.
  * reference PyTorch checkpoints (``pytorch_model.bin`` /
    ``model.safetensors``) are converted on load (core/convert.py); native
    checkpoints are safetensors of the flax tree (``flax_model.safetensors``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configuration import ConfigMixin, load_config_dict
from .convert import (
    convert_torch_state_dict,
    flatten_dict,
    load_torch_state_dict,
    unflatten_dict,
)

__all__ = ["ModelMixin", "resolve_pretrained_path"]

FLAX_WEIGHTS_NAME = "flax_model.safetensors"


def resolve_pretrained_path(name_or_path: str) -> str:
    """Local dir -> itself; otherwise treat as a hub repo id (the reference
    downloads from the HF hub inside from_pretrained, modeling_utils.py:141-
    226: checkpoints like openMUSE/muse-512 / williamberman/*) and fetch a
    snapshot via huggingface_hub.  Offline environments get a clear error
    instead of a stack of connection retries."""
    if os.path.isdir(name_or_path):
        return name_or_path
    # Only strict "org/name" ids route to the hub — a typo'd local path like
    # "ckpts/run1" (trailing sep, dots, or a parent dir that exists locally)
    # should fail fast instead of attempting a slow network download.
    parts = name_or_path.split("/")
    looks_like_repo = (
        len(parts) <= 2
        and all(parts)
        and not name_or_path.startswith((".", "/", "~"))
        and not name_or_path.endswith("/")
        and not (len(parts) == 2 and os.path.isdir(parts[0]))
    )
    if not looks_like_repo:
        raise EnvironmentError(f"{name_or_path} is not a local directory")
    try:
        from huggingface_hub import snapshot_download

        return snapshot_download(repo_id=name_or_path)
    except Exception as e:  # network-gated: offline -> actionable message
        raise EnvironmentError(
            f"{name_or_path!r} is not a local directory and downloading it "
            f"from the HF hub failed ({type(e).__name__}: {e}). Stage the "
            f"checkpoint locally (scripts/stage_reference_checkpoint.py "
            f"documents the expected layout) or retry with network access."
        ) from e
TORCH_WEIGHTS_NAMES = ("model.safetensors", "pytorch_model.bin", "diffusion_pytorch_model.bin")


class ModelMixin(ConfigMixin):
    """Base wrapper: config dataclass + linen module + params pytree.

    Subclasses must set ``config_class``, ``_class_name`` and implement:
      * ``build_module(self) -> nn.Module``
      * ``example_inputs(self) -> tuple`` (args for ``module.init`` /
        ``module.__call__`` with batch 1, used only for shape inference)

    Optionally: ``_transposed_conv_patterns`` (see core/convert.py).
    """

    _transposed_conv_patterns = ()

    def __init__(self, config=None, params=None, seed: int = 0, dtype=jnp.float32,
                 _defer_init: bool = False, **kwargs):
        if config is None:
            config, unused = self.config_class.from_dict(kwargs)
        elif isinstance(config, dict):
            config, unused = self.config_class.from_dict({**config, **kwargs})
        self.config = config
        self.dtype = dtype
        self.module = self.build_module()
        self._jit_cache: Dict[str, Any] = {}
        if params is not None:
            self.params = params
        elif not _defer_init:
            self.params = self.init_params(jax.random.PRNGKey(seed))
        else:
            self.params = None

    # -- construction ------------------------------------------------------

    def build_module(self):
        raise NotImplementedError

    def example_inputs(self):
        raise NotImplementedError

    def init_params(self, rng) -> Dict[str, Any]:
        variables = self.module.init(rng, *self.example_inputs())
        return variables["params"]

    def params_shapes(self) -> Dict[str, Any]:
        """Abstract param tree (ShapeDtypeStructs) without allocating memory."""
        variables = jax.eval_shape(
            lambda: self.module.init(jax.random.PRNGKey(0), *self.example_inputs())
        )
        return variables["params"]

    # -- functional apply ---------------------------------------------------

    def apply(self, *args, method: Optional[str] = None, params=None, **kwargs):
        params = self.params if params is None else params
        method_fn = getattr(self.module, method) if method else None
        return self.module.apply({"params": params}, *args, method=method_fn, **kwargs)

    def jit_apply(self, method: str, *args, **static_kwargs):
        """Apply a module method under jit.

        Positional args are traced arrays; keyword args are treated as static
        (they select the compiled program, e.g. ``return_loss``).  Compiled
        functions are cached per (method, static kwargs).
        """
        cache_key = (method, tuple(sorted(static_kwargs.items())))
        if cache_key not in self._jit_cache:
            method_fn = getattr(self.module, method) if method else None

            @jax.jit
            def fn(params, *a):
                return self.module.apply({"params": params}, *a, method=method_fn,
                                         **static_kwargs)

            self._jit_cache[cache_key] = fn
        return self._jit_cache[cache_key](self.params, *args)

    # -- reference API-compat toggles ----------------------------------------

    def enable_gradient_checkpointing(self):
        """Rebuild the module with rematerialization on (reference
        modeling_utils.py:255-268).  Only meaningful for modules exposing a
        ``remat`` knob; a no-op otherwise."""
        if hasattr(self, "_remat"):
            self._remat = True
            self.module = self.build_module()
            self._jit_cache.clear()
        return self

    def disable_gradient_checkpointing(self):
        if hasattr(self, "_remat"):
            self._remat = False
            self.module = self.build_module()
            self._jit_cache.clear()
        return self

    def set_use_memory_efficient_attention_xformers(self, valid: bool,
                                                    attention_op=None):
        """Reference toggle (modeling_utils.py:276-329) — a deliberate no-op
        here.  On TPU the default XLA attention IS the memory-efficient
        implementation at this model family's sequence lengths (<=1024+77);
        benchmarked round 1, the Pallas flash-attention kernel matched it
        without winning, has no VJP, and stays an inference-only opt-in via
        MUSE_TPU_PALLAS_ATTN=1 (ops/pallas/flash_attention.py) rather than a
        training-path switch."""
        from ..utils.logging import get_logger

        get_logger(__name__).info(
            "set_use_memory_efficient_attention_xformers is a no-op on TPU: "
            "XLA attention is already memory-efficient at these shapes")
        return self

    # -- parameters ---------------------------------------------------------

    def num_parameters(self) -> int:
        return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(self.params))

    def astype(self, dtype):
        """Cast floating-point params (bf16 inference on TPU replaces the
        reference's fp16 autocast, pipeline_muse.py:211)."""
        self.params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            self.params,
        )
        self._jit_cache.clear()
        return self

    # -- serialization ------------------------------------------------------

    def save_pretrained(self, save_directory: str):
        os.makedirs(save_directory, exist_ok=True)
        self.save_config(save_directory)
        from safetensors.numpy import save_file

        flat = flatten_dict(self.params)
        # np.asarray on a device array can yield a non-contiguous view
        # (tiled layouts); safetensors requires contiguous buffers.
        flat = {k: np.ascontiguousarray(np.asarray(v)) for k, v in flat.items()}
        save_file(flat, os.path.join(save_directory, FLAX_WEIGHTS_NAME))

    @classmethod
    def from_pretrained(cls, pretrained_model_name_or_path: str, subfolder: str = None,
                        dtype=jnp.float32, **config_overrides):
        path = resolve_pretrained_path(pretrained_model_name_or_path)
        if subfolder is not None:
            path = os.path.join(path, subfolder)
        config_dict = load_config_dict(path)
        class_name = config_dict.get("_class_name")
        accepted = (cls._class_name,) + tuple(cls._class_name_aliases)
        if class_name is not None and class_name not in accepted:
            import warnings

            warnings.warn(
                f"checkpoint _class_name={class_name!r} does not match {cls.__name__}"
            )
        config_dict = {k: v for k, v in config_dict.items() if not k.startswith("_")}
        config_dict.update(config_overrides)
        config, _ = cls.config_class.from_dict(config_dict)
        model = cls(config=config, _defer_init=True, dtype=dtype)

        flax_file = os.path.join(path, FLAX_WEIGHTS_NAME)
        if os.path.isfile(flax_file):
            from safetensors.numpy import load_file

            flat = load_file(flax_file)
            model.params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype=dtype) if np.issubdtype(x.dtype, np.floating) else jnp.asarray(x),
                unflatten_dict(flat),
            )
            return model

        for name in TORCH_WEIGHTS_NAMES:
            torch_file = os.path.join(path, name)
            if os.path.isfile(torch_file):
                state_dict = load_torch_state_dict(torch_file)
                model.load_torch_weights(state_dict, dtype=dtype)
                return model

        raise EnvironmentError(f"no model weights found in {path}")

    def load_torch_weights(self, state_dict: Dict[str, np.ndarray], dtype=jnp.float32,
                           strict: bool = True):
        """Convert + load a reference torch state_dict (shape-driven)."""
        shapes = self.params_shapes()
        params, missing, unexpected = convert_torch_state_dict(
            state_dict,
            shapes,
            transposed_conv_patterns=self._transposed_conv_patterns,
            dtype=dtype,
            key_map=getattr(self, "_torch_key_map", None),
        )
        if strict and (missing or unexpected):
            raise ValueError(
                f"torch->flax conversion mismatch for {type(self).__name__}: "
                f"missing={missing[:8]}{'...' if len(missing) > 8 else ''} "
                f"unexpected={unexpected[:8]}{'...' if len(unexpected) > 8 else ''}"
            )
        self.params = params
        self._jit_cache.clear()
        return missing, unexpected
