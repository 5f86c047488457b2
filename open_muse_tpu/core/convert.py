"""PyTorch checkpoint -> JAX pytree weight conversion.

The reference stores weights as a flat torch ``state_dict`` in
``pytorch_model.bin`` / ``model.safetensors`` (muse/modeling_utils.py:91-139,
384-620).  We convert those tensors into the flax param tree of our linen
modules.  The conversion is *shape-driven*: the target tree (obtained via
``jax.eval_shape`` on ``module.init``) tells us each leaf's expected shape and
flax leaf name (kernel/scale/embedding/bias/...), from which the required
transpose is derived:

  torch Linear   weight (O, I)        -> kernel (I, O)
  torch Conv2d   weight (O, I, kh,kw) -> kernel (kh, kw, I, O)      [NHWC]
  torch ConvT2d  weight (I, O, kh,kw) -> kernel (kh, kw, I, O)
  torch *Norm    weight               -> scale  (unchanged)
  torch Embedding weight              -> embedding (unchanged)

Module-path mapping is mechanical because our linen modules use the same
attribute names as the reference torch modules, with torch ModuleList /
Sequential numeric indices flattened as ``name.0`` -> ``name_0``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

__all__ = [
    "torch_key_to_flax_path",
    "convert_torch_state_dict",
    "flatten_dict",
    "unflatten_dict",
    "load_torch_state_dict",
]

_INDEX_RE = re.compile(r"\.(\d+)(?=\.|$)")

# torch leaf name -> candidate flax leaf names, in priority order
_LEAF_CANDIDATES = {
    "weight": ("kernel", "scale", "embedding", "weight"),
    "bias": ("bias",),
    "gamma": ("gamma",),
    "beta": ("beta",),
    "gammas": ("gammas",),
}


def torch_key_to_flax_path(key: str) -> List[str]:
    """'down.0.block.1.norm1.weight' -> ['down_0','block_1','norm1','weight']"""
    key = _INDEX_RE.sub(lambda m: "_" + m.group(1), key)
    return key.split(".")


def flatten_dict(tree: Dict[str, Any], sep: str = ".") -> Dict[str, Any]:
    out = {}

    def _walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                _walk(v, prefix + (str(k),))
        else:
            out[sep.join(prefix)] = node

    _walk(tree, ())
    return out


def unflatten_dict(flat: Dict[str, Any], sep: str = ".") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(sep)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def _is_transposed_conv(flax_key: str, transposed_conv_patterns) -> bool:
    return any(re.search(p, flax_key) for p in transposed_conv_patterns)


def _convert_leaf(value: np.ndarray, flax_leaf: str, expected_shape, flax_key: str,
                  transposed_conv_patterns) -> np.ndarray:
    expected_shape = tuple(expected_shape)
    if flax_leaf == "kernel":
        if value.ndim == 2:
            value = value.T
        elif value.ndim == 4:
            conv = value.transpose(2, 3, 1, 0)     # (O,I,kh,kw) -> (kh,kw,I,O)
            convt = value.transpose(2, 3, 0, 1)    # (I,O,kh,kw) -> (kh,kw,I,O)
            if conv.shape == expected_shape and convt.shape == expected_shape:
                value = convt if _is_transposed_conv(flax_key, transposed_conv_patterns) else conv
            elif convt.shape == expected_shape:
                value = convt
            else:
                value = conv
    if value.shape != expected_shape:
        raise ValueError(
            f"shape mismatch for {flax_key}: torch {value.shape} vs flax {expected_shape}"
        )
    return value


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    flax_shapes: Dict[str, Any],
    transposed_conv_patterns=(),
    dtype=jnp.float32,
    key_map=None,
):
    """Convert a flat torch state_dict into a flax params tree.

    Args:
      state_dict: flat dict of numpy arrays keyed by torch names.
      flax_shapes: the target params tree of ShapeDtypeStructs (or arrays),
        nested dict as produced by ``jax.eval_shape(module.init, ...)``.
      transposed_conv_patterns: regexes over *flax* flat keys naming kernels
        that belong to transposed convolutions (needed only when in/out
        channels are equal and the transpose is ambiguous).
      key_map: optional callable torch_key -> torch_key applied first (for
        model-specific renames).

    Returns:
      (params_tree, missing_keys, unexpected_keys)
    """
    flat_target = flatten_dict(flax_shapes)
    params_flat: Dict[str, Any] = {}
    unexpected = []
    for torch_key, value in state_dict.items():
        if key_map is not None:
            mapped = key_map(torch_key)
            if mapped is None:
                continue
            torch_key = mapped
        path = torch_key_to_flax_path(torch_key)
        base, leaf = path[:-1], path[-1]
        candidates = _LEAF_CANDIDATES.get(leaf, (leaf,))
        flax_key = None
        for cand in candidates:
            k = ".".join(base + [cand])
            if k in flat_target:
                flax_key = k
                flax_leaf = cand
                break
        if flax_key is None:
            unexpected.append(torch_key)
            continue
        value = np.asarray(value)
        value = _convert_leaf(value, flax_leaf, flat_target[flax_key].shape, flax_key,
                              transposed_conv_patterns)
        params_flat[flax_key] = jnp.asarray(value, dtype=dtype)
    missing = [k for k in flat_target if k not in params_flat]
    return unflatten_dict(params_flat), missing, unexpected


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .bin (pickle) or .safetensors file into numpy arrays
    without requiring a GPU torch build (reference: modeling_utils.py:91-108)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in state.items() if hasattr(v, "numpy")}
