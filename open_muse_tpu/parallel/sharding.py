"""Parameter partition rules: param-path regex -> PartitionSpec.

GSPMD style: we annotate shardings on the params pytree and let XLA insert
the collectives (all-gather for fsdp params, reduce-scatter for grads,
all-reduce across tp) — no hand-written NCCL calls (the reference's comms are
all hidden inside accelerate/DDP, SURVEY.md §5.8).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DEFAULT_RULES", "spec_for_path", "make_param_shardings", "shard_params"]

# (path regex, PartitionSpec) — first match wins. Paths are '.'-joined flax
# param paths, e.g. "transformer_layers_3.attention.query.kernel".
#
# TP splits attention heads / MLP columns; FSDP shards the complementary dim.
DEFAULT_RULES: List[Tuple[str, P]] = [
    # attention projections: (in, out)
    (r"\b(attention|crossattention)\.(query|key|value)\.kernel$", P("fsdp", "tp")),
    (r"\b(attention|crossattention)\.out\.kernel$", P("tp", "fsdp")),
    (r"\bself_attn\.(q_proj|k_proj|v_proj)\.kernel$", P("fsdp", "tp")),
    (r"\bself_attn\.out_proj\.kernel$", P("tp", "fsdp")),
    # GLU / MLP
    (r"\bffn\.(wi_0|wi_1)\.kernel$", P("fsdp", "tp")),
    (r"\bffn\.wo\.kernel$", P("tp", "fsdp")),
    (r"\b(fc1)\.kernel$", P("fsdp", "tp")),
    (r"\b(fc2)\.kernel$", P("tp", "fsdp")),
    # big embeddings / output head: shard vocab over fsdp
    (r"\bembeddings?\.embedding$", P("fsdp", None)),
    (r"\bword_embeddings\.embedding$", P("fsdp", None)),
    (r"\bmlm_layer\.conv2\.kernel$", P(None, None, "fsdp", "tp")),
    # AdaLN mappers and other 2D kernels: fsdp on the input dim
    (r"\bmapper\.kernel$", P("fsdp", None)),
    (r"\b(project_to_hidden|project_from_hidden|encoder_proj|cond_embed_\d)\.kernel$",
     P("fsdp", None)),
    # norms / biases / small tensors: replicate
    (r".*", P()),
]


def spec_for_path(path: str, rules=None) -> P:
    rules = DEFAULT_RULES if rules is None else rules
    for pattern, spec in rules:
        if re.search(pattern, path):
            return spec
    return P()


def _fits(shape, spec, mesh: Mesh) -> bool:
    """A spec only applies if every named axis divides the param dim."""
    for dim, axis in zip(shape, tuple(spec)):
        if axis is None:
            continue
        axes = axis if isinstance(axis, tuple) else (axis,)
        size = 1
        for a in axes:
            size *= mesh.shape[a]
        if dim % size != 0:
            return False
    return len(tuple(spec)) <= len(shape)


def make_param_shardings(mesh: Mesh, params, rules=None):
    """NamedSharding pytree matching ``params`` (shapes or arrays)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return ".".join(str(getattr(k, "key", k)) for k in kp)

    specs = {}
    for kp, leaf in flat:
        p = path_str(kp)
        spec = spec_for_path(p, rules)
        if not _fits(leaf.shape, spec, mesh):
            spec = P()
        specs[p] = NamedSharding(mesh, spec)

    def to_sharding(kp, leaf):
        return specs[path_str(kp)]

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh, rules=None):
    """Place params on the mesh according to the rules."""
    shardings = make_param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
