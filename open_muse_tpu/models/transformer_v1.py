"""MaskGitTransformer (v1): BERT-style masked-token transformer, TPU-native.

Reference parity: muse/modeling_transformer.py:1083-1456 (class), 907-985
(Embed/MlmLayer), 988-1080 (ConvEmbed/ConvMlmLayer with pixel shuffle), 749-904
(FeedForward/TransformerLayer with Normformer options).

TPU-native redesign highlights:
  * ``generate``/``generate2`` compile into single XLA programs: per-step mask
    ratios/temperatures are static (timesteps is static), so the MaskGIT
    parallel-decode loop is a ``lax.fori_loop`` over stacked schedule arrays —
    no host round-trips between steps (reference loops in Python,
    modeling_transformer.py:1404-1454).
  * top-k filtering is shape-static (threshold against the k-th value) and
    categorical sampling uses ``jax.random`` key threading instead of stateful
    torch generators.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.configuration import BaseConfig
from ..core.modeling import ModelMixin
from ..ops import sampling
from ..ops.layers import Attention, LayerNorm, Norm
from ..ops.losses import cross_entropy_loss

__all__ = ["MaskGitTransformer", "MaskGitTransformerConfig"]


@dataclasses.dataclass(frozen=True)
class MaskGitTransformerConfig(BaseConfig):
    # full config surface: modeling_transformer.py:1086-1116
    vocab_size: int = 2025  # codebook + classes + mask
    hidden_size: int = 768
    embedding_size: Optional[int] = None
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    max_position_embeddings: int = 256
    add_cross_attention: bool = False
    encoder_hidden_size: int = 1024
    project_encoder_hidden_states: bool = False
    initializer_range: float = 0.02
    norm_type: str = "layernorm"
    layer_norm_eps: float = 1e-5
    use_normformer: bool = True
    use_encoder_layernorm: bool = True
    use_mlm_layer: bool = True
    use_mlm_layernorm: bool = True
    use_bias: bool = False
    codebook_size: int = 1024
    num_vq_tokens: int = 256
    num_classes: Optional[int] = None
    use_codebook_size_for_output: bool = False
    use_conv_in_out: bool = False
    patch_size: int = 1

    @property
    def mask_token_id(self) -> int:
        return self.vocab_size - 1

    @property
    def output_size(self) -> int:
        return self.codebook_size if self.use_codebook_size_for_output else self.vocab_size


class Embed(nn.Module):
    """word + learned position embeddings (modeling_transformer.py:907-957)."""

    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.config
        emb_size = cfg.embedding_size or cfg.hidden_size
        words = nn.Embed(cfg.vocab_size, emb_size, name="word_embeddings",
                         dtype=self.dtype)(input_ids)
        positions = nn.Embed(cfg.max_position_embeddings, emb_size,
                             name="position_embeddings", dtype=self.dtype)(
            jnp.arange(input_ids.shape[-1])[None, :])
        x = words + positions
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x


class ConvEmbed(nn.Module):
    """token embed -> LN -> pixel-unshuffle(patch) -> 1x1 conv -> +pos embed
    (modeling_transformer.py:988-1040)."""

    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic: bool = True):
        cfg = self.config
        emb_size = cfg.embedding_size or cfg.hidden_size
        batch, seq_len = input_ids.shape
        side = int(seq_len ** 0.5)
        ids = input_ids.reshape(batch, side, side)
        x = nn.Embed(cfg.vocab_size, emb_size, name="embeddings", dtype=self.dtype)(ids)
        x = Norm(emb_size, cfg.norm_type, eps=cfg.layer_norm_eps,
                 use_bias=cfg.use_bias, name="layer_norm", dtype=self.dtype)(x)
        p = cfg.patch_size
        if p > 1:
            b, h, w, c = x.shape
            # NHWC pixel-unshuffle with torch channel order (C, u, v)
            x = x.reshape(b, h // p, p, w // p, p, c)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // p, w // p, c * p * p)
        x = nn.Conv(cfg.hidden_size, (1, 1), use_bias=cfg.use_bias, name="conv",
                    dtype=self.dtype)(x)
        b, h, w, _ = x.shape
        x = x.reshape(batch, h * w, cfg.hidden_size)
        # reference quirk: the v1 constructor never forwards
        # max_position_embeddings to ConvEmbed, so its position table is
        # always the class default 256 (modeling_transformer.py:995,1133-1141)
        positions = nn.Embed(256, cfg.hidden_size,
                             name="position_embeddings", dtype=self.dtype)(
            jnp.arange(x.shape[1])[None, :])
        return x + positions


class MlmLayer(nn.Module):
    """dense -> gelu -> ln -> logits (modeling_transformer.py:960-985)."""

    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias, name="mlm_dense",
                     dtype=self.dtype)(x)
        x = jax.nn.gelu(x, approximate=False)
        if cfg.use_mlm_layernorm:
            x = Norm(cfg.hidden_size, cfg.norm_type, eps=cfg.layer_norm_eps,
                     use_bias=cfg.use_bias, name="mlm_ln", dtype=self.dtype)(x)
        return nn.Dense(cfg.output_size, use_bias=cfg.use_bias, name="to_logits",
                        dtype=self.dtype)(x)


class ConvMlmLayer(nn.Module):
    """1x1 conv -> pixel-shuffle -> LN -> 1x1 conv logits
    (modeling_transformer.py:1043-1080)."""

    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        emb_size = cfg.embedding_size or cfg.hidden_size
        batch, seq_len, hidden = x.shape
        side = int(seq_len ** 0.5)
        p = cfg.patch_size
        x = x.reshape(batch, side, side, hidden)
        x = nn.Conv(emb_size * p * p, (1, 1), use_bias=cfg.use_bias, name="conv1",
                    dtype=self.dtype)(x)
        if p > 1:
            b, h, w, _ = x.shape
            x = x.reshape(b, h, w, emb_size, p, p)
            x = x.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * p, w * p, emb_size)
        # torch wraps this norm in Norm2D (child named 'norm',
        # modeling_transformer.py:1061-1067)
        from .uvit_blocks import Norm2D

        x = Norm2D(emb_size, cfg.norm_type, eps=cfg.layer_norm_eps,
                   use_bias=cfg.use_bias, name="layer_norm", dtype=self.dtype)(x)
        logits = nn.Conv(cfg.output_size, (1, 1), use_bias=cfg.use_bias, name="conv2",
                         dtype=self.dtype)(x)
        return logits.reshape(batch, -1, cfg.output_size)


class FeedForward(nn.Module):
    """Normformer-style GLU FFN (modeling_transformer.py:749-799).

    Reference quirk: the pre-MLP norm is always a LayerNorm regardless of
    norm_type (modeling_transformer.py:767)."""

    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        x = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps, use_bias=cfg.use_bias,
                      name="pre_mlp_layer_norm", dtype=self.dtype)(x)
        gelu = jax.nn.gelu(nn.Dense(cfg.intermediate_size, use_bias=cfg.use_bias,
                                    name="wi_0", dtype=self.dtype)(x), approximate=False)
        linear = nn.Dense(cfg.intermediate_size, use_bias=cfg.use_bias, name="wi_1",
                          dtype=self.dtype)(x)
        x = gelu * linear
        if cfg.use_normformer:
            x = Norm(cfg.intermediate_size, cfg.norm_type, eps=cfg.layer_norm_eps,
                     use_bias=cfg.use_bias, name="mid_mlp_layer_norm", dtype=self.dtype)(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias, name="wo",
                        dtype=self.dtype)(x)


class TransformerLayer(nn.Module):
    """PreLN layer with optional Normformer post-norms + optional cross-attn
    (modeling_transformer.py:803-904)."""

    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states=None, encoder_attention_mask=None,
                 deterministic: bool = True, ctx=None, precompute: bool = False):
        cfg = self.config
        norm = lambda name: Norm(cfg.hidden_size, cfg.norm_type, eps=cfg.layer_norm_eps,
                                 use_bias=cfg.use_bias, name=name, dtype=self.dtype)
        if precompute:
            # decode-loop hoisting: the cross-attn [k|v] projection depends
            # only on the (step-constant) text context — see transformer_v2
            if encoder_hidden_states is None:
                return {}
            return {"cross_kv": Attention(
                cfg.hidden_size, cfg.num_attention_heads, use_bias=cfg.use_bias,
                name="crossattention", dtype=self.dtype)(
                encoder_hidden_states, encoder_hidden_states,
                precompute_kv=True)}
        ctx = ctx or {}
        residual = x
        h = norm("attn_layer_norm")(x)
        h = Attention(cfg.hidden_size, cfg.num_attention_heads, use_bias=cfg.use_bias,
                      name="attention", dtype=self.dtype)(h)
        if cfg.use_normformer:
            h = norm("post_attn_layer_norm")(h)
        x = residual + h

        if encoder_hidden_states is not None:
            residual = x
            h = norm("crossattn_layer_norm")(x)
            mask = None
            if encoder_attention_mask is not None:
                # [B, 1, Q, K] boolean mask: True = masked out
                # (reference make_attention_mask, modeling_transformer.py:60-72)
                mask = (encoder_attention_mask[:, None, None, :] == 0)
            h = Attention(cfg.hidden_size, cfg.num_attention_heads, use_bias=cfg.use_bias,
                          name="crossattention", dtype=self.dtype)(
                h, encoder_hidden_states, attention_mask=mask,
                cached_kv=ctx.get("cross_kv"))
            if cfg.use_normformer:
                h = norm("post_crossattn_layer_norm")(h)
            x = residual + h

        residual = x
        h = FeedForward(cfg, name="ffn", dtype=self.dtype)(x, deterministic=deterministic)
        return residual + h


class MaskGitTransformerModule(nn.Module):
    config: MaskGitTransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, encoder_hidden_states=None,
                 encoder_attention_mask=None, labels=None, label_smoothing: float = 0.0,
                 cond_dropout_mask=None, deterministic: bool = True,
                 step_ctx=None, return_step_ctx: bool = False):
        cfg = self.config
        if step_ctx is None:
            if encoder_hidden_states is not None and cfg.project_encoder_hidden_states:
                encoder_hidden_states = nn.Dense(cfg.hidden_size, use_bias=cfg.use_bias,
                                                 name="encoder_proj", dtype=self.dtype)(
                    encoder_hidden_states)
                encoder_hidden_states = Norm(cfg.hidden_size, cfg.norm_type,
                                             eps=cfg.layer_norm_eps, use_bias=cfg.use_bias,
                                             name="encoder_proj_layer_norm",
                                             dtype=self.dtype)(encoder_hidden_states)

            # classifier-free-guidance conditioning dropout: caller supplies
            # the (batch, 1, 1) keep-mask (reference samples it inside
            # forward, modeling_transformer.py:1244-1247; RNG kept explicit)
            if encoder_hidden_states is not None and cond_dropout_mask is not None:
                encoder_hidden_states = encoder_hidden_states * cond_dropout_mask
        else:
            encoder_hidden_states = step_ctx["ehs"]

        if return_step_ctx:
            # decode-loop hoisting (see transformer_v2): text projections and
            # per-layer cross-attn kv are constant across MaskGIT steps
            return {
                "ehs": encoder_hidden_states,
                "layers": [TransformerLayer(cfg, name=f"transformer_layers_{i}",
                                            dtype=self.dtype)(
                    None, encoder_hidden_states, precompute=True)
                    for i in range(cfg.num_hidden_layers)],
            }

        if cfg.use_conv_in_out:
            x = ConvEmbed(cfg, name="embed", dtype=self.dtype)(input_ids,
                                                               deterministic=deterministic)
        else:
            x = Embed(cfg, name="embed", dtype=self.dtype)(input_ids,
                                                           deterministic=deterministic)

        for i in range(cfg.num_hidden_layers):
            x = TransformerLayer(cfg, name=f"transformer_layers_{i}", dtype=self.dtype)(
                x, encoder_hidden_states, encoder_attention_mask,
                deterministic=deterministic,
                ctx=None if step_ctx is None else step_ctx["layers"][i])

        if cfg.use_encoder_layernorm:
            x = Norm(cfg.hidden_size, cfg.norm_type, eps=cfg.layer_norm_eps,
                     use_bias=cfg.use_bias, name="encoder_layer_norm",
                     dtype=self.dtype)(x)

        if cfg.use_mlm_layer:
            if cfg.use_conv_in_out:
                logits = ConvMlmLayer(cfg, name="mlm_layer", dtype=self.dtype)(x)
            else:
                logits = MlmLayer(cfg, name="mlm_layer", dtype=self.dtype)(x)
        else:
            logits = nn.Dense(cfg.output_size, use_bias=cfg.use_bias, name="to_logits",
                              dtype=self.dtype)(x)

        if labels is not None:
            loss = cross_entropy_loss(logits, labels, label_smoothing=label_smoothing)
            return logits, loss
        return logits


class MaskGitTransformer(ModelMixin):
    config_class = MaskGitTransformerConfig
    _class_name = "MaskGitTransformer"

    def build_module(self):
        return MaskGitTransformerModule(self.config, dtype=self.dtype)

    def example_inputs(self):
        n = self.config.num_vq_tokens
        if self.config.num_classes is not None:
            n += 1
        args = (jnp.zeros((1, n), dtype=jnp.int32),)
        if self.config.add_cross_attention:
            args += (jnp.zeros((1, 8, self.config.encoder_hidden_size), dtype=self.dtype),)
        return args

    def __call__(self, input_ids, encoder_hidden_states=None, labels=None,
                 encoder_attention_mask=None, **kwargs):
        # None args are empty pytrees: they select the compiled program without
        # being traced, so one cached jit covers each calling pattern.
        return self.jit_apply("__call__", input_ids, encoder_hidden_states,
                              encoder_attention_mask, labels)

    # -- parallel decoding ---------------------------------------------------

    def generate2(self, input_ids=None, class_ids=None, encoder_hidden_states=None,
                  negative_embeds=None, temperature: float = 1.0, timesteps: int = 18,
                  guidance_scale: float = 0.0, noise_schedule=sampling.cosine_schedule,
                  key=None, **unused_kwargs):
        """Original-MaskGIT parallel decode (reference
        modeling_transformer.py:1363-1456), compiled as ONE XLA program."""
        cfg = self.config
        if key is None:
            key = jax.random.PRNGKey(0)
        seq_len = cfg.num_vq_tokens
        if class_ids is not None:
            batch_size = class_ids.shape[0]
            class_ids = class_ids + cfg.codebook_size  # shift by codebook size
        elif encoder_hidden_states is not None:
            batch_size = encoder_hidden_states.shape[0]
        elif input_ids is not None:
            batch_size = input_ids.shape[0]
        else:
            raise ValueError("provide class_ids, encoder_hidden_states or input_ids")
        if input_ids is None:
            input_ids = jnp.full((batch_size, seq_len), cfg.mask_token_id, dtype=jnp.int32)

        use_cfg = encoder_hidden_states is not None and guidance_scale > 0
        if use_cfg:
            uncond = jnp.zeros_like(encoder_hidden_states) if negative_embeds is None \
                else negative_embeds
            condition = jnp.concatenate([encoder_hidden_states, uncond], axis=0)
        else:
            condition = encoder_hidden_states

        # static per-step schedules -> stacked arrays indexed inside the loop
        ratios = (jnp.arange(timesteps, dtype=jnp.float32) + 1) / timesteps
        mask_ratios = noise_schedule(ratios)
        if isinstance(temperature, (tuple, list)):
            # (start, end) pairs anneal linearly (v2-style convenience)
            temperatures = jnp.linspace(temperature[0], temperature[1], timesteps)
        else:
            # the reference REBINDS temperature *= (1 - ratio) inside the
            # loop (modeling_transformer.py:1451), so the anneal compounds
            # multiplicatively across steps
            temperatures = temperature * jnp.cumprod(1.0 - ratios)

        cache_key = ("generate2", timesteps, float(guidance_scale),
                     class_ids is not None, use_cfg, condition is not None,
                     noise_schedule.__name__ if hasattr(noise_schedule, "__name__") else id(noise_schedule))
        if cache_key not in self._jit_cache:
            apply_fn = self.module.apply

            def step_fn(step, carry, params, class_ids, condition, ctx):
                ids, key = carry
                model_ids = ids
                if class_ids is not None:
                    model_ids = jnp.concatenate([class_ids[:, None], ids], axis=1)
                if use_cfg:
                    model_input = jnp.concatenate([model_ids, model_ids], axis=0)
                    logits_all = apply_fn({"params": params}, model_input, condition,
                                          step_ctx=ctx)
                    cond_logits, uncond_logits = jnp.split(logits_all, 2, axis=0)
                    logits = uncond_logits[..., : cfg.codebook_size] + guidance_scale * (
                        cond_logits[..., : cfg.codebook_size]
                        - uncond_logits[..., : cfg.codebook_size])
                elif condition is not None:
                    logits = apply_fn({"params": params}, model_ids, condition,
                                      step_ctx=ctx)
                    logits = logits[..., : cfg.codebook_size]
                else:
                    logits = apply_fn({"params": params}, model_ids)
                    logits = logits[..., : cfg.codebook_size]
                if class_ids is not None:
                    logits = logits[:, 1:]

                key, sample_key, mask_key = jax.random.split(key, 3)
                logits32 = logits.astype(jnp.float32)
                from .transformer_v2 import _pallas_interpret, _use_pallas_sample

                if _use_pallas_sample():
                    # fused streaming sample+confidence kernel (see
                    # parallel_decode_loop in transformer_v2.py); handles any
                    # vocab via ceil-div v-blocks + in-kernel masking
                    from ..ops.pallas.fused_sample import fused_categorical

                    seed = jax.random.randint(sample_key, (), 0, 2 ** 31 - 1,
                                              jnp.int32)
                    sampled_ids, selected_probs = fused_categorical(
                        seed, logits32, interpret=_pallas_interpret())
                    unknown_map = ids == cfg.mask_token_id
                    sampled_ids = jnp.where(unknown_map, sampled_ids, ids)
                else:
                    sampled_ids = jax.random.categorical(sample_key, logits32,
                                                         axis=-1)
                    unknown_map = ids == cfg.mask_token_id
                    sampled_ids = jnp.where(unknown_map, sampled_ids, ids)
                    # softmax-then-gather without the full (B, S, V) probs
                    # tensor (same HBM-saving identity as v2's
                    # parallel_decode_loop); merged-id gather is fine — known
                    # positions are overwritten just below
                    sel_logit = jnp.take_along_axis(
                        logits32, sampled_ids[..., None], axis=-1)[..., 0]
                    selected_probs = jnp.exp(
                        sel_logit - jax.nn.logsumexp(logits32, axis=-1))
                selected_probs = jnp.where(unknown_map, selected_probs,
                                           jnp.finfo(jnp.float32).max)
                mask_len = jnp.floor(seq_len * mask_ratios[step])
                mask_len = jnp.maximum(
                    1.0,
                    jnp.minimum(jnp.sum(unknown_map, axis=-1, keepdims=True) - 1.0,
                                mask_len))
                masking = sampling.mask_by_random_topk(mask_key, mask_len,
                                                       selected_probs,
                                                       temperatures[step])
                new_ids = jnp.where(masking, cfg.mask_token_id, sampled_ids)
                return new_ids, key, sampled_ids

            @jax.jit
            def run(params, input_ids, class_ids, condition, key):
                # hoist text projections + cross-attn kv out of the loop
                # (constant across decode steps; see transformer_v2)
                ctx = None
                if condition is not None and \
                        os.environ.get("MUSE_TPU_DECODE_CTX", "1") == "1":
                    ctx = apply_fn({"params": params}, input_ids, condition,
                                   return_step_ctx=True)

                def body(step, carry):
                    ids, key, _ = carry
                    return step_fn(step, (ids, key), params, class_ids,
                                   condition, ctx)

                init = (input_ids.astype(jnp.int32), key,
                        jnp.zeros_like(input_ids, dtype=jnp.int32))
                _, _, sampled = jax.lax.fori_loop(0, timesteps, body, init)
                return sampled

            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](self.params, input_ids, class_ids, condition, key)

    def generate(self, input_ids=None, class_ids=None, encoder_hidden_states=None,
                 temperature: float = 1.0, topk_filter_thres: float = 0.9,
                 timesteps: int = 18, guidance_scale: float = 3.0,
                 noise_schedule=sampling.cosine_schedule, key=None, **unused_kwargs):
        """lucidrains-style decode: per-step top-k filter + gumbel sample +
        score-based remasking with annealed temperature (reference
        modeling_transformer.py:1283-1361).  The per-step masked count is
        static, so the loop unrolls into one XLA program with static top-k."""
        cfg = self.config
        if key is None:
            key = jax.random.PRNGKey(0)
        seq_len = cfg.num_vq_tokens
        if class_ids is not None:
            batch_size = class_ids.shape[0]
            class_ids = class_ids + cfg.codebook_size
        else:
            batch_size = encoder_hidden_states.shape[0]
        if input_ids is None:
            input_ids = jnp.full((batch_size, seq_len), cfg.mask_token_id, dtype=jnp.int32)

        use_cfg = encoder_hidden_states is not None and guidance_scale > 0
        condition = None
        if use_cfg:
            condition = jnp.concatenate(
                [encoder_hidden_states, jnp.zeros_like(encoder_hidden_states)], axis=0)
        elif encoder_hidden_states is not None:
            condition = encoder_hidden_states

        import numpy as np

        timestep_values = np.linspace(0.0, 1.0, timesteps)
        apply_fn = self.module.apply

        cache_key = ("generate", timesteps, float(guidance_scale),
                     float(topk_filter_thres), float(temperature),
                     class_ids is not None, use_cfg, condition is not None)
        if cache_key not in self._jit_cache:

            @jax.jit
            def run(params, input_ids, class_ids, condition, key):
                ctx = None
                if condition is not None and \
                        os.environ.get("MUSE_TPU_DECODE_CTX", "1") == "1":
                    ctx = apply_fn({"params": params}, input_ids, condition,
                                   return_step_ctx=True)
                ids = input_ids.astype(jnp.int32)
                scores = jnp.zeros(ids.shape, dtype=jnp.float32)
                for ti, timestep in enumerate(timestep_values):
                    steps_until_x0 = timesteps - 1 - ti
                    rand_mask_prob = float(np.cos(timestep * np.pi * 0.5)) \
                        if noise_schedule is sampling.cosine_schedule \
                        else float(noise_schedule(jnp.asarray(timestep)))
                    num_token_masked = max(int(rand_mask_prob * seq_len), 1)
                    masked_indices = jax.lax.top_k(scores, num_token_masked)[1]
                    # scatter mask tokens at the top-score positions
                    onehot = jax.nn.one_hot(masked_indices, seq_len, dtype=jnp.bool_)
                    to_mask = jnp.any(onehot, axis=1)
                    ids = jnp.where(to_mask, cfg.mask_token_id, ids)

                    model_ids = ids
                    if class_ids is not None:
                        model_ids = jnp.concatenate([class_ids[:, None], ids], axis=1)
                    if use_cfg:
                        model_input = jnp.concatenate([model_ids, model_ids], axis=0)
                        out = apply_fn({"params": params}, model_input, condition,
                                       step_ctx=ctx)
                        cond_logits, uncond_logits = jnp.split(out, 2, axis=0)
                        logits = uncond_logits[..., : cfg.codebook_size] + guidance_scale * (
                            cond_logits[..., : cfg.codebook_size]
                            - uncond_logits[..., : cfg.codebook_size])
                    elif condition is not None:
                        logits = apply_fn({"params": params}, model_ids, condition,
                                          step_ctx=ctx)[..., : cfg.codebook_size]
                    else:
                        logits = apply_fn({"params": params},
                                          model_ids)[..., : cfg.codebook_size]
                    if class_ids is not None:
                        logits = logits[:, 1:]

                    filtered = sampling.top_k(logits, topk_filter_thres)
                    step_temp = temperature * (steps_until_x0 / timesteps)
                    key, gkey = jax.random.split(key)
                    pred_ids = sampling.gumbel_sample(gkey, filtered, step_temp).astype(jnp.int32)
                    is_mask = ids == cfg.mask_token_id
                    ids = jnp.where(is_mask, pred_ids, ids)
                    logits32 = logits.astype(jnp.float32)
                    sel_logit = jnp.take_along_axis(logits32, pred_ids[..., None],
                                                    axis=-1)[..., 0]
                    scores = 1.0 - jnp.exp(
                        sel_logit - jax.nn.logsumexp(logits32, axis=-1))
                return ids

            self._jit_cache[cache_key] = run
        return self._jit_cache[cache_key](self.params, input_ids, class_ids, condition, key)
