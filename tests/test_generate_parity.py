"""Decode-loop math parity with the reference, piece by piece.

Full-loop bitwise parity across frameworks is impossible (different RNG
streams; and with saturated logits every confidence ties, so remask order is
noise — SURVEY.md §7 hard part 2).  Instead each deterministic piece of the
step (reference modeling_transformer_v2.py:422-474) is checked exactly:
CFG logit combination, schedule arrays, and the mask_len clamp.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.ops import sampling


def test_cfg_combination_matches_reference_formula():
    rs = np.random.RandomState(0)
    cond = rs.randn(2, 16, 64).astype(np.float32)
    uncond = rs.randn(2, 16, 64).astype(np.float32)
    scale = 7.5
    # reference :437: uncond + scale * (cond - uncond)
    expected = uncond + scale * (cond - uncond)
    ours = np.asarray(jnp.asarray(uncond) + scale * (jnp.asarray(cond)
                                                     - jnp.asarray(uncond)))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)


def test_mask_len_clamp_matches_reference():
    torch = pytest.importorskip("torch")
    seq_len = 256
    for timesteps in (4, 12, 18):
        for step in range(timesteps):
            ratio = (step + 1) / timesteps
            mask_ratio_t = torch.cos(torch.tensor(ratio) * np.pi * 0.5)
            for unknown in (256, 100, 3, 2, 1):
                # reference :459-465
                mask_len_ref = torch.max(
                    torch.tensor([1.0]),
                    torch.min(torch.tensor([[float(unknown)]]) - 1,
                              (seq_len * mask_ratio_t).floor().unsqueeze(0)))
                # ours (models/transformer_v2.py parallel_decode_loop)
                mask_ratio = sampling.cosine_schedule(jnp.asarray(ratio))
                ours = jnp.maximum(
                    1.0, jnp.minimum(jnp.asarray([[float(unknown)]]) - 1.0,
                                     jnp.floor(seq_len * mask_ratio)))
                np.testing.assert_allclose(np.asarray(ours),
                                           mask_len_ref.numpy(), atol=1e-5)


def test_temperature_and_guidance_schedules_match():
    torch = pytest.importorskip("torch")
    timesteps = 12
    # temperatures: reference :361-364
    ref_temps = torch.linspace(2.0, 0.0, timesteps).numpy()
    ours = np.linspace(2.0, 0.0, timesteps)
    np.testing.assert_allclose(ours, ref_temps, atol=1e-6)
    ref_temps = torch.linspace(1.0, 0.01, timesteps).numpy()
    np.testing.assert_allclose(np.linspace(1.0, 0.01, timesteps), ref_temps,
                               atol=1e-6)
    # linear guidance: reference :372-373
    ref_lin = torch.linspace(0, 8.0, timesteps).numpy()
    np.testing.assert_allclose(np.linspace(0, 8.0, timesteps), ref_lin, atol=1e-6)
    # cosine guidance: reference :374-380
    ref_cos = []
    for step in range(timesteps):
        ratio = 1.0 * (step + 1) / timesteps
        scale = torch.cos(torch.tensor(1 - ratio) * np.pi * 0.5) * 8.0
        ref_cos.append(float(scale.floor()))
    ratios = (np.arange(timesteps) + 1) / timesteps
    ours_cos = np.floor(np.cos((1 - ratios) * np.pi * 0.5) * 8.0)
    np.testing.assert_allclose(ours_cos, np.asarray(ref_cos), atol=1e-6)


def test_categorical_equals_multinomial_softmax():
    """jax.random.categorical(logits) samples the same distribution as torch
    multinomial(softmax(logits)) — verified by frequency on a small vocab."""
    logits = jnp.asarray([[2.0, 1.0, 0.0, -1.0]])
    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    draws = jax.vmap(lambda k: jax.random.categorical(k, logits, axis=-1))(keys)
    freqs = np.bincount(np.asarray(draws).reshape(-1), minlength=4) / 4000
    expected = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    np.testing.assert_allclose(freqs, expected, atol=0.03)
