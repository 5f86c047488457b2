"""Step/guidance distillation tests (training/distill.py).

Tiers: the trajectory contract and one-step mechanics run in the default
tier; the end-to-end "distilled 3-step student keeps the task accuracy of
the 6-step CFG teacher" learning test is slow.
"""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.transformer_v2 import (
    MaskGiTUViT_v2, decode_schedules, parallel_decode_loop)
from open_muse_tpu.training import trainer as T
from open_muse_tpu.training.distill import distilled_generate, make_distill_step
from open_muse_tpu.training.optimizers import get_optimizer

SEQ = 16


def tiny_model(seed=0):
    return MaskGiTUViT_v2(
        hidden_size=64, cond_embed_dim=24, micro_cond_encode_dim=8,
        micro_cond_embed_dim=40, encoder_hidden_size=32, vocab_size=68,
        codebook_size=64, in_channels=32, block_out_channels=(32,),
        num_res_blocks=1, block_num_heads=2, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96, seed=seed)


def text_batch(batch=4, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    return {
        "encoder_hidden_states": jax.random.normal(k1, (batch, 8, 32)),
        "cond_embeds": jax.random.normal(k2, (batch, 24)),
        "micro_conds": jnp.asarray([[16, 16, 0, 0, 6.0]] * batch, jnp.float32),
        "empty_embeds": jnp.zeros((1, 8, 32)),
        "empty_cond_embeds": jnp.zeros((1, 24)),
    }


def test_trajectory_contract():
    """states[t] = carry-in ids (all-mask at t=0, mask count follows the
    schedule), sampled[t] = fully-committed grid, final == sampled[-1]."""
    model = tiny_model()
    cfg = model.config
    batch = text_batch()
    timesteps = 6
    temps, gs, ratios = decode_schedules(timesteps, 1.0, 0.0)
    input_ids = jnp.full((4, SEQ), cfg.mask_token_id, jnp.int32)
    final, states, sampled = jax.jit(functools.partial(
        parallel_decode_loop, model.module.apply, cfg, use_cfg=False,
        seq_len=SEQ, timesteps=timesteps, return_trajectory=True))(
        model.params, input_ids, batch["encoder_hidden_states"],
        batch["cond_embeds"], batch["micro_conds"], jax.random.PRNGKey(0),
        temps, gs, ratios)

    assert states.shape == (timesteps, 4, SEQ)
    assert sampled.shape == (timesteps, 4, SEQ)
    assert bool(jnp.all(states[0] == cfg.mask_token_id))
    assert bool(jnp.all(final == sampled[-1]))
    # committed grids never contain the mask token
    assert bool(jnp.all(sampled < cfg.codebook_size))
    # carry-in mask count at step t equals the schedule's carry-out at t-1:
    # mask_len = clip(floor(seq * ratio[t-1]), 1, unknown-1)
    counts = (states == cfg.mask_token_id).sum(axis=-1)
    assert bool(jnp.all(counts[0] == SEQ))
    expected = np.maximum(1, np.floor(SEQ * np.asarray(ratios))).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(counts[1:]),
                                  np.broadcast_to(expected[:-1, None], (timesteps - 1, 4)))


def test_distill_step_updates_and_is_finite():
    model = tiny_model()
    tx = get_optimizer("adamw", 1e-3)
    state = T.create_train_state(model.params, tx, with_ema=True)
    teacher_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                            model.params)
    step = make_distill_step(
        model.module, tx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=6, step_ratio=2, guidance_scale=2.0, seq_len=SEQ)
    batch = text_batch()
    before = jax.tree_util.tree_leaves(state.params)[0].copy()
    key = jax.random.PRNGKey(0)
    for i in range(2):
        key, sub = jax.random.split(key)
        state, metrics = step(state, teacher_params, batch, sub)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 < float(metrics["avg_masked_frac"]) <= 1.0
    assert int(state.step) == 2
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(teacher_params)))
    assert changed, "distill step did not move the student"
    # EMA tracked
    assert state.ema_params is not None


def test_distill_step_rejects_misaligned_steps():
    model = tiny_model()
    tx = get_optimizer("adamw", 1e-3)
    with pytest.raises(ValueError):
        make_distill_step(model.module, tx,
                          mask_token_id=model.config.mask_token_id,
                          teacher_timesteps=7, step_ratio=2)


def test_schedule_alignment_student_teacher():
    """The distilled student's K-step mask ratios must coincide with the
    teacher's at every step_ratio-th step (cosine schedule property the
    distillation pairing relies on)."""
    _, _, r_teacher = decode_schedules(12, 1.0, 0.0)
    _, _, r_student = decode_schedules(6, 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(r_teacher)[1::2],
                               np.asarray(r_student), rtol=1e-6)


@pytest.mark.slow
def test_distilled_student_matches_teacher_task_accuracy():
    """Train a 6-step CFG teacher on colored squares, self-distill to a
    3-step NO-CFG student, and require the student to keep the task:
    prompt->color accuracy 1.0 at a quarter of the teacher's model FLOPs."""
    from open_muse_tpu.eval.quality_regression import (
        COLORS, _build_stack, _train_vq, color_accuracy, make_square_images)
    from open_muse_tpu.ops.sampling import cosine_schedule

    rs = np.random.RandomState(0)
    vq, text_encoder, tokenizer, model = _build_stack(0)
    _train_vq(vq, rs, 150)
    names = list(COLORS)

    def batch_for(colors):
        pixels = make_square_images(colors, rs)
        tokens = vq.get_code(jnp.asarray(pixels))
        texts = [f"a {c} square" for c in colors]
        ids = jnp.asarray(tokenizer(texts)["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        return {
            "image_tokens": tokens,
            "encoder_hidden_states": hs[-2],
            "cond_embeds": pooled,
            "micro_conds": jnp.asarray([[16, 16, 0, 0, 6.0]] * len(colors),
                                       jnp.float32),
        }

    # -- teacher training (same recipe as test_learning_e2e) --
    tx = get_optimizer("adamw", 4e-3, max_grad_norm=1.0)
    state = T.create_train_state(model.params, tx)
    step_fn = T.make_uvit_train_step(model.module, tx, cosine_schedule,
                                     model.config.mask_token_id,
                                     codebook_size=64)
    key = jax.random.PRNGKey(0)
    for i in range(200):
        key, sub = jax.random.split(key)
        state, _ = step_fn(state, batch_for([names[j % 3]
                                             for j in range(i, i + 6)]), sub)
    teacher_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                            state.params)

    # -- self-distillation: 6-step CFG teacher -> 3-step no-CFG student --
    dtx = get_optimizer("adamw", 5e-4, max_grad_norm=1.0)
    # student starts FROM the teacher weights but needs its own buffers:
    # distill_step donates the student state while teacher_params stays live
    dstate = T.create_train_state(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                               teacher_params), dtx)
    dstep = make_distill_step(
        model.module, dtx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=6, step_ratio=2, guidance_scale=2.0,
        temperature=(1.0, 0.0), seq_len=SEQ, ema_decay=None)
    first = last = None
    key = jax.random.PRNGKey(1)
    for i in range(80):
        key, sub = jax.random.split(key)
        texts = [f"a {names[j % 3]} square" for j in range(i, i + 6)]
        ids = jnp.asarray(tokenizer(texts)["input_ids"])
        hs, _, pooled = text_encoder.encode(ids)
        empty_ids = jnp.asarray(tokenizer([""])["input_ids"])
        ehs_e, _, pooled_e = text_encoder.encode(empty_ids)
        batch = {"encoder_hidden_states": hs[-2], "cond_embeds": pooled,
                 "micro_conds": jnp.asarray([[16, 16, 0, 0, 6.0]] * 6,
                                            jnp.float32),
                 "empty_embeds": ehs_e[-2], "empty_cond_embeds": pooled_e}
        dstate, metrics = dstep(dstate, teacher_params, batch, sub)
        if i == 0:
            first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first, (first, last)

    # -- the distilled student at 3 steps, no CFG, keeps the task --
    # Bar calibration: chance is 1/3; a broken (state, target) pairing or a
    # wrong label mask collapses the student to chance.  The tiny teacher
    # itself lands 0.89-1.0 depending on the device env (the 8-virtual-device
    # conftest mesh changes float accumulation order), so the student bar is
    # 0.7 over 30 prompts — far above chance, tolerant of toy-scale noise.
    model.params = dstate.params
    model._jit_cache.clear()
    prompts = [f"a {c} square" for c in names * 10]
    ids = jnp.asarray(tokenizer(prompts)["input_ids"])
    hs, _, pooled = text_encoder.encode(ids)
    tokens = distilled_generate(
        model, hs[-2], pooled,
        jnp.asarray([[16, 16, 0, 0, 6.0]] * len(prompts), jnp.float32),
        teacher_timesteps=6, step_ratio=2, temperature=(1.0, 0.0),
        seq_len=SEQ, key=jax.random.PRNGKey(7))
    images = list(np.asarray(vq.decode_code(tokens)))
    acc = color_accuracy(images, prompts)
    assert acc >= 0.7, f"distilled 3-step accuracy {acc}"


def test_distill_step_gspmd_mesh():
    """dp=4 x fsdp=2 mesh: student state sharded (fsdp params), teacher
    replicated, batch dp-sharded — the fused teacher-trajectory + student-
    update program executes under GSPMD and donation stays consistent."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from open_muse_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(dp=4, fsdp=2, tp=1)
    model = tiny_model()
    tx = get_optimizer("adamw", 1e-3)
    state = T.create_train_state(model.params, tx, mesh=mesh)
    rep = NamedSharding(mesh, P())
    teacher_params = jax.device_put(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                               model.params), rep)
    step = make_distill_step(
        model.module, tx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=4, step_ratio=2, guidance_scale=2.0, seq_len=SEQ,
        ema_decay=None)
    batch = text_batch(batch=8)
    batch_sh = NamedSharding(mesh, P(("dp", "fsdp")))
    batch = {k: jax.device_put(v, rep if v.shape[0] == 1 else batch_sh)
             for k, v in batch.items()}
    state, metrics = step(state, teacher_params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, teacher_params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_distill_step_soft_targets():
    """soft_weight > 0 adds the guidance-distillation KL term: runs, KL is
    finite and non-negative, and matching distributions give (near-)zero KL
    at step 0 of self-distillation (student == teacher at the CFG-combined
    logits only when guidance is off)."""
    model = tiny_model()
    tx = get_optimizer("adamw", 1e-3)
    teacher_params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                                            model.params)
    batch = text_batch()

    # guidance OFF: the soft target is the teacher's own condition-only
    # distribution, and student==teacher at init -> KL == 0
    state = T.create_train_state(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                               model.params), tx)
    step0 = make_distill_step(
        model.module, tx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=4, step_ratio=2, guidance_scale=0.0, seq_len=SEQ,
        ema_decay=None, soft_weight=0.5)
    _, metrics = step0(state, teacher_params, batch, jax.random.PRNGKey(0))
    assert float(metrics["soft_kl"]) < 1e-5, float(metrics["soft_kl"])

    # guidance ON: at INIT the zero-init AdaLN/mlm head makes conditioning a
    # no-op (cond == uncond -> CFG combine == the student's own logits, KL 0
    # by construction) — so assert KL > 0 on the SECOND step, once the hard
    # CE has moved the student off the teacher
    state = T.create_train_state(
        jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True),
                               model.params), tx)
    step = make_distill_step(
        model.module, tx, mask_token_id=model.config.mask_token_id,
        teacher_timesteps=4, step_ratio=2, guidance_scale=4.0, seq_len=SEQ,
        ema_decay=None, soft_weight=0.5)
    state, metrics = step(state, teacher_params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, teacher_params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["soft_kl"]) > 0.0
