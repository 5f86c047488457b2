"""8-bit optimizer state (training/quant8.py): quantization error bounds,
state memory layout, and convergence parity with fp32 AdamW.

Reference behavior: bitsandbytes AdamW8bit as dispatched by the reference
training/train_muse.py:413-420 (blockwise int8 moments, dynamic codebook,
min_8bit_size threshold).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from open_muse_tpu.training.optimizers import get_optimizer
from open_muse_tpu.training.quant8 import (BLOCK_SIZE, SIGNED_TABLE,
                                           UNSIGNED_TABLE, Quant8State,
                                           Quantized8, adamw8bit,
                                           dequantize_blockwise,
                                           quantize_blockwise)

# module default is the fast tier; the GSPMD mesh test opts out (8-device
# CPU compile alone takes ~3 min)


@pytest.mark.fast
def test_roundtrip_relative_error():
    """Dynamic (log-spaced) codebook: bounded RELATIVE error across 6+
    decades of magnitude within one block — the property a linear absmax
    grid does not have (its error there would be ~100% for small entries).
    Signed table: 127 positive levels over 7 decades -> <=7% step; unsigned:
    255 levels -> <=3.5%."""
    rs = np.random.RandomState(0)
    # magnitudes spanning 1e-6 .. 1, mixed signs, in one 256-wide row
    mags = 10.0 ** rs.uniform(-6, 0, size=(4, 512))
    x = jnp.asarray(mags * rs.choice([-1.0, 1.0], size=mags.shape), jnp.float32)
    q = quantize_blockwise(x, SIGNED_TABLE)
    out = dequantize_blockwise(q, SIGNED_TABLE)
    rel = np.abs(np.asarray(out) - np.asarray(x)) / np.abs(np.asarray(x))
    assert rel.max() < 0.07, rel.max()

    # unsigned table for nonnegative arrays (nu)
    xu = jnp.asarray(mags, jnp.float32)
    qu = quantize_blockwise(xu, UNSIGNED_TABLE)
    outu = dequantize_blockwise(qu, UNSIGNED_TABLE)
    relu = np.abs(np.asarray(outu) - mags) / mags
    assert relu.max() < 0.035, relu.max()


@pytest.mark.fast
def test_roundtrip_edge_cases():
    # exact zeros survive; all-zero blocks don't NaN
    z = jnp.zeros((3, 300), jnp.float32)
    out = dequantize_blockwise(quantize_blockwise(z, SIGNED_TABLE),
                               SIGNED_TABLE)
    assert np.all(np.asarray(out) == 0.0)

    # non-multiple-of-block last dim exercises the padding path
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(5, 300).astype(np.float32))
    q = quantize_blockwise(x, SIGNED_TABLE)
    assert q.codes.shape == (5, 300) and q.codes.dtype == jnp.uint8
    assert q.absmax.shape == (5, 2)  # ceil(300/256)
    out = dequantize_blockwise(q, SIGNED_TABLE)
    assert out.shape == (5, 300)
    # padded lanes must not contaminate block absmax: check max error scale
    err = np.abs(np.asarray(out) - np.asarray(x))
    assert err.max() < 0.07 * np.abs(np.asarray(x)).max()

    # 1-D and 3-D shapes
    for shape in [(700,), (2, 3, 260)]:
        x = jnp.asarray(rs.randn(*shape).astype(np.float32))
        q = quantize_blockwise(x, SIGNED_TABLE)
        assert q.codes.shape == shape
        assert dequantize_blockwise(q, SIGNED_TABLE).shape == shape


@pytest.mark.fast
def test_state_layout_and_memory():
    """Big leaves: uint8 codes in the PARAM'S shape (sharding rules apply
    verbatim) + fp32 absmax per 256 block; small leaves stay fp32."""
    params = {"w": jnp.ones((64, 256), jnp.float32),   # 16384 >= min size
              "b": jnp.ones((64,), jnp.float32)}       # small -> fp32
    tx = adamw8bit(1e-3)
    state = tx.init(params)
    inner = state[0]
    assert isinstance(inner, Quant8State)
    assert isinstance(inner.mu["w"], Quantized8)
    assert inner.mu["w"].codes.shape == (64, 256)
    assert inner.mu["w"].codes.dtype == jnp.uint8
    assert inner.mu["w"].absmax.shape == (64, 1)
    assert not isinstance(inner.mu["b"], Quantized8)
    assert inner.mu["b"].dtype == jnp.float32

    # measured bytes/param on the quantized leaf: codes (1) + absmax (4/256)
    # for each of mu/nu => ~2.03, vs 8 for fp32 moments
    n = params["w"].size
    state_bytes = 2 * (n + inner.mu["w"].absmax.size * 4)
    assert state_bytes / n < 2.1


@pytest.mark.fast
def test_first_step_matches_adamw():
    """Step 1 from zero moments: quantization error on the freshly-updated
    moments is the ONLY delta vs optax.adamw — update directions must agree
    to ~table resolution."""
    rs = np.random.RandomState(2)
    params = {"w": jnp.asarray(rs.randn(32, 256), jnp.float32)}
    grads = {"w": jnp.asarray(rs.randn(32, 256), jnp.float32)}

    ref = optax.adamw(1e-2)
    ref_updates, _ = ref.update(grads, ref.init(params), params)
    q = adamw8bit(1e-2)
    q_updates, _ = q.update(grads, q.init(params), params)

    a, b = np.asarray(ref_updates["w"]), np.asarray(q_updates["w"])
    cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos


@pytest.mark.fast
def test_convergence_parity_with_fp32():
    """Short regression fit: 8-bit state must track fp32 AdamW's loss curve
    (the bitsandbytes claim).  min_quant_size lowered so the int8 path is
    actually exercised on this small problem."""
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(128, 64), jnp.float32)
    w_true = jnp.asarray(rs.randn(64, 8), jnp.float32)
    y = x @ w_true

    def loss_fn(params):
        return jnp.mean(jnp.square(x @ params["w"] + params["b"] - y))

    def run(tx, steps=120):
        params = {"w": jnp.zeros((64, 8), jnp.float32),
                  "b": jnp.zeros((8,), jnp.float32)}
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, state = tx.update(grads, state, params)
            return optax.apply_updates(params, updates), state, loss

        for _ in range(steps):
            params, state, loss = step(params, state)
        return float(loss)

    final_fp32 = run(optax.adamw(3e-2, weight_decay=0.0))
    final_8bit = run(adamw8bit(3e-2, weight_decay=0.0, min_quant_size=64))
    start = float(loss_fn({"w": jnp.zeros((64, 8)), "b": jnp.zeros((8,))}))
    # both must have converged substantially, and 8-bit must stay close
    assert final_fp32 < 0.05 * start
    assert final_8bit < 0.08 * start, (final_fp32, final_8bit)


@pytest.mark.fast
def test_get_optimizer_dispatch_and_serialization():
    """get_optimizer('8bit_adamw') returns the real int8 transform (chained
    with grad clipping), and its state round-trips through flax
    serialization (the Orbax checkpoint path)."""
    from flax import serialization

    params = {"w": jnp.ones((16, 512), jnp.float32)}
    tx = get_optimizer("8bit_adamw", 1e-3, max_grad_norm=1.0)
    state = tx.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    assert any(leaf.dtype == jnp.uint8 for leaf in leaves)

    grads = {"w": jnp.full((16, 512), 0.1, jnp.float32)}
    _, state2 = tx.update(grads, state, params)
    blob = serialization.to_bytes(state2)
    restored = serialization.from_bytes(state2, blob)
    for a, b in zip(jax.tree_util.tree_leaves(state2),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # bf16_adamw keeps the old lighter-touch behavior
    tx_bf16 = get_optimizer("bf16_adamw", 1e-3)
    s = tx_bf16.init(params)
    assert any(leaf.dtype == jnp.bfloat16
               for leaf in jax.tree_util.tree_leaves(s))


def test_gspmd_8bit_state_shards_like_params():
    """dp=2 x fsdp=2 x tp=2 virtual mesh: int8 moment CODES inherit the
    param's sharding (the trim-matching in trainer.shard_like_params);
    absmax scales stay replicated; the donated train step executes."""
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
    from open_muse_tpu.ops.sampling import cosine_schedule
    from open_muse_tpu.parallel.mesh import create_mesh
    from open_muse_tpu.training import trainer as T
    from jax.sharding import NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    tiny = dict(hidden_size=64, cond_embed_dim=24, micro_cond_encode_dim=8,
                micro_cond_embed_dim=40, encoder_hidden_size=32, vocab_size=68,
                mask_token_id=67, codebook_size=64, in_channels=32,
                block_out_channels=(32,), num_res_blocks=1, block_num_heads=2,
                num_hidden_layers=2, num_attention_heads=4,
                intermediate_size=96)
    mesh = create_mesh(dp=2, fsdp=2, tp=2)
    model = MaskGiTUViT_v2(**tiny)
    tx = adamw8bit(1e-3, min_quant_size=64)  # tiny model: quantize small too
    state = T.create_train_state(model.params, tx, mesh=mesh)

    # locate a quantized moment and its param; shardings must agree
    flat_mu = {tuple(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in kp): leaf
               for kp, leaf in jax.tree_util.tree_flatten_with_path(
                   state.opt_state, is_leaf=lambda x: isinstance(x, Quantized8)
               )[0] if isinstance(leaf, Quantized8)}
    assert flat_mu, "no quantized moments found"
    flat_p = {tuple(str(getattr(k, "key", getattr(k, "name", k)))
                    for k in kp): leaf
              for kp, leaf in
              jax.tree_util.tree_flatten_with_path(state.params)[0]}
    checked = 0
    for mu_path, q in flat_mu.items():
        for p_path, p in flat_p.items():
            if mu_path[-len(p_path):] == p_path and p.shape == q.codes.shape:
                assert q.codes.sharding == p.sharding, (mu_path, p_path)
                if p.sharding.spec != P():
                    checked += 1
                break
    assert checked > 0, "no non-trivially-sharded quantized moment checked"

    rs = np.random.RandomState(4)
    batch = {
        "image_tokens": jnp.asarray(rs.randint(0, 64, (8, 16))),
        "encoder_hidden_states": jnp.asarray(
            rs.randn(8, 7, 32).astype(np.float32)),
        "cond_embeds": jnp.asarray(rs.randn(8, 24).astype(np.float32)),
        "micro_conds": jnp.asarray(
            np.tile([[512, 512, 0, 0, 6.0]], (8, 1)), dtype=jnp.float32),
    }
    batch_sh = NamedSharding(mesh, P(("dp", "fsdp")))
    batch = {k: jax.device_put(v, batch_sh) for k, v in batch.items()}
    step_fn = T.make_uvit_train_step(model.module, tx, cosine_schedule, 67,
                                     codebook_size=64)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
