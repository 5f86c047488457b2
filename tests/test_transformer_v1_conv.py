"""v1 transformer with ConvEmbed/ConvMlmLayer pixel-shuffle patching
(use_conv_in_out + patch_size), incl. torch parity."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.transformer_v1 import MaskGitTransformer

CONV_CFG = dict(
    vocab_size=66,
    hidden_size=32,
    embedding_size=16,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    codebook_size=64,
    num_vq_tokens=64,           # 8x8 latents
    max_position_embeddings=16,  # (8/2)^2 after patch_size=2 unshuffle
    use_conv_in_out=True,
    patch_size=2,
    hidden_dropout=0.0,
    attention_dropout=0.0,
)


def test_conv_in_out_forward_shape():
    model = MaskGitTransformer(**CONV_CFG)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 66, (2, 64)))
    logits = model(ids)
    # pixel-shuffle restores the full token grid at the output
    assert logits.shape == (2, 64, 66)


def test_conv_in_out_generate2():
    model = MaskGitTransformer(**CONV_CFG, num_classes=None)
    out = np.asarray(model.generate2(
        input_ids=jnp.full((1, 64), 65, dtype=jnp.int32), timesteps=3,
        key=jax.random.PRNGKey(0)))
    assert out.shape == (1, 64)
    assert (out < 64).all()


def test_conv_in_out_torch_parity():
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    import_reference_muse()
    from muse import MaskGitTransformer as RefT

    torch.manual_seed(0)
    ref = RefT(**CONV_CFG)
    ref.eval()
    model = MaskGitTransformer(config=dict(CONV_CFG), _defer_init=True)
    missing, unexpected = model.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    assert not missing and not unexpected

    ids = np.random.RandomState(1).randint(0, 66, (2, 64))
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(ids)).numpy()
    logits = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(logits, ref_logits, atol=3e-4, rtol=1e-3)
