"""MaskGitVQGAN: shape tests + numerical parity vs the torch reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from open_muse_tpu.models.maskgit_vqgan import MaskGitVQGAN

TINY = dict(
    resolution=32,
    hidden_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=1,
    z_channels=16,
    num_embeddings=64,
    quantized_embed_dim=16,
)


def test_tiny_roundtrip_shapes():
    model = MaskGitVQGAN(**TINY)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32))
    z_q, indices = model.encode(x)
    assert z_q.shape == (2, 16, 16, 16)
    assert indices.shape == (2, 256)
    recon = model.decode_code(indices)
    assert recon.shape == (2, 32, 32, 3)
    codes = model.get_code(x)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(indices))


def test_encode_with_loss():
    model = MaskGitVQGAN(**TINY)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    z_q, indices, loss = model.encode(x, return_loss=True)
    assert np.isfinite(float(loss))


def test_save_load_roundtrip(tmp_path):
    model = MaskGitVQGAN(**TINY)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32))
    codes = np.asarray(model.get_code(x))
    model.save_pretrained(str(tmp_path))
    loaded = MaskGitVQGAN.from_pretrained(str(tmp_path))
    codes2 = np.asarray(loaded.get_code(x))
    np.testing.assert_array_equal(codes, codes2)
    assert loaded.config == model.config


@pytest.fixture(scope="module")
def reference():
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    import_reference_muse()
    from muse import MaskGitVQGAN as RefMaskGitVQGAN

    torch.manual_seed(0)
    ref = RefMaskGitVQGAN(**TINY)
    ref.eval()
    return ref


def test_torch_parity(reference):
    """Load reference random weights through the converter; outputs must match."""
    import torch

    state_dict = {k: v.numpy() for k, v in reference.state_dict().items()}
    model = MaskGitVQGAN(config=dict(TINY), _defer_init=True)
    missing, unexpected = model.load_torch_weights(state_dict)
    assert not missing and not unexpected

    x = np.random.RandomState(3).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_codes = reference.get_code(torch.from_numpy(x)).numpy()
        ref_recon = reference.decode_code(torch.from_numpy(ref_codes)).numpy()

    codes = np.asarray(model.get_code(jnp.asarray(x)))
    np.testing.assert_array_equal(codes, ref_codes)

    recon = np.asarray(model.decode_code(jnp.asarray(codes)))
    recon_nchw = recon.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(recon_nchw, ref_recon, atol=2e-4, rtol=1e-3)


def test_torch_parity_encoder_latents(reference):
    import torch

    state_dict = {k: v.numpy() for k, v in reference.state_dict().items()}
    model = MaskGitVQGAN(config=dict(TINY), _defer_init=True)
    model.load_torch_weights(state_dict)

    x = np.random.RandomState(4).rand(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_z = reference.encoder(torch.from_numpy(x)).numpy()
    z = model.apply(jnp.asarray(x.transpose(0, 2, 3, 1)), method="encode")[0]
    # compare pre-quantization latents via the encoder method directly
    enc = model.module.bind({"params": model.params}).encoder(
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(enc).transpose(0, 3, 1, 2), ref_z, atol=2e-4, rtol=1e-3)
