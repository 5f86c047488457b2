"""Taming VQGAN, MOVQ, Paella VQ: shape tests + torch parity."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_muse_tpu.models.taming_vqgan import VQGANModel
from open_muse_tpu.models.movq import MOVQ
from open_muse_tpu.models.paella_vq import PaellaVQModel

TAMING_TINY = dict(
    resolution=32,
    hidden_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=2,
    attn_resolutions=(16,),
    z_channels=16,
    num_embeddings=64,
    quantized_embed_dim=16,
)

MOVQ_TINY = dict(
    resolution=32,
    hidden_channels=32,
    channel_mult=(1, 2),
    num_res_blocks=2,
    attn_resolutions=(16,),
    z_channels=4,
    num_embeddings=64,
    quantized_embed_dim=4,
)

PAELLA_TINY = dict(levels=2, bottleneck_blocks=2, c_hidden=64, c_latent=4,
                   codebook_size=64)


def _rand_img(rs, batch=1, res=32):
    return rs.rand(batch, res, res, 3).astype(np.float32)


def test_taming_shapes():
    model = VQGANModel(**TAMING_TINY)
    x = jnp.asarray(_rand_img(np.random.RandomState(0)))
    z_q, idx = model.encode(x)
    assert z_q.shape == (1, 16, 16, 16) and idx.shape == (1, 256)
    recon = model.decode_code(idx)
    assert recon.shape == (1, 32, 32, 3)


def test_movq_shapes():
    model = MOVQ(**MOVQ_TINY)
    x = jnp.asarray(_rand_img(np.random.RandomState(1)))
    z_q, idx = model.encode(x)
    assert z_q.shape == (1, 16, 16, 4) and idx.shape == (1, 256)
    recon = model.decode_code(idx)
    assert recon.shape == (1, 32, 32, 3)


def test_paella_shapes():
    model = PaellaVQModel(**PAELLA_TINY)
    x = jnp.asarray(np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32))
    codes = model.get_code(x)
    assert codes.shape == (1, 256)  # 64 / (2*2*2) = 16 per side
    recon = model.decode_code(codes)
    assert recon.shape == (1, 64, 64, 3)


def _load_reference(name):
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    import_reference_muse()
    import muse

    return torch, getattr(muse, name)


def test_taming_torch_parity():
    torch, RefVQGAN = _load_reference("VQGANModel")
    torch.manual_seed(0)
    ref = RefVQGAN(**{k: (list(v) if isinstance(v, tuple) else v)
                      for k, v in TAMING_TINY.items()})
    ref.eval()
    model = VQGANModel(config=dict(TAMING_TINY), _defer_init=True)
    missing, unexpected = model.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    assert not missing and not unexpected

    x = np.random.RandomState(3).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.get_code(torch.from_numpy(x)).numpy()
        ref_recon = ref.decode_code(torch.from_numpy(ref_codes)).numpy()
    codes = np.asarray(model.get_code(jnp.asarray(x)))
    np.testing.assert_array_equal(codes, ref_codes)
    recon = np.asarray(model.decode_code(jnp.asarray(codes))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(recon, ref_recon, atol=5e-4, rtol=1e-3)


def test_movq_torch_parity():
    torch, RefMOVQ = _load_reference("MOVQ")
    torch.manual_seed(0)
    ref = RefMOVQ(**{k: (list(v) if isinstance(v, tuple) else v)
                     for k, v in MOVQ_TINY.items()})
    ref.eval()
    model = MOVQ(config=dict(MOVQ_TINY), _defer_init=True)
    missing, unexpected = model.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    assert not missing and not unexpected

    x = np.random.RandomState(4).rand(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.get_code(torch.from_numpy(x)).numpy()
        ref_recon = ref.decode_code(torch.from_numpy(ref_codes)).numpy()
    codes = np.asarray(model.get_code(jnp.asarray(x)))
    np.testing.assert_array_equal(codes, ref_codes)
    recon = np.asarray(model.decode_code(jnp.asarray(codes))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(recon, ref_recon, atol=5e-4, rtol=1e-3)


def test_paella_torch_parity():
    torch, RefPaella = _load_reference("PaellaVQModel")
    torch.manual_seed(0)
    ref = RefPaella(**PAELLA_TINY)
    ref.eval()
    # give BN stats non-trivial values so the parity test exercises them
    with torch.no_grad():
        bn = ref.down_blocks[-1][1]
        bn.running_mean.uniform_(-0.5, 0.5)
        bn.running_var.uniform_(0.5, 1.5)
    model = PaellaVQModel(config=dict(PAELLA_TINY), _defer_init=True)
    missing, unexpected = model.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    assert not missing and not unexpected

    x = np.random.RandomState(5).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_codes = ref.get_code(torch.from_numpy(x)).numpy()
        ref_recon = ref.decode_code(torch.from_numpy(ref_codes)).numpy()
    codes = np.asarray(model.get_code(jnp.asarray(x)))
    np.testing.assert_array_equal(codes, ref_codes)
    recon = np.asarray(model.decode_code(jnp.asarray(codes))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(recon, ref_recon, atol=5e-4, rtol=1e-3)
