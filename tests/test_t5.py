"""T5 encoder parity vs HF torch T5EncoderModel (tiny random config)."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_muse_tpu.models.t5_text import T5TextEncoder

T5_TINY = dict(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=3,
               num_heads=4, feed_forward_proj="relu")


def test_t5_shapes():
    enc = T5TextEncoder(**T5_TINY)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 120, (2, 12)))
    hs, last, pooled = enc.encode(ids)
    assert last.shape == (2, 12, 32)
    assert pooled is None


@pytest.mark.parametrize("proj", ["relu", "gated-gelu"])
def test_t5_torch_parity(proj):
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=64,
                        num_layers=3, num_heads=4, feed_forward_proj=proj,
                        use_cache=False)
    torch.manual_seed(0)
    ref = T5EncoderModel(hf_cfg)
    ref.eval()

    enc = T5TextEncoder(config=dict(T5_TINY, feed_forward_proj=proj),
                        _defer_init=True)
    missing, unexpected = enc.load_torch_weights(
        {k: v.numpy() for k, v in ref.state_dict().items()}, strict=False)
    assert not missing, missing

    ids = np.random.RandomState(1).randint(0, 120, (2, 12))
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(enc(jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref_out, atol=3e-4, rtol=1e-3)


def test_t5_attention_mask():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    hf_cfg = HFT5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=64,
                        num_layers=2, num_heads=4, feed_forward_proj="relu",
                        use_cache=False)
    torch.manual_seed(1)
    ref = T5EncoderModel(hf_cfg)
    ref.eval()
    enc = T5TextEncoder(config=dict(T5_TINY, num_layers=2), _defer_init=True)
    enc.load_torch_weights({k: v.numpy() for k, v in ref.state_dict().items()},
                           strict=False)
    ids = np.random.RandomState(2).randint(0, 120, (1, 10))
    mask = np.ones((1, 10), dtype=np.int64)
    mask[0, 6:] = 0
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids),
                      attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    ours = np.asarray(enc(jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(ours[:, :6], ref_out[:, :6], atol=3e-4, rtol=1e-3)
