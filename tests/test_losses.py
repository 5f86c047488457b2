"""Loss functions vs torch reference semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_muse_tpu.ops import losses as L


@pytest.mark.parametrize("label_smoothing", [0.0, 0.1])
def test_cross_entropy_matches_torch(label_smoothing):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rs = np.random.RandomState(0)
    logits = rs.randn(4, 16, 32).astype(np.float32)
    labels = rs.randint(0, 32, (4, 16))
    labels[:, :5] = -100
    ref = F.cross_entropy(torch.from_numpy(logits).view(-1, 32),
                          torch.from_numpy(labels).view(-1),
                          ignore_index=-100,
                          label_smoothing=label_smoothing).numpy()
    ours = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                      label_smoothing=label_smoothing))
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_weighted_cross_entropy_matches_reference_formula():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rs = np.random.RandomState(1)
    logits = rs.randn(3, 8, 16).astype(np.float32)
    labels = rs.randint(0, 16, (3, 8))
    weight = rs.rand(3, 8).astype(np.float32)
    # reference modeling_transformer_v2.py:305-317
    ce = F.cross_entropy(torch.from_numpy(logits).view(-1, 16),
                         torch.from_numpy(labels).view(-1), ignore_index=-100,
                         reduction="none")
    w = torch.from_numpy(weight).view(-1)
    ref = float(((ce * w).sum(dim=-1) / w.sum(dim=-1)).mean())
    ours = float(L.weighted_cross_entropy_loss(jnp.asarray(logits),
                                               jnp.asarray(labels),
                                               jnp.asarray(weight)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5)


def test_soft_target_cross_entropy_matches_reference():
    # reference train_muse.py imports plotly/webdataset at module scope
    # (unavailable here), so replicate its soft_target_cross_entropy
    # (train_muse.py:126-142) in torch for the comparison
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    def ref_fn(logits, targets, soft_targets):
        logits = logits[:, 1:]
        targets = targets[:, 1:]
        logits = logits[..., : soft_targets.shape[-1]]
        log_probs = F.log_softmax(logits, dim=-1)
        padding_mask = targets.eq(-100)
        loss = torch.sum(-soft_targets * log_probs, dim=-1)
        loss.masked_fill_(padding_mask, 0.0)
        num_active = padding_mask.numel() - padding_mask.long().sum()
        return loss.sum() / num_active

    rs = np.random.RandomState(2)
    logits = rs.randn(2, 9, 20).astype(np.float32)   # 1 class token + 8
    targets = rs.randint(0, 16, (2, 9))
    targets[0, 3:5] = -100
    soft = rs.rand(2, 8, 16).astype(np.float32)
    soft = soft / soft.sum(-1, keepdims=True)
    ref = float(ref_fn(torch.from_numpy(logits), torch.from_numpy(targets),
                       torch.from_numpy(soft)))
    ours = float(L.soft_target_cross_entropy(jnp.asarray(logits),
                                             jnp.asarray(targets),
                                             jnp.asarray(soft)))
    np.testing.assert_allclose(ours, ref, rtol=2e-5)
