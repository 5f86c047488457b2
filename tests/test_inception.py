"""InceptionV3 port parity (reference FID/ISC protocol backbone).

The reference scores FID/ISC through cleanfid's InceptionV3 (reference
scripts/calculate_fid.py:215-220).  Published weights are network-gated, so
parity is proven against a torch implementation of the published torchvision
``inception_v3`` evaluation graph built HERE with random weights: the torch
state dict flows through the real converter
(convert_torch_inception_state_dict), so key layout, conv padding, BN math,
pooling semantics and the FID-specific pooling patches are all exercised
end-to-end.  The day real weights are reachable,
InceptionFeatureExtractor.from_torch_checkpoint ingests them with zero new
code.
"""

import numpy as np
import pytest
import torch
import torch.nn as torch_nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# torch reference: the published torchvision inception_v3 eval graph
# (attribute names match torchvision so state_dict keys are identical)
# ---------------------------------------------------------------------------

class TBasicConv2d(torch_nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = torch_nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = torch_nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(torch_nn.Module):
    def __init__(self, in_ch, pool_features, include_pad):
        super().__init__()
        self.include_pad = include_pad
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=self.include_pad)
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(bp)], 1)


class TInceptionB(torch_nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionC(torch_nn.Module):
    def __init__(self, in_ch, c7, include_pad):
        super().__init__()
        self.include_pad = include_pad
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                          count_include_pad=self.include_pad)
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(bp)], 1)


class TInceptionD(torch_nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(torch_nn.Module):
    def __init__(self, in_ch, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = F.avg_pool2d(x, 3, stride=1, padding=1,
                              count_include_pad=(self.pool_mode == "avg_true"))
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInceptionV3(torch_nn.Module):
    """Eval graph of torchvision inception_v3 (aux head omitted); with
    fid=True applies pytorch-fid's FIDInceptionA/C/E pooling patches."""

    def __init__(self, fid=True):
        super().__init__()
        inc = not fid  # stock torchvision: count_include_pad=True
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32, inc)
        self.Mixed_5c = TInceptionA(256, 64, inc)
        self.Mixed_5d = TInceptionA(288, 64, inc)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128, inc)
        self.Mixed_6c = TInceptionC(768, 160, inc)
        self.Mixed_6d = TInceptionC(768, 160, inc)
        self.Mixed_6e = TInceptionC(768, 192, inc)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg_excl" if fid else "avg_true")
        self.Mixed_7c = TInceptionE(2048, "max" if fid else "avg_true")
        self.fc = torch_nn.Linear(2048, 1008 if fid else 1000)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        pool3 = x.mean(dim=(2, 3))
        return pool3, self.fc(pool3)


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch_nn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)
            elif isinstance(m, torch_nn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
            elif isinstance(m, torch_nn.Linear):
                m.weight.normal_(0, 0.05, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
    return model


@pytest.mark.parametrize("fid_variant", [True, False],
                         ids=["fid", "torchvision"])
def test_inception_full_graph_parity(fid_variant):
    """Random-weight torch graph -> state_dict -> converter -> flax must
    reproduce pool3 features AND logits (both pooling variants).  Odd input
    size exercises the asymmetric stride-2 padding."""
    from open_muse_tpu.eval.inception import (
        InceptionV3, convert_torch_inception_state_dict)

    tmodel = _randomize(TInceptionV3(fid=fid_variant), seed=0).eval()
    params = convert_torch_inception_state_dict(tmodel.state_dict())

    rs = np.random.RandomState(0)
    x = rs.rand(2, 135, 135, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref_pool3, ref_logits = tmodel(
            torch.from_numpy(x.transpose(0, 3, 1, 2)))

    model = InceptionV3(variant="fid" if fid_variant else "torchvision")
    pool3, logits = model.apply({"params": params}, jnp.asarray(x),
                                return_logits=True)
    np.testing.assert_allclose(np.asarray(pool3), ref_pool3.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               atol=2e-3, rtol=1e-3)


def test_variant_pooling_differs():
    """The FID pooling patches must actually change the features (guards
    against the variant flag silently not being wired through)."""
    from open_muse_tpu.eval.inception import (
        InceptionV3, convert_torch_inception_state_dict)

    tmodel = _randomize(TInceptionV3(fid=True), seed=1).eval()
    params = convert_torch_inception_state_dict(tmodel.state_dict())
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(1, 96, 96, 3).astype(np.float32))
    a = InceptionV3(variant="fid").apply({"params": params}, x)
    b = InceptionV3(variant="torchvision", num_classes=1008).apply(
        {"params": params}, x)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-4


def test_converter_strictness_and_aux_skip():
    """AuxLogits + num_batches_tracked are dropped; anything else
    unrecognized raises (a wrong checkpoint must fail loudly)."""
    from open_muse_tpu.eval.inception import (
        convert_torch_inception_state_dict, detect_variant)

    tmodel = TInceptionV3(fid=True)
    sd = dict(tmodel.state_dict())
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    params = convert_torch_inception_state_dict(sd)
    assert "AuxLogits" not in params
    assert params["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert params["fc"]["kernel"].shape == (2048, 1008)
    assert detect_variant(sd) == "fid"

    with pytest.raises(ValueError, match="unrecognized"):
        convert_torch_inception_state_dict({"surprise.weight":
                                            torch.zeros(1)})


def test_extractor_contract_and_isc():
    """Seeded extractor satisfies the eval/fid.py extract() contract and the
    ISC protocol runs on its classifier head."""
    from open_muse_tpu.eval.fid import compute_statistics, frechet_distance
    from open_muse_tpu.eval.inception import InceptionFeatureExtractor

    ex = InceptionFeatureExtractor.seeded(seed=0, batch_size=4)
    rs = np.random.RandomState(0)
    imgs_a = [rs.randint(0, 255, (80, 80, 3), np.uint8) for _ in range(6)]
    imgs_b = [rs.randint(0, 255, (80, 80, 3), np.uint8) for _ in range(6)]
    fa, fb = ex.extract(imgs_a), ex.extract(imgs_b)
    assert fa.shape == (6, 2048) and np.isfinite(fa).all()
    fid = frechet_distance(*compute_statistics(fa), *compute_statistics(fb))
    assert np.isfinite(fid) and fid >= 0
    # same images -> FID 0
    same = frechet_distance(*compute_statistics(fa), *compute_statistics(fa))
    assert abs(same) < 1e-6

    probs = ex.predict_proba(imgs_a)
    assert probs.shape == (6, 1008)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)

    # non-degeneracy: lecun-init + pass-through BN collapses activations to
    # ~0 by pool3 (variance halves per ReLU layer), giving FID=0 for ANY two
    # sets and uniform softmax (ISC=1).  seeded() He-rescales conv kernels;
    # assert features carry variance and distinct distributions separate.
    assert fa.std() > 0.05, "seeded inception features collapsed"
    flat = [np.full((80, 80, 3), 128, np.uint8) for _ in range(6)]
    ff = ex.extract(flat)
    assert np.linalg.norm(fa.mean(0) - ff.mean(0)) > 1.0
