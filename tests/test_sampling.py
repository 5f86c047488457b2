"""Golden-value tests for the sampling math (reference muse/sampling.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_muse_tpu.ops import sampling


def test_cosine_schedule_values():
    t = jnp.array([0.0, 0.25, 0.5, 0.75, 1.0])
    expected = np.cos(np.array([0.0, 0.25, 0.5, 0.75, 1.0]) * math.pi * 0.5)
    np.testing.assert_allclose(sampling.cosine_schedule(t), expected, atol=1e-6)


def test_linear_schedule_clips():
    t = jnp.array([0.0, 0.5, 1.0])
    np.testing.assert_allclose(sampling.linear_schedule(t), [1.0, 0.5, 1e-6], atol=1e-8)


def test_pow_schedule():
    t = jnp.array([0.0, 0.5, 1.0])
    np.testing.assert_allclose(sampling.pow_schedule(t, "pow2"), [1.0, 0.75, 1e-6], atol=1e-6)


def test_sigmoid_schedule_monotone_and_bounds():
    t = jnp.linspace(0, 1, 11)
    out = np.asarray(sampling.sigmoid_schedule(t))
    assert out.max() <= 1.0 and out.min() >= 1e-6
    assert np.all(np.diff(out) <= 1e-6)  # decreasing mask ratio


def test_get_mask_schedule_registry():
    assert sampling.get_mask_schedule("cosine") is sampling.cosine_schedule
    assert sampling.get_mask_chedule("linear") is sampling.linear_schedule
    fn = sampling.get_mask_schedule("pow0.5")
    np.testing.assert_allclose(fn(jnp.array(0.25)), 0.5, atol=1e-6)
    with pytest.raises(ValueError):
        sampling.get_mask_schedule("nope")


def test_top_k_keeps_correct_count():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 100).astype(np.float32))
    out = sampling.top_k(logits, thres=0.9)
    kept = np.isfinite(np.asarray(out)).sum(axis=-1)
    assert (kept == 10).all()
    # kept values are the top-10 per row
    ref = np.sort(np.asarray(logits), axis=-1)[..., -10:]
    out_np = np.asarray(out)
    got = np.sort(np.where(np.isfinite(out_np), out_np, -np.inf), axis=-1)[..., -10:]
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_mask_by_random_topk_masks_exact_count_at_zero_temp():
    key = jax.random.PRNGKey(0)
    probs = jax.random.uniform(key, (4, 64), minval=0.01, maxval=1.0)
    mask_len = jnp.full((4, 1), 7)
    masking = sampling.mask_by_random_topk(key, mask_len, probs, temperature=0.0)
    counts = np.asarray(masking).sum(axis=-1)
    # at T=0 confidence==log(p): exactly mask_len lowest-prob entries masked
    np.testing.assert_array_equal(counts, 7)
    # masked entries are indeed the smallest probabilities
    probs_np = np.asarray(probs)
    for row, m in zip(probs_np, np.asarray(masking)):
        assert row[m].max() < row[~m].min()


def test_gumbel_sample_zero_temperature_is_argmax_dominated():
    key = jax.random.PRNGKey(1)
    logits = jnp.asarray([[0.0, 100.0, 0.0]])
    idx = sampling.gumbel_sample(key, logits, temperature=1e-9)
    assert int(idx[0]) == 1


@pytest.mark.parametrize("method", ["cosine", "linear", "pow2", "sigmoid"])
def test_schedules_match_reference(method):
    """Bit-parity with the torch reference implementation."""
    torch = pytest.importorskip("torch")
    from tests.conftest import has_reference, import_reference_muse

    if not has_reference():
        pytest.skip("reference unavailable")
    ref_muse = import_reference_muse()
    from muse import sampling as ref_sampling

    ref_fn = ref_sampling.get_mask_chedule(method)
    our_fn = sampling.get_mask_schedule(method)
    t = np.linspace(0, 1, 17).astype(np.float32)
    ref = ref_fn(torch.tensor(t)).numpy()
    ours = np.asarray(our_fn(jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
