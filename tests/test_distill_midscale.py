"""Mid-scale distillation protocol (eval/distill_midscale): world/scoring
unit tests plus a down-scaled end-to-end smoke of the full protocol (every
stage runs; the discriminative separation claim itself is only meaningful at
the real protocol scale, measured on-chip by benchmark/measure_quality.py
--distill-midscale)."""

import numpy as np
import pytest

from open_muse_tpu.eval.distill_midscale import (MID_COLORS,
                                                 make_scene_images,
                                                 scene_color_accuracy)


@pytest.mark.fast
def test_scene_images_shapes_and_randomized_layout():
    rs = np.random.RandomState(0)
    imgs = make_scene_images(["red", "blue", "red"], rs)
    assert imgs.shape == (3, 64, 64, 3)
    # two red squares from the same stream land at different positions
    assert not np.allclose(imgs[0], imgs[2], atol=0.1)


@pytest.mark.fast
def test_scene_color_accuracy_scores_square_not_background():
    rs = np.random.RandomState(1)
    colors = list(MID_COLORS)
    imgs = list(make_scene_images(colors, rs))
    prompts = [f"a {c} square" for c in colors]
    assert scene_color_accuracy(imgs, prompts) == 1.0
    # shifted prompts -> wrong colors
    wrong = prompts[1:] + prompts[:1]
    assert scene_color_accuracy(imgs, wrong) == 0.0


def test_midscale_protocol_smoke():
    """Every stage of the protocol executes at toy scale and returns the
    full metric dict (separation is NOT asserted here — that is the
    measured, scale-dependent claim)."""
    from open_muse_tpu.eval.distill_midscale import run_distill_midscale

    m = run_distill_midscale(train_steps=3, vq_steps=3, distill_steps=2,
                             n_eval=6, hidden=128, layers=1, batch=6,
                             teacher_timesteps=4, step_ratio=2,
                             probe_every=2,  # covers the in-training probe
                             log=lambda *a: None)
    for k in ("fid_teacher_full", "fid_teacher_k", "fid_student_k",
              "fid_split_half_floor", "color_accuracy_student_k"):
        assert np.isfinite(m[k])
    assert m["student_timesteps"] == 2.0
