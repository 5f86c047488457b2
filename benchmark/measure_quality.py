"""Measure THIS framework's quality numbers and write
benchmark/artifacts/quality_ours.csv.

Three modes:

1. (default) **Trained-from-scratch regression** — trains a tiny MUSE stack
   on the colored-squares distribution, generates, and scores FID (seeded
   CLIP features), prompt->color accuracy, and CLIP-score.  Fully offline,
   deterministic, every number measured by this run.  This is the quality
   loop the reference closes with 10k-COCO hub-checkpoint curves
   (/root/reference/benchmark/model_quality.py:18-88), scaled to what runs
   without network access.

2. ``--distill`` — measured step/guidance-distillation protocol: trains the
   tiny teacher, self-distills it to half the decode steps with guidance
   folded in (training/distill.py), and scores teacher-at-N /
   teacher-at-K / distilled-student-at-K against the same real set.

3. ``--pipeline DIR --captions FILE --real-dir DIR`` — score an actual
   pipeline checkpoint: generate images for the captions, compute FID
   against the real dir and CLIP score against the captions.  With
   ``--clip-model`` pointing at real CLIP weights this produces the
   published-protocol CLIP-FID / CLIP-score; without it the seeded-extractor
   fallback is used and labeled as such.

Usage:
  python benchmark/measure_quality.py [--train-steps 200] [--n-eval 30]
  python benchmark/measure_quality.py --pipeline ckpt/ --captions c.txt \
      --real-dir real/ [--clip-model clip_dir/] [--timesteps 12] [--cfg 8]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARTIFACTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts")


def write_rows(rows, out_path):
    """Merge new rows into the artifact CSV: a row replaces an existing row
    with the same (protocol, metric); rows from other protocols/runs are
    kept, so scaled re-runs accumulate instead of erasing each other."""
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    fields = ["protocol", "metric", "value", "extractor", "n_images", "notes"]
    existing = []
    if os.path.exists(out_path):
        with open(out_path, newline="") as f:
            existing = list(csv.DictReader(f))
    new_keys = {(r["protocol"], r["metric"]) for r in rows}
    merged = [r for r in existing
              if (r.get("protocol"), r.get("metric")) not in new_keys] + rows
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, extrasaction="ignore")
        w.writeheader()
        for r in merged:
            w.writerow(r)
    print(f"wrote {out_path} ({len(rows)} new/updated rows, "
          f"{len(merged)} total)")


def regression_mode(args):
    from open_muse_tpu.eval.quality_regression import run_quality_regression

    m = run_quality_regression(train_steps=args.train_steps,
                               vq_steps=args.vq_steps, n_eval=args.n_eval,
                               seed=args.seed,
                               inception=args.inception_seeded)
    proto = f"tiny-regression(seed={args.seed},steps={args.train_steps})"
    seeded = "clip_vit_seeded(NOT a published metric; deterministic)"
    rows = [
        dict(protocol=proto, metric="fid_clipfeat_seeded_trained",
             value=round(m["fid_clipfeat_seeded_trained"], 3),
             extractor=seeded, n_images=int(m["n_eval"]),
             notes="trained model vs held-out real set"),
        dict(protocol=proto, metric="fid_clipfeat_seeded_untrained",
             value=round(m["fid_clipfeat_seeded_untrained"], 3),
             extractor=seeded, n_images=int(m["n_eval"]),
             notes="untrained baseline (must be >> trained)"),
        dict(protocol=proto, metric="color_accuracy_trained",
             value=round(m["color_accuracy_trained"], 3), extractor="exact",
             n_images=int(m["n_eval"]),
             notes="text-image agreement; chance=0.33"),
        dict(protocol=proto, metric="color_accuracy_untrained",
             value=round(m["color_accuracy_untrained"], 3), extractor="exact",
             n_images=int(m["n_eval"]), notes="chance baseline"),
        dict(protocol=proto, metric="clip_score_seeded_trained",
             value=round(m["clip_score_seeded_trained"], 3), extractor=seeded,
             n_images=int(m["n_eval"]),
             notes="CLIP-score machinery end-to-end"),
        dict(protocol=proto, metric="train_loss",
             value=round(m["train_loss_last"], 4), extractor="n/a",
             n_images=0,
             notes=f"from {m['train_loss_first']:.4f} at step 0"),
    ]
    if args.inception_seeded:
        inc_label = "inception_v3_seeded(NOT a published metric; deterministic)"
        rows += [
            dict(protocol=proto, metric="fid_inception_seeded_trained",
                 value=round(m["fid_inception_seeded_trained"], 3),
                 extractor=inc_label, n_images=int(m["n_eval"]),
                 notes="reference FID protocol graph, seeded weights"),
            dict(protocol=proto, metric="fid_inception_seeded_untrained",
                 value=round(m["fid_inception_seeded_untrained"], 3),
                 extractor=inc_label, n_images=int(m["n_eval"]),
                 notes="untrained baseline (must be >> trained)"),
            dict(protocol=proto, metric="isc_seeded_trained",
                 value=round(m["isc_seeded_trained"], 3),
                 extractor=inc_label, n_images=int(m["n_eval"]),
                 notes=f"std {m['isc_seeded_trained_std']:.3f}"),
        ]
    ok = (m["fid_clipfeat_seeded_trained"] < m["fid_clipfeat_seeded_untrained"]
          and m["color_accuracy_trained"] > 0.9)
    print(f"regression {'PASS' if ok else 'FAIL'}: "
          f"FID {m['fid_clipfeat_seeded_trained']:.2f} (trained) vs "
          f"{m['fid_clipfeat_seeded_untrained']:.2f} (untrained), "
          f"color acc {m['color_accuracy_trained']:.2f} vs "
          f"{m['color_accuracy_untrained']:.2f}")
    return rows, ok


def distill_mode(args):
    from open_muse_tpu.eval.quality_regression import run_distill_regression

    m = run_distill_regression(
        train_steps=args.train_steps, vq_steps=args.vq_steps,
        distill_steps=args.distill_steps, n_eval=args.n_eval, seed=args.seed,
        teacher_timesteps=args.teacher_timesteps, step_ratio=args.step_ratio,
        guidance_scale=args.cfg)
    proto = (f"distill-regression(seed={args.seed},steps={args.train_steps},"
             f"N={args.teacher_timesteps}->K={int(m['student_timesteps'])},"
             f"cfg={args.cfg})")
    seeded = "clip_vit_seeded(NOT a published metric; deterministic)"
    n = int(m["n_eval"])

    def row(metric, value, extractor, notes):
        return dict(protocol=proto, metric=metric, value=round(value, 3),
                    extractor=extractor, n_images=n, notes=notes)

    rows = [
        row("fid_teacher_full", m["fid_teacher_full"], seeded,
            f"teacher at {args.teacher_timesteps} steps (quality target)"),
        row("fid_teacher_k", m["fid_teacher_k"], seeded,
            f"teacher at {int(m['student_timesteps'])} steps "
            f"(undistilled step-cut baseline)"),
        row("fid_student_k", m["fid_student_k"], seeded,
            f"distilled student at {int(m['student_timesteps'])} steps, "
            f"no CFG"),
        row("color_accuracy_teacher_full", m["color_accuracy_teacher_full"],
            "exact", "chance=0.33"),
        row("color_accuracy_teacher_k", m["color_accuracy_teacher_k"],
            "exact", "undistilled step-cut baseline"),
        row("color_accuracy_student_k", m["color_accuracy_student_k"],
            "exact", "distilled student, no CFG"),
        dict(protocol=proto, metric="distill_loss", n_images=0,
             value=round(m["distill_loss_last"], 4), extractor="n/a",
             notes=f"from {m['distill_loss_first']:.4f} over "
                   f"{int(m['distill_steps'])} steps"),
    ]
    # machinery gate: the student must stay well above chance and the
    # distill loss must move
    ok = (m["color_accuracy_student_k"] >= 0.7
          and m["distill_loss_last"] < m["distill_loss_first"])
    print(f"distill {'PASS' if ok else 'FAIL'}: "
          f"acc student_k={m['color_accuracy_student_k']:.2f} vs "
          f"teacher_k={m['color_accuracy_teacher_k']:.2f} / "
          f"teacher_full={m['color_accuracy_teacher_full']:.2f}; "
          f"fid student_k={m['fid_student_k']:.2f} vs "
          f"teacher_k={m['fid_teacher_k']:.2f} / "
          f"teacher_full={m['fid_teacher_full']:.2f}")
    return rows, ok


def distill_midscale_mode(args):
    """Round-5 verdict item 3: the mid-scale discriminative distillation
    protocol (eval/distill_midscale) — 8-layer/hidden-256 stack on 256 real
    image tokens, a random-layout world where the step count measurably
    matters, and an in-run split-half noise floor.  The claim passes when
    the step-cut control is worse than the student by more than the floor."""
    from open_muse_tpu.eval.distill_midscale import run_distill_midscale

    m = run_distill_midscale(
        train_steps=args.train_steps, vq_steps=args.vq_steps,
        distill_steps=args.distill_steps, n_eval=args.n_eval,
        seed=args.seed, teacher_timesteps=args.teacher_timesteps,
        step_ratio=args.step_ratio, guidance_scale=args.cfg,
        batch=args.batch_size, probe_every=args.probe_every,
        soft_weight=args.soft_weight,
        distill_eval_every=args.distill_eval_every)
    proto = (f"distill-midscale(seed={args.seed},steps={args.train_steps},"
             f"{int(m['layers'])}L/h{int(m['hidden'])},256tok,"
             f"N={args.teacher_timesteps}->K={int(m['student_timesteps'])},"
             f"cfg={args.cfg})")
    seeded = "clip_vit_seeded(NOT a published metric; deterministic)"
    n = int(m["n_eval"])

    def row(metric, value, extractor, notes):
        return dict(protocol=proto, metric=metric, value=round(value, 3),
                    extractor=extractor, n_images=n, notes=notes)

    rows = [
        row("fid_teacher_full", m["fid_teacher_full"], seeded,
            f"teacher at {args.teacher_timesteps} steps cfg={args.cfg} "
            f"(quality target)"),
        row("fid_teacher_k", m["fid_teacher_k"], seeded,
            f"UNDISTILLED teacher at {int(m['student_timesteps'])} steps "
            f"no CFG (the step-cut control the metric must separate)"),
        row("fid_student_k", m["fid_student_k"], seeded,
            f"distilled EMA student at {int(m['student_timesteps'])} steps, "
            f"no CFG ({args.distill_steps} distill steps, "
            f"soft_weight={args.soft_weight})"),
        row("fid_split_half_floor", m["fid_split_half_floor"], seeded,
            "two real half-sets (estimator noise floor)"),
        row("color_accuracy_teacher_full", m["color_accuracy_teacher_full"],
            "exact", "chance=0.167 (6 colors)"),
        row("color_accuracy_teacher_k", m["color_accuracy_teacher_k"],
            "exact", "undistilled step-cut control"),
        row("color_accuracy_student_k", m["color_accuracy_student_k"],
            "exact", "distilled student, no CFG"),
    ]
    margin = m["fid_teacher_k"] - m["fid_student_k"]
    floor = m["fid_split_half_floor"]
    ok = margin > floor and m["fid_student_k"] < m["fid_teacher_k"]
    print(f"distill-midscale {'PASS' if ok else 'FAIL'}: "
          f"fid teacher_full={m['fid_teacher_full']:.3f} "
          f"teacher_k={m['fid_teacher_k']:.3f} "
          f"student_k={m['fid_student_k']:.3f} "
          f"(control-vs-student margin {margin:+.3f} vs floor {floor:.3f})")
    return rows, ok


def _load_captions(path, n):
    with open(path) as f:
        captions = [line.strip() for line in f if line.strip()]
    if len(captions) < n:
        # cycle to n (images still differ: fresh sampling key per batch)
        captions = captions * (n // len(captions) + 1)
    return captions[:n]


def _generate_set(pipe, captions, timesteps, cfg, batch_size, seed):
    import jax

    images = []
    key = jax.random.PRNGKey(seed)
    for start in range(0, len(captions), batch_size):
        chunk = captions[start:start + batch_size]
        key, sub = jax.random.split(key)
        images.extend(pipe(list(chunk), timesteps=timesteps,
                           guidance_scale=cfg, key=sub))
    return images


def distill_compare_mode(args):
    """Research-scale distillation quality (round-4 verdict item 3): the
    SAME-architecture teacher (N-step CFG decode) vs its distilled student
    (N/step_ratio-step no-CFG decode, training/distill.py) at pipeline
    scale.  The score is FID between the two generated sets — how far the
    4x-cheaper student's output distribution drifts from the teacher it was
    distilled from — with the teacher's split-half self-FID as the
    estimator's noise floor at this n."""
    from open_muse_tpu.eval.fid import (CLIPFeatureExtractor,
                                        fid_between_image_sets)
    from open_muse_tpu.models.transformer_v2 import MaskGiTUViT_v2
    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    pipe = PipelineMuse.from_pretrained(args.pipeline)
    captions = _load_captions(args.captions, args.n_eval)
    k_steps = max(1, args.timesteps // args.step_ratio)

    print(f"teacher set: {len(captions)} images at {args.timesteps}-step "
          f"cfg={args.cfg}")
    teacher_images = _generate_set(pipe, captions, args.timesteps, args.cfg,
                                   args.batch_size, args.seed)
    # CONTROL (round-4): the undistilled step-cut baseline — the TEACHER
    # model run at the student's serving config (K steps, no CFG).  Its FID
    # against the teacher set is the separation the metric must show for the
    # student's number to mean anything; if the control also lands at the
    # noise floor, the extractor is saturated at this scale and the rows say
    # so instead of claiming a win.
    print(f"step-cut control set: {len(captions)} images at {k_steps}-step "
          f"no-CFG (teacher weights)")
    control_images = _generate_set(pipe, captions, k_steps, 0.0,
                                   args.batch_size, args.seed + 2)
    print(f"student set: {len(captions)} images at {k_steps}-step no-CFG")
    pipe.transformer = MaskGiTUViT_v2.from_pretrained(args.student_transformer)
    student_images = _generate_set(pipe, captions, k_steps, 0.0,
                                   args.batch_size, args.seed + 1)

    extractors = [(CLIPFeatureExtractor.seeded(seed=1234),
                   "clip_vit_seeded(NOT a published metric; deterministic)",
                   "fid_clipfeat_seeded")]
    if args.inception_seeded:
        from open_muse_tpu.eval.inception import InceptionFeatureExtractor

        extractors.append((InceptionFeatureExtractor.seeded(seed=1234),
                           "inception_v3_seeded(NOT a published metric; "
                           "deterministic)", "fid_inception_seeded"))

    base = os.path.basename(os.path.normpath(args.pipeline))
    proto = (f"distill-research({base},N={args.timesteps}cfg{args.cfg}"
             f"->K={k_steps}nocfg)")
    n = len(captions)
    rows = []
    fid_ts_primary = None
    for extractor, label, metric in extractors:
        fid_ts = fid_between_image_sets(teacher_images, student_images,
                                        extractor)
        fid_control = fid_between_image_sets(teacher_images, control_images,
                                             extractor)
        half = n // 2
        floor = fid_between_image_sets(teacher_images[:half],
                                       teacher_images[half:2 * half],
                                       extractor)
        if fid_ts_primary is None:
            fid_ts_primary = fid_ts
        separated = fid_control > max(10 * max(floor, 1e-6), 0.05)
        sens = ("metric separates at this scale" if separated else
                "WARNING: step-cut control at noise floor too - extractor "
                "saturated at this scale, rows are not evidence of quality")
        rows.append(dict(protocol=proto, metric=f"{metric}_teacher_vs_student",
                         value=round(fid_ts, 3), extractor=label, n_images=n,
                         notes=f"distilled {k_steps}-step no-CFG student vs "
                               f"its {args.timesteps}-step CFG teacher; "
                               f"{sens}"))
        rows.append(dict(protocol=proto,
                         metric=f"{metric}_teacher_vs_stepcut_control",
                         value=round(fid_control, 3), extractor=label,
                         n_images=n,
                         notes=f"UNDISTILLED teacher at {k_steps}-step no-CFG "
                               "(the separation the metric must show)"))
        rows.append(dict(protocol=proto, metric=f"{metric}_teacher_selfhalf",
                         value=round(floor, 3), extractor=label,
                         n_images=2 * half,
                         notes="teacher split-half (estimator noise floor)"))
        print(f"distill-research: {metric} teacher-vs-student={fid_ts:.3f} "
              f"step-cut-control={fid_control:.3f} "
              f"(teacher self-half floor {floor:.3f}, n={n}) [{sens}]")
    return rows, fid_ts_primary is not None


def pipeline_mode(args):
    import jax

    from open_muse_tpu.eval.clip_score import clip_score
    from open_muse_tpu.eval.fid import (CLIPFeatureExtractor,
                                        fid_between_image_sets,
                                        load_image_dir)
    from open_muse_tpu.models.clip_vision import CLIPScorer
    from open_muse_tpu.pipelines.pipeline_muse import PipelineMuse

    pipe = PipelineMuse.from_pretrained(args.pipeline)
    with open(args.captions) as f:
        captions = [line.strip() for line in f if line.strip()]
    if len(captions) < args.n_eval:
        # cycle the prompt list to reach n_eval (images still differ: a
        # fresh sampling key per batch); the reference's COCO protocol has
        # 10k unique captions, offline prompt files are smaller
        captions = (captions * (args.n_eval // len(captions) + 1))
    captions = captions[: args.n_eval]
    images = []
    key = jax.random.PRNGKey(args.seed)
    for start in range(0, len(captions), args.batch_size):
        chunk = captions[start:start + args.batch_size]
        key, sub = jax.random.split(key)
        images.extend(pipe(list(chunk), timesteps=args.timesteps,
                           guidance_scale=args.cfg, key=sub))

    if args.clip_model:
        scorer = CLIPScorer.from_pretrained(args.clip_model)
        extractor = CLIPFeatureExtractor(scorer.vision)
        label = f"clip({args.clip_model})"
        fid_metric, cs_metric = "fid_clip", "clip_score"
    else:
        scorer = None
        extractor = CLIPFeatureExtractor.seeded(seed=1234)
        label = "clip_vit_seeded(NOT a published metric; deterministic)"
        fid_metric, cs_metric = "fid_clipfeat_seeded", "clip_score_seeded"

    proto = (f"pipeline({os.path.basename(os.path.normpath(args.pipeline))},"
             f"cfg={args.cfg},steps={args.timesteps})")
    rows = []
    # load the real set ONCE for both extractors (at n>=1000 a second disk
    # read + PIL decode pass is a full duplicate of the first)
    real = (load_image_dir(args.real_dir, limit=len(images))
            if args.real_dir else None)
    if args.real_dir:
        fid = fid_between_image_sets(real, images, extractor)
        rows.append(dict(protocol=proto, metric=fid_metric,
                         value=round(fid, 3), extractor=label,
                         n_images=len(images), notes=f"vs {args.real_dir}"))
        print(f"pipeline quality: {fid_metric}={fid:.2f} "
              f"over {len(images)} images")
    if args.self_fid:
        # split-half self-FID: two disjoint same-distribution halves — the
        # FID estimator's noise floor at this n (should be small); protocol-
        # scale machinery evidence when no real set is reachable offline
        half = len(images) // 2
        sfid = fid_between_image_sets(images[:half], images[half:2 * half],
                                      extractor)
        rows.append(dict(protocol=proto, metric=f"{fid_metric}_selfhalf",
                         value=round(sfid, 3), extractor=label,
                         n_images=2 * half,
                         notes="split-half self-FID (estimator noise floor)"))
        print(f"pipeline quality: self-half {fid_metric}={sfid:.2f} "
              f"(n={2 * half})")
    if scorer is not None:
        cs = clip_score(scorer, images, captions)
        rows.append(dict(protocol=proto, metric=cs_metric,
                         value=round(cs, 3), extractor=label,
                         n_images=len(images), notes="vs captions"))

    inc = None
    if args.inception_weights:
        from open_muse_tpu.eval.inception import InceptionFeatureExtractor

        inc = InceptionFeatureExtractor.from_torch_checkpoint(
            args.inception_weights)
        inc_label = inc.label
        inc_fid_metric = "fid_inception"
    elif args.inception_seeded:
        from open_muse_tpu.eval.inception import InceptionFeatureExtractor

        inc = InceptionFeatureExtractor.seeded(seed=1234)
        inc_label = ("inception_v3_seeded(NOT a published metric; "
                     "deterministic)")
        inc_fid_metric = "fid_inception_seeded"
    if inc is not None:
        from open_muse_tpu.eval.inception_score import (
            inception_score_from_logits)
        import numpy as np

        if args.real_dir:
            ifid = fid_between_image_sets(real, images, inc)
            rows.append(dict(protocol=proto, metric=inc_fid_metric,
                             value=round(ifid, 3), extractor=inc_label,
                             n_images=len(images),
                             notes=f"vs {args.real_dir}"))
        if args.self_fid:
            half = len(images) // 2
            isfid = fid_between_image_sets(images[:half],
                                           images[half:2 * half], inc)
            rows.append(dict(protocol=proto,
                             metric=f"{inc_fid_metric}_selfhalf",
                             value=round(isfid, 3), extractor=inc_label,
                             n_images=2 * half,
                             notes="split-half self-FID"))
        probs = inc.predict_proba(images)
        isc_mean, isc_std = inception_score_from_logits(
            np.log(probs + 1e-20))
        isc_metric = ("isc" if args.inception_weights else "isc_seeded")
        rows.append(dict(protocol=proto, metric=isc_metric,
                         value=round(isc_mean, 3), extractor=inc_label,
                         n_images=len(images), notes=f"std {isc_std:.3f}"))
    return rows, True


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline", default=None)
    p.add_argument("--captions", default=None)
    p.add_argument("--real-dir", default=None)
    p.add_argument("--clip-model", default=None)
    p.add_argument("--inception-weights", default=None,
                   help="torchvision/pytorch-fid inception .pth: enables the "
                        "published FID/ISC protocol (fid_inception, isc)")
    p.add_argument("--inception-seeded", action="store_true",
                   help="also score through the InceptionV3 graph with "
                        "seeded weights (regression numbers)")
    p.add_argument("--self-fid", action="store_true",
                   help="score split-half self-FID of the generated set "
                        "(FID-estimator noise floor; for offline runs with "
                        "no real set)")
    p.add_argument("--distill", action="store_true",
                   help="measured step/guidance-distillation protocol: "
                        "teacher_full vs teacher_k vs distilled student_k "
                        "(training/distill.py)")
    p.add_argument("--distill-midscale", action="store_true",
                   help="mid-scale discriminative distillation protocol "
                        "(eval/distill_midscale): 8L/h256 on 256 real "
                        "tokens, random-layout world, split-half floor")
    p.add_argument("--student-transformer", default=None,
                   help="with --pipeline: distilled transformer checkpoint "
                        "dir -> research-scale teacher-vs-student FID "
                        "(distill_compare_mode)")
    p.add_argument("--distill-steps", type=int, default=120)
    p.add_argument("--teacher-timesteps", type=int, default=6)
    p.add_argument("--step-ratio", type=int, default=2)
    p.add_argument("--train-steps", type=int, default=200)
    p.add_argument("--vq-steps", type=int, default=150)
    p.add_argument("--n-eval", type=int, default=30)
    p.add_argument("--timesteps", type=int, default=12)
    p.add_argument("--cfg", type=float, default=8.0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--probe-every", type=int, default=0,
                   help="distill-midscale: log teacher color accuracy at "
                        "cfg 0/2 every N training steps (0 = off)")
    p.add_argument("--soft-weight", type=float, default=0.5,
                   help="distill-midscale: weight of the guidance-"
                        "distillation KL term (distill.py soft_weight)")
    p.add_argument("--distill-eval-every", type=int, default=0,
                   help="distill-midscale: score the EMA student every N "
                        "distill steps (0 = final only)")
    p.add_argument("--out", default=os.path.join(ARTIFACTS,
                                                 "quality_ours.csv"))
    args = p.parse_args(argv)

    if args.pipeline and args.student_transformer:
        if not args.captions:
            p.error("--student-transformer mode needs --captions")
        rows, ok = distill_compare_mode(args)
    elif args.pipeline:
        if not args.captions or not (args.real_dir or args.self_fid):
            p.error("--pipeline mode needs --captions and either "
                    "--real-dir or --self-fid")
        rows, ok = pipeline_mode(args)
    elif args.distill_midscale:
        # protocol-scale defaults when the caller left the tiny-protocol
        # argparse defaults in place
        if args.train_steps == 200:
            args.train_steps = 2500
        if args.vq_steps == 150:
            args.vq_steps = 600
        if args.distill_steps == 120:
            args.distill_steps = 700
        if args.n_eval == 30:
            args.n_eval = 240
        if args.teacher_timesteps == 6:
            args.teacher_timesteps = 12
        if args.batch_size == 8:
            args.batch_size = 16
        if args.cfg == 8.0:
            args.cfg = 4.0
        rows, ok = distill_midscale_mode(args)
    elif args.distill:
        # --cfg doubles as the teacher guidance scale here; the argparse
        # default (8.0) is a hub-scale setting — the tiny teacher is trained
        # without cond dropout, so default to a gentle 2.0 unless overridden
        if args.cfg == 8.0:
            args.cfg = 2.0
        rows, ok = distill_mode(args)
    else:
        rows, ok = regression_mode(args)
    write_rows(rows, args.out)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
