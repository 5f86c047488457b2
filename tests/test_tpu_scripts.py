"""Launcher dry-run tests: every tpu_scripts/*.sh must execute its full
command plan under --dry-run without gcloud or a pod (VERDICT round 1: the
launchers had never been exercised)."""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "tpu_scripts")


def _run(script, *args):
    proc = subprocess.run(
        [os.path.join(SCRIPTS, script), "--dry-run", *args],
        capture_output=True, text=True, timeout=60, cwd=REPO)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def test_launch_pod_dry_run():
    out = _run("launch_pod.sh", "my-tpu", "us-central2-b",
               "configs/research_run_512.yaml", "training.batch_size=512")
    assert "DRY-RUN: gcloud compute tpus tpu-vm scp" in out
    assert "train_muse" in out
    assert "config=configs/research_run_512.yaml" in out
    assert "training.batch_size=512" in out
    assert "--worker=all" in out


def test_pre_encode_pod_dry_run():
    out = _run("pre_encode_pod.sh", "my-tpu", "us-central2-b",
               "gs://bucket/{00000..00009}.tar", "gs://bucket/out",
               "checkpoints/vqgan", "checkpoints/clip")
    # deterministic 2-host plan: one ssh per worker with disjoint task ids
    assert out.count("pre_encode.py") == 2
    assert "--task-id 0 --num-tasks 2" in out
    assert "--task-id 1 --num-tasks 2" in out


def test_fid_pod_dry_run():
    out = _run("fid_pod.sh", "my-tpu", "us-central2-b", "models/muse-512",
               "captions/coco.txt", "gs://bucket/fid", "real_images/")
    assert out.count("calculate_fid.py") == 3  # 2 generate + 1 score
    assert "--task-id 1 --num-tasks 2" in out
    assert "--real-dir" in out


def test_benchmark_pod_dry_run():
    out = _run("benchmark_pod.sh", "my-tpu", "us-central2-b")
    assert "muse_perf.py --fresh" in out
    assert "artifacts/all.csv" in out


def test_launch_pod_dry_run_distill_module():
    """MUSE_TRAIN_MODULE swaps the trainer CLI: pod distillation reuses the
    same launcher."""
    env = dict(os.environ,
               MUSE_TRAIN_MODULE="open_muse_tpu.training.distill")
    proc = subprocess.run(
        [os.path.join(SCRIPTS, "launch_pod.sh"), "--dry-run", "my-tpu",
         "us-central2-b", "configs/distill.yaml"],
        capture_output=True, text=True, timeout=60, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr
    assert "open_muse_tpu.training.distill" in proc.stdout
    assert "config=configs/distill.yaml" in proc.stdout
    assert "train_muse" not in proc.stdout
