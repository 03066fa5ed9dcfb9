"""End-to-end CLI tool chain over a synthetic BEAT2 directory + tiny config:
train → visualize (inference + result export) → longform → evaluate.

This is the closest thing to the reference's production smoke path
(tools/train.py → tools/visualize.py → tools/evaluate.py) and runs
hermetically in CI."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_dataset_build import make_raw_beat2

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/raggesture_beatx/tiny_smoke.py")


def run_tool(args, cwd, extra_env=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".jax_cache")
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"tool failed: {' '.join(args)}\nstdout:\n{proc.stdout[-4000:]}"
            f"\nstderr:\n{proc.stderr[-4000:]}")
    return proc


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    """A working directory with synthetic raw data + config overrides."""
    ws = str(tmp_path_factory.mktemp("ws"))
    root = os.path.join(ws, "beat2")
    make_raw_beat2(root, [
        ("2_scott_0_1_1", "train"),
        ("2_scott_0_2_2", "train"),
        ("2_scott_0_3_3", "test"),
        # shorter second test clip: ragged chunk counts exercise the
        # wave-batched long-form path's tail padding (--clip-batch 2)
        ("2_scott_0_4_4", "test", 6),
    ], n_sec=12)
    return ws, root


def _opts(ws, root):
    return ["--options",
            f"data.train.data_path={root}",
            f"data.val.data_path={root}",
            f"data.test.data_path={root}",
            f"data.train.cache_path={ws}/cache",
            f"data.val.cache_path={ws}/cache",
            f"data.test.cache_path={ws}/cache",
            "data.train.allow_fake_contacts=True",
            "data.val.allow_fake_contacts=True",
            "data.test.allow_fake_contacts=True",
            f"model.model.retrieval_cfg.cache_path={ws}/retr_cache"]


@pytest.mark.slow
def test_tool_chain(workspace):
    ws, root = workspace
    tools = os.path.join(REPO, "tools")
    workdir = os.path.join(ws, "work")

    # 1. train 2 tiny epochs
    run_tool([f"{tools}/train.py", CFG, "--work-dir", workdir,
              "--seed", "0", "--device-batch-size", "4"] + _opts(ws, root),
             cwd=REPO)
    assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))
    ckpts = os.path.join(workdir, "checkpoints")
    epochs = sorted(os.listdir(ckpts))
    assert epochs, "no checkpoints written"

    # 2. export params-only artifact from the final checkpoint state
    #    (tools consume orbax params; train saves full TrainState)
    export = os.path.join(ws, "params")
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
import jax
# self-pin: the JAX_PLATFORMS env var alone does not stop a sitecustomize-
# registered remote-TPU plugin from initializing during backend discovery,
# which HANGS when the tunnel is down (CLAUDE.md); tools pin via utils/env
jax.config.update("jax_platforms", "cpu")
from raggesture_tpu.config import Config
from raggesture_tpu.builders import build_architecture
from raggesture_tpu.models.architecture import init_params
from raggesture_tpu.datasets.fixtures import synthetic_batch
from raggesture_tpu.train.loop import OptimConfig, create_train_state
from raggesture_tpu.train.checkpoint import CheckpointManager, save_params
cfg = Config.fromfile({CFG!r})
model = build_architecture(cfg.model)
b = synthetic_batch(seed=0, batch=1, frames=30, audio_frames=8)
params = init_params(model, jax.random.PRNGKey(0), b)
state, _ = create_train_state(model, params, OptimConfig(total_steps=4))
mgr = CheckpointManager({workdir!r}, interval=1)
state, meta = mgr.restore(state)
save_params({export!r}, state.params, meta={{"epoch": meta["epoch"]}})
print("exported")
"""
    run_tool(["-c", code], cwd=REPO)

    # 3. inference + result export (with retrieval + inversion + guidance)
    out_dir = os.path.join(ws, "results")
    run_tool([f"{tools}/visualize.py", CFG, export, "--out-dir", out_dir,
              "--retrieval-method", "gesture_type", "--use-inversion",
              "--insertion-guidance", "--guidance-iters", "constant",
              "--test-batchsize", "2", "--max-batches", "1",
              "--seed", "0"] + _opts(ws, root), cwd=REPO)
    import glob

    preds = glob.glob(os.path.join(out_dir, "**", "pred_motion.npz"),
                      recursive=True)
    assert preds, "no predictions written"
    d = np.load(preds[0], allow_pickle=True)
    assert d["poses"].shape[1] == 165
    assert d["poses"].shape[0] == 60  # 30 frames @15fps -> 60 @30fps
    assert str(d["model"]) == "smplx2020"
    gt = os.path.join(os.path.dirname(preds[0]), "gt_motion.npz")
    assert os.path.exists(gt)

    # 4. evaluation over the result dir (no FGD weights / SMPL-X asset:
    #    falls back to face metrics, still writes metrics.json)
    run_tool([f"{tools}/evaluate_divonly.py", out_dir, "--eval-n", "60"],
             cwd=REPO)
    with open(os.path.join(out_dir, "metrics_divonly.json")) as f:
        metrics = json.load(f)
    assert "face_l2" in metrics

    # 5. long-form synthesis over both full test clips, wave-batched:
    #    the 12 s and 6 s clips have different chunk counts, so the tail
    #    waves run padded at the group batch shape (--clip-batch 2)
    lf_dir = os.path.join(ws, "longform")
    run_tool([f"{tools}/longform_synthesis.py", CFG, export,
              "--out-dir", lf_dir, "--max-clips", "2", "--clip-batch", "2",
              "--retrieval-method", "none"] + _opts(ws, root), cwd=REPO)
    full = {os.path.basename(os.path.dirname(p)): p for p in
            glob.glob(os.path.join(lf_dir, "**", "full_pred_motion.npz"),
                      recursive=True)}
    assert set(full) == {"2_scott_0_3_3", "2_scott_0_4_4"}, full
    # 12 s clip @15fps = 180 frames -> 360 @30fps; 6 s -> 90 -> 180
    d = np.load(full["2_scott_0_3_3"], allow_pickle=True)
    assert d["poses"].shape == (360, 165)
    d = np.load(full["2_scott_0_4_4"], allow_pickle=True)
    assert d["poses"].shape == (180, 165)
