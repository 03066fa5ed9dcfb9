#!/usr/bin/env python
"""Real-data runbook: the end-to-end command sequence for an egress-enabled
machine, dry-run-verifiable here (this environment has zero egress).

The conversion path itself is already proven at released checkpoint shapes
minus only the download (tests/test_convert_fullsize.py); this tool makes
the remaining real-data execution a copy-paste: every step's CLI is checked
to parse, and the expected-artifact manifest (names / shapes / schemas) is
cross-checked against the live code so the runbook can never silently drift
from the framework.

Capability match for the reference's documented pipeline
(/root/reference/tools/download_annotations.py:1-40,
tools/download_weights.py:1-60, tools/visualize.py, tools/evaluate.py and
the README run instructions).

Usage:
    python tools/runbook.py            # print the runbook
    python tools/runbook.py --dry-run  # verify CLIs + manifest consistency
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = "configs/raggesture_beatx/basegesture_len150_beat.py"

# ---------------------------------------------------------------------------
# the runbook: ordered steps, each a self-contained command
# ---------------------------------------------------------------------------

STEPS = [
    dict(
        name="download-dataset",
        manual=True,
        doc="Download BEAT2 (beat_english_v2.0.0) from the official "
            "release (https://huggingface.co/datasets/H-Liu1997/BEAT2) "
            "into datasets/beat_english_v2.0.0/ — smplxflame_30 npz poses, "
            "wave16k audio, TextGrid transcripts, speaker folders.",
        argv=None,
        produces=["datasets/beat_english_v2.0.0/"],
    ),
    dict(
        name="download-annotations",
        doc="Discourse/semantic/prominence annotation overlay for BEAT2.",
        argv=["tools/download_annotations.py",
              "--out", "datasets/beat_english_v2.0.0/"],
        produces=["datasets/beat_english_v2.0.0/"],
    ),
    dict(
        name="download-weights",
        doc="Released torch checkpoints (3 GB) + conversion to orbax "
            "params. The conversion numerics are pre-proven at released "
            "shapes by tests/test_convert_fullsize.py.",
        argv=["tools/download_weights.py", "--convert"],
        produces=["experiments/vae/upper.msgpack",
                  "experiments/vae/hands.msgpack",
                  "experiments/vae/face.msgpack",
                  "experiments/vae/lowertrans.msgpack",
                  "experiments/diffusion/params",
                  "experiments/fgd/aesconv.msgpack"],
    ),
    dict(
        name="cache-build+visualize",
        doc="First run builds the dataset shard cache (wav2vec2 + BERT + "
            "mel/onset featurization; cache_path from the config), then "
            "samples the test split and writes smplx2020-schema results.",
        argv=["tools/visualize.py", CFG, "experiments/diffusion/params",
              "--out-dir", "results/plain", "--test-batchsize", "16"],
        produces=["results/plain/<sample>/smplx/pred_motion.npz",
                  "results/plain/<sample>/smplx/gt_motion.npz",
                  "results/plain/<sample>/smplx/retrieval_0.npz"],
    ),
    dict(
        name="visualize-guided",
        doc="Insertion-guided generation (the headline RAG mode): DDIM "
            "inversion of retrieved exemplars + gradient guidance; the "
            "inversion cache persists across runs via --inv-cache.",
        argv=["tools/visualize.py", CFG, "experiments/diffusion/params",
              "--out-dir", "results/guided", "--use-inversion",
              "--insertion-guidance", "--inv-cache",
              "results/guided/inv_cache.npz"],
        produces=["results/guided/<sample>/smplx/pred_motion.npz"],
    ),
    dict(
        name="evaluate",
        doc="FGD / BeatAlign / L1Div / face L2+LVD over the result dir "
            "(reference tools/evaluate.py:159-165 metric suite).",
        argv=["tools/evaluate.py", "results/guided",
              "--fgd-weights", "experiments/fgd/aesconv.msgpack",
              "--out", "results/guided/metrics.json"],
        produces=["results/guided/metrics.json"],
    ),
    dict(
        name="longform",
        doc="Streaming long-form synthesis over whole recordings "
            "(outpainted windows, wave-batched).",
        argv=["tools/longform_synthesis.py", CFG,
              "experiments/diffusion/params", "--out-dir",
              "results/longform", "--clip-batch", "8"],
        produces=["results/longform/<recording>.npz"],
    ),
]

# ---------------------------------------------------------------------------
# expected-artifact manifest, cross-checked against the live code in dry-run
# ---------------------------------------------------------------------------


def manifest():
    """Names/shapes/schemas the real-data run must produce."""
    return {
        "experiments/vae/{part}.msgpack": {
            "format": "orbax params {'params': vae_tree}",
            "part_nfeats": {"upper": 78, "hands": 180, "face": 106,
                            "lowertrans": 61},
        },
        "experiments/diffusion/params": {
            "format": "orbax full-model tree (codec + denoiser + cond "
                      "encoders)",
            "denoiser": {"latent_dim": 512, "num_heads": 16,
                         "num_layers": 8, "ff_size": 1024},
        },
        "experiments/fgd/aesconv.msgpack": {
            "format": "orbax VAESKConv params",
            "in_joints_dim": 330, "embed_dim": 240,
        },
        "cache shards": {
            "layout": "<cache_path>/<split>/<group>/<name>.npz + meta.json",
            "array_fields": None,  # filled from datasets.beatx in dry-run
            "meta_fields": None,
        },
        "result npz (smplx2020 schema)": {
            "keys": ["betas", "poses", "expressions", "trans", "model",
                     "gender", "mocap_frame_rate"],
            "shapes": {"betas": (300,), "poses": ("T", 165),
                       "expressions": ("T", 100), "trans": ("T", 3)},
        },
        "metrics.json": {
            "keys": ["fgd", "align", "l1div", "l1div_gt", "face_l2",
                     "face_lvd"],
        },
    }


def dry_run() -> int:
    """Verify every step's CLI parses and the manifest matches the code."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    failures = []

    # 1. every command's CLI parses (--help exits 0)
    for step in STEPS:
        if step.get("manual"):
            continue
        argv = [sys.executable, os.path.join(REPO, step["argv"][0]),
                "--help"]
        r = subprocess.run(argv, capture_output=True, text=True,
                           cwd=REPO, timeout=300,
                           env=dict(os.environ, JAX_PLATFORMS="cpu"))
        ok = r.returncode == 0
        print(f"[{'ok' if ok else 'FAIL'}] {step['name']}: "
              f"{' '.join(step['argv'])}")
        if not ok:
            failures.append(f"{step['name']}: --help failed:\n"
                            f"{r.stderr[-2000:]}")

    # 2. manifest constants match the live code (no silent drift)
    man = manifest()
    from raggesture_tpu.config import Config
    from raggesture_tpu.datasets.beatx import _ARRAY_FIELDS, _META_FIELDS
    from raggesture_tpu.models.codec import CodecConfig

    cfg = Config.fromfile(os.path.join(REPO, CFG))
    den = cfg.model.model
    want = man["experiments/diffusion/params"]["denoiser"]
    got = dict(latent_dim=den["latent_dim"],
               num_heads=den["sa_block_cfg"]["num_heads"],
               num_layers=den["num_layers"],
               ff_size=den["ffn_cfg"]["ffn_dim"])
    if got != want:
        failures.append(f"denoiser dims drifted: manifest {want} != "
                        f"config {got}")

    for part, nf in man["experiments/vae/{part}.msgpack"][
            "part_nfeats"].items():
        live = CodecConfig().vae_config(part).nfeats
        if live != nf:
            failures.append(f"{part} nfeats drifted: manifest {nf} != "
                            f"codec {live}")

    vc = cfg.model.model.vae_cfg
    for part in ("upper", "hands", "face", "lowertrans"):
        expect = f"experiments/vae/{part}.msgpack"
        if vc[f"{part}_ckpt"] != expect:
            failures.append(f"config {part}_ckpt != converter output "
                            f"{expect}")

    man["cache shards"]["array_fields"] = list(_ARRAY_FIELDS)
    man["cache shards"]["meta_fields"] = list(_META_FIELDS)

    from raggesture_tpu.models.eval_fgd import FGDConfig
    fman = man["experiments/fgd/aesconv.msgpack"]
    fcfg = FGDConfig()
    if (fcfg.input_dim, fcfg.latent_dim) != (fman["in_joints_dim"],
                                             fman["embed_dim"]):
        failures.append(
            f"FGD dims drifted: manifest ({fman['in_joints_dim']}, "
            f"{fman['embed_dim']}) != code ({fcfg.input_dim}, "
            f"{fcfg.latent_dim})")

    import inspect

    from raggesture_tpu.eval import evaluator as _ev
    ev_src = inspect.getsource(_ev)
    for key in man["metrics.json"]["keys"]:
        if f'out["{key}"]' not in ev_src:
            failures.append(f"evaluator no longer emits metric '{key}'")

    # the smplx writer's promise
    from raggesture_tpu.utils import motion_io
    src = inspect.getsource(motion_io.save_smplx_npz)
    for key in man["result npz (smplx2020 schema)"]["keys"]:
        if f"{key}=" not in src and f'"{key}"' not in src:
            failures.append(f"save_smplx_npz no longer writes '{key}'")

    print(json.dumps(man, indent=2, default=str))
    if failures:
        print("\nDRY-RUN FAILURES:")
        for f in failures:
            print(" -", f)
        return 1
    print("\ndry-run ok: all CLIs parse, manifest matches the code")
    return 0


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    if args.dry_run:
        raise SystemExit(dry_run())
    print("Real-data runbook (run on an egress-enabled machine, from the "
          "repo root):\n")
    for i, step in enumerate(STEPS, 1):
        print(f"{i}. {step['name']}: {step['doc']}")
        if step.get("manual"):
            print("   (manual download — see doc above)")
        else:
            print(f"   $ python {' '.join(step['argv'])}")
        for art in step["produces"]:
            print(f"   -> {art}")
        print()
    print("Expected-artifact manifest (verify with --dry-run):")
    print(json.dumps(manifest(), indent=2, default=str))


if __name__ == "__main__":
    main()
