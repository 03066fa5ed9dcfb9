#!/usr/bin/env python
"""Convert the released torch checkpoints to JAX (orbax) params.

Inputs (the layout created by tools/download_weights.py, matching the
reference's release — /root/reference/tools/download_weights.py:1-60):
  experiments/vae/<run>/<run>.yaml + the ckpt the yaml's test_ckpt names
  experiments/diffusion/.../epoch_64.pth        (mmcv checkpoint)
  datasets/assets_deps/.../AESKConv_240_100.bin (FGD embedder)

Outputs:
  experiments/vae/{upper,hands,face,lowertrans}.msgpack  (per-part params)
  experiments/diffusion/params                           (full model tree)

Usage:
    python tools/convert_weights.py --denoiser PATH [--vae-dir experiments/vae]
    python tools/convert_weights.py --all --root .
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PART_HINTS = {
    "upper": "upper",
    "hands": "hands",
    "face": "face",
    "lowertrans": "lowerplustrans",
}


def find_vae_ckpts(vae_dir: str):
    """Locate the 4 per-part VAE checkpoints by their run-name hints
    (the release run names contain 'upper' / 'hands' / 'face' /
    'lowerplustrans')."""
    found = {}
    for part, hint in PART_HINTS.items():
        for yml in glob.glob(os.path.join(vae_dir, "**", "*.yaml"),
                             recursive=True):
            if hint in os.path.basename(yml):
                import re

                with open(yml) as f:
                    txt = f.read()
                m = re.search(r"test_ckpt:\s*(\S+)", txt)
                if m:
                    ckpt = os.path.join(os.path.dirname(yml),
                                        os.path.basename(m.group(1)))
                    if os.path.exists(ckpt):
                        found[part] = ckpt
                        break
        if part not in found:
            # fallback: any .pth/.bin next to a matching dir name
            cands = glob.glob(os.path.join(vae_dir, f"*{hint}*", "*.pth")) + \
                glob.glob(os.path.join(vae_dir, f"*{hint}*", "*.bin"))
            if cands:
                found[part] = cands[0]
    return found


def main():
    p = argparse.ArgumentParser(description="torch → JAX weight conversion")
    p.add_argument("--denoiser", default=None,
                   help="mmcv diffusion checkpoint (epoch_64.pth)")
    p.add_argument("--vae-dir", default="experiments/vae")
    p.add_argument("--fgd", default=None,
                   help="AESKConv_240_100.bin for the FGD eval model")
    p.add_argument("--out", default="experiments/diffusion/params")
    p.add_argument("--fgd-out", default="experiments/fgd/aesconv.msgpack")
    p.add_argument("--all", action="store_true",
                   help="convert everything found under --root")
    p.add_argument("--root", default=".")
    args = p.parse_args()

    from raggesture_tpu.train.checkpoint import save_params
    from raggesture_tpu.utils.convert_torch import (
        convert_release,
        convert_vae,
        load_torch_state,
    )
    from raggesture_tpu.utils.logger import get_root_logger

    logger = get_root_logger()

    if args.all:
        diff = glob.glob(os.path.join(args.root, "experiments/diffusion",
                                      "**", "*.pth"), recursive=True)
        args.denoiser = args.denoiser or (diff[0] if diff else None)
        args.vae_dir = os.path.join(args.root, "experiments/vae")
        fgd = glob.glob(os.path.join(args.root, "**", "AESKConv*.bin"),
                        recursive=True)
        args.fgd = args.fgd or (fgd[0] if fgd else None)

    vae_states = {}
    for part, ckpt in find_vae_ckpts(args.vae_dir).items():
        logger.info("loading %s VAE from %s", part, ckpt)
        vae_states[part] = load_torch_state(ckpt)
        params = {"params": convert_vae(vae_states[part])}
        out = os.path.join(args.vae_dir, f"{part}.msgpack")
        # carry the architecture hyperparameters from the run yaml so the
        # codec config can be checked against them (activation /
        # normalize_before change the math, not the param tree)
        meta = {"source": ckpt}
        ydir = os.path.dirname(ckpt)
        for yml in glob.glob(os.path.join(ydir, "*.yaml")):
            import re

            txt = open(yml).read()
            for key in ("transformer_activation", "transformer_normalize_before",
                        "position_embedding", "num_heads", "num_layers",
                        "ff_size", "latent_dim", "frame_chunk_size",
                        "decoder_arch", "vae_dist"):
                m = re.search(rf"^{key}:\s*(\S+)", txt, re.M)
                if m:
                    meta[key] = m.group(1)
            break
        save_params(out, params, meta=meta)
        if meta.get("transformer_activation", "gelu") != "gelu":
            logger.warning(
                "%s VAE was trained with activation=%s — set "
                "model.model.vae_cfg.transformer_activation accordingly",
                part, meta["transformer_activation"])
        logger.info("wrote %s", out)

    if args.denoiser:
        logger.info("loading denoiser from %s", args.denoiser)
        state = load_torch_state(args.denoiser)
        tree = convert_release(state, vae_states=vae_states or None)
        save_params(args.out, tree, meta={"source": args.denoiser})
        logger.info("wrote %s", args.out)

    if args.fgd:
        from raggesture_tpu.utils.convert_torch import convert_fgd

        logger.info("loading FGD embedder from %s", args.fgd)
        state = load_torch_state(args.fgd)
        params = convert_fgd(state)
        save_params(args.fgd_out, params, meta={"source": args.fgd})
        logger.info("wrote %s", args.fgd_out)


if __name__ == "__main__":
    main()
