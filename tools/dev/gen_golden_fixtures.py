#!/usr/bin/env python
"""Generate golden state-dict fixtures from the reference torch modules.

Runs ONLY where /root/reference is present: instantiates the reference's
actual classes (TransformerVAE from gesture_vae.py, ReGestureTransformer
from raggesture.py, VAESKConv from eval_models/model.py) with the release
hyperparameters and dumps ``{key: shape}`` JSON fixtures under
``tests/fixtures/``.  The fixtures freeze the released checkpoints' exact
key naming (mmcv ``model.`` prefix layout, MHA ``in_proj_*`` packing,
``temporal_decoder_blocks.*`` attribute names) so
``tests/test_convert_golden.py`` fails on any converter key drift without
needing the 3 GB release download.

Heavy/unavailable deps (mmcv, fairseq, cv2, kornia, librosa, ...) are
stubbed with just enough surface for module import; the mini registry
reimplements mmcv's type-keyed build so sa/ca blocks are the reference's
real attention classes.
"""

import importlib.machinery
import json
import os
import sys
import tempfile
import types

import numpy as np
import torch

REFERENCE = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tests",
                       "fixtures")


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _build_from_cfg(cfg, registry, default_args=None):
    if cfg is None:
        return None
    cfg = dict(cfg)
    t = cfg.pop("type")
    if default_args:
        for k, v in default_args.items():
            cfg.setdefault(k, v)
    return registry.get(t)(**cfg)


class _Registry:
    """Just enough of mmcv.utils.Registry for the reference's builder.py."""

    def __init__(self, name="models", parent=None, build_func=None, **kw):
        self._m = parent._m if parent is not None and hasattr(parent, "_m") \
            else {}
        self.build_func = build_func or _build_from_cfg

    def register_module(self, *args, **kw):
        def deco(cls):
            self._m[cls.__name__] = cls
            return cls

        if args and callable(args[0]):
            return deco(args[0])
        return deco

    def get(self, name):
        return self._m[name]

    def build(self, cfg, **kw):
        return self.build_func(cfg, self, kw or None)


class _BaseModule(torch.nn.Module):
    """mmcv BaseModule surface: swallows init_cfg."""

    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg


def install_stubs():
    _stub("mmcv", __version__="1.7.0")
    _stub("mmcv.runner", BaseModule=_BaseModule,
          load_checkpoint=lambda *a, **k: None,
          get_dist_info=lambda: (0, 1))
    _stub("mmcv.utils", Registry=_Registry,
          build_from_cfg=_build_from_cfg)
    _stub("mmcv.cnn", MODELS=_Registry())
    _stub("cv2", norm=None)
    _stub("fairseq")
    _stub("smplx")
    _stub("lmdb")
    _stub("pyarrow")
    _stub("kornia")
    _stub("kornia.filters")
    _stub("kornia.filters.kernels", laplacian_1d=lambda n: torch.ones(n))
    _stub("librosa")
    _stub("fuzzywuzzy", fuzz=None)
    _stub("dotenv", load_dotenv=lambda *a, **k: None)
    _stub("openai", OpenAI=object)
    sys.path.insert(0, REFERENCE)


VAE_PART_ARGS = {
    # (nfeats, num_heads, num_frames) — release hyperparameters
    "upper": (78, 4, 256),
    "hands": (180, 4, 150),
    "face": (106, 4, 150),
    "lowertrans": (61, 8, 150),
}


def vae_yaml_args(part):
    nfeats, heads, num_frames = VAE_PART_ARGS[part]
    return dict(
        latent_dim=512, frame_chunk_size=15, decoder_arch="all_encoder",
        position_embedding="learned", num_frames=num_frames, num_heads=heads,
        ff_size=1024, dropout=0.1, transformer_activation="gelu",
        transformer_normalize_before=False, num_layers=8, nfeats=nfeats,
        vae_dist="normal", test_ckpt=f"{part}.pth",
    )


def keys_of(module):
    return {k: list(v.shape) for k, v in module.state_dict().items()}


def main():
    install_stubs()
    os.makedirs(OUT_DIR, exist_ok=True)

    from argparse import Namespace

    from mogen.models.transformers.gesture_vae import TransformerVAE

    vae_fix = {part: keys_of(TransformerVAE(Namespace(**vae_yaml_args(part))))
               for part in VAE_PART_ARGS}
    with open(os.path.join(OUT_DIR, "golden_keys_vae.json"), "w") as f:
        json.dump(vae_fix, f, indent=1, sort_keys=True)
    print("vae fixture:", {k: len(v) for k, v in vae_fix.items()})

    # --- denoiser: full ReGestureTransformer with the release model cfg ---
    import yaml

    from mogen.models.transformers import diffusion_transformer as dt
    from mogen.models.transformers.raggesture import ReGestureTransformer

    # skip the checkpoint loads inside GestureRepEncoder.load_vae
    dt.GestureRepEncoder.load_checkpoints = staticmethod(lambda *a, **k: None)

    cfg_ns: dict = {"_base_": None}
    cfg_path = os.path.join(REFERENCE,
                            "configs/raggesture_beatx/"
                            "basegesture_len150_beat.py")
    with open(cfg_path) as f:
        exec(compile(f.read(), cfg_path, "exec"), cfg_ns)
    mcfg = dict(cfg_ns["model"]["model"])
    mcfg.pop("type")
    mcfg.pop("retrieval_cfg", None)  # database not constructed (train=False)
    mcfg["database"] = None  # popped unconditionally (raggesture.py:898)

    with tempfile.TemporaryDirectory() as td:
        vae_cfg = dict(mcfg["vae_cfg"])
        for part in VAE_PART_ARGS:
            ycfg = vae_yaml_args(part)
            ypath = os.path.join(td, f"{part}.yaml")
            with open(ypath, "w") as f:
                yaml.safe_dump(ycfg, f)
            key = "lowertrans_cfg" if part == "lowertrans" else f"{part}_cfg"
            vae_cfg[key] = ypath
        mcfg["vae_cfg"] = vae_cfg
        model = ReGestureTransformer(**mcfg)

    # released epoch_64.pth is an mmcv checkpoint of MotionDiffusion whose
    # submodule attr is `model` -> every key carries the "model." prefix
    den_fix = {f"model.{k}": v for k, v in keys_of(model).items()}
    with open(os.path.join(OUT_DIR, "golden_keys_denoiser.json"), "w") as f:
        json.dump(den_fix, f, indent=1, sort_keys=True)
    print("denoiser fixture:", len(den_fix), "keys")

    # --- FGD embedder (AESKConv_240_100.bin) ---
    from mogen.models.eval_models.model import VAESKConv

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    from raggesture_tpu.models.eval_fgd import default_smplx_parents

    with tempfile.TemporaryDirectory() as td:
        parents = np.asarray(default_smplx_parents(), np.int32)
        kin = np.stack([parents, np.arange(len(parents), dtype=np.int32)])
        deps = os.path.join(td, "smplx_models", "smplx")
        os.makedirs(deps)
        np.savez(os.path.join(deps, "SMPLX_NEUTRAL_2020.npz"),
                 kintree_table=kin)
        args = Namespace(
            deps_path=td + "/", variational=False, vae_test_len=32,
            vae_test_dim=330, vae_test_stride=20, vae_length=240,
            vae_layer=4, vae_grow=[1, 1, 2, 1])
        fgd = VAESKConv(args)
    fgd_fix = keys_of(fgd)
    with open(os.path.join(OUT_DIR, "golden_keys_fgd.json"), "w") as f:
        json.dump(fgd_fix, f, indent=1, sort_keys=True)
    print("fgd fixture:", len(fgd_fix), "keys")

    # deterministic topology constants (pooling matrices + neighbor masks)
    # — computed by the reference purely from the SMPL-X kinematic tree, so
    # they validate our host-side find_pooling/neighbor math bit-exactly
    topo = {k: v.detach().numpy() for k, v in fgd.state_dict().items()
            if k.endswith(".mask") or ".common." in k}
    np.savez_compressed(os.path.join(OUT_DIR, "golden_fgd_topology.npz"),
                        **topo)
    print("fgd topology constants:", sorted(topo))


if __name__ == "__main__":
    main()
