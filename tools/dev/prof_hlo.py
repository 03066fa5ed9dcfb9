import sys
import jax, jax.numpy as jnp
from raggesture_tpu.utils.env import setup_compilation_cache
setup_compilation_cache()
from raggesture_tpu.datasets.fixtures import full_arch_config, synthetic_batch
from raggesture_tpu.models.architecture import MotionDiffusionModel, init_params
from raggesture_tpu.models.codec import part_features
from raggesture_tpu.models.fused_codec import (
    fused_decode, fused_encode_dist, stack_codec_params)

cfg = full_arch_config()
model = MotionDiffusionModel(cfg)
batch = synthetic_batch(seed=0, batch=1, frames=cfg.codec.num_frames, audio_frames=499)
params = init_params(model, jax.random.PRNGKey(0), batch)
bb32 = synthetic_batch(seed=0, batch=32, frames=cfg.codec.num_frames, audio_frames=8)
cstack = stack_codec_params(params["params"]["codec"], cfg.codec)

def fused_roundtrip(p, cs, b):
    cp = p["params"]["codec"]
    feats = part_features(
        b["motion_upper"], b["motion_lower"], b["motion_face"],
        b["motion_hands"], b["trans"], b["facial"], b["contact"])
    z, _ = fused_encode_dist(cfg.codec, cp, cs, feats, b.get("motion_mask"))
    return fused_decode(cfg.codec, cp, cs, z)

lowered = jax.jit(fused_roundtrip).lower(params, cstack, bb32)
comp = lowered.compile()
txt = comp.as_text()
open("/tmp/codec_hlo.txt", "w").write(txt)
print("HLO written,", len(txt), "chars")
