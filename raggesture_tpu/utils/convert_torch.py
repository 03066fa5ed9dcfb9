"""torch→JAX weight conversion for the released RAG-Gesture checkpoints.

The reference ships torch weights (4 body-part VAE ``.pth`` files with a
``model_state`` dict and optional "module." DDP prefixes — /root/reference/
mogen/models/transformers/diffusion_transformer.py:169-188; the diffusion
denoiser ``epoch_64.pth`` as an mmcv checkpoint ``state_dict`` prefixed
``model.``; and the FGD embedder ``AESKConv_240_100.bin``).  These functions
map each torch state dict onto this framework's flax param trees so the
published weights run on TPU.

Conventions:
  - torch ``Linear.weight`` (out, in) → flax ``kernel`` (in, out): transpose
  - torch ``LayerNorm.weight/bias`` → flax ``scale/bias``
  - torch ``MultiheadAttention.in_proj_weight`` (3D, D) → split into
    q/k/v_proj kernels
  - learned position embeddings (L, 1, D) → (L, D)
  - torch ``Embedding.weight`` → flax ``embedding``

All functions take/return plain nested dicts of numpy arrays; they never
require a GPU or the reference codebase.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def strip_prefix(state: Dict[str, np.ndarray], prefix: str
                 ) -> Dict[str, np.ndarray]:
    """Remove a key prefix (DDP "module." / mmcv "model.") when present on
    every key that has it; other keys are kept verbatim."""
    out = {}
    for k, v in state.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into {name: np.ndarray}. Handles the
    reference's container formats: {"model_state": ...} (VAE / FGD) and
    {"state_dict": ...} (mmcv), plus raw state dicts."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state", "state_dict", "model"):
        if isinstance(blob, dict) and key in blob and isinstance(blob[key], dict):
            blob = blob[key]
            break
    state = {k: np.asarray(v.detach().cpu().numpy()) for k, v in blob.items()
             if hasattr(v, "detach")}
    return strip_prefix(state, "module.")


# -- leaf converters -----------------------------------------------------------

def _linear(state, key):
    return {"kernel": np.ascontiguousarray(state[f"{key}.weight"].T),
            "bias": state[f"{key}.bias"]}


def _layernorm(state, key):
    return {"scale": state[f"{key}.weight"], "bias": state[f"{key}.bias"]}


def _mha(state, key):
    """torch nn.MultiheadAttention → TorchMHA (q/k/v/out_proj)."""
    w = state[f"{key}.in_proj_weight"]
    b = state[f"{key}.in_proj_bias"]
    D = w.shape[1]
    qw, kw, vw = w[:D], w[D:2 * D], w[2 * D:]
    qb, kb, vb = b[:D], b[D:2 * D], b[2 * D:]
    return {
        "q_proj": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
        "k_proj": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
        "v_proj": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
        "out_proj": _linear(state, f"{key}.out_proj"),
    }


def _encoder_layer(state, key):
    """torch nn.TransformerEncoderLayer → vae.EncoderLayer."""
    return {
        "self_attn": _mha(state, f"{key}.self_attn"),
        "linear1": _linear(state, f"{key}.linear1"),
        "linear2": _linear(state, f"{key}.linear2"),
        "norm1": _layernorm(state, f"{key}.norm1"),
        "norm2": _layernorm(state, f"{key}.norm2"),
    }


def _decoder_layer_torch(state, key):
    """torch nn.TransformerDecoderLayer → vae.DecoderLayerTorch."""
    return {
        "self_attn": _mha(state, f"{key}.self_attn"),
        "multihead_attn": _mha(state, f"{key}.multihead_attn"),
        "linear1": _linear(state, f"{key}.linear1"),
        "linear2": _linear(state, f"{key}.linear2"),
        "norm1": _layernorm(state, f"{key}.norm1"),
        "norm2": _layernorm(state, f"{key}.norm2"),
        "norm3": _layernorm(state, f"{key}.norm3"),
    }


def _skip_stack(state, key, num_layers: int, decoder: bool = False):
    """SkipTransformerEncoder/Decoder (detr_utils.py:101-210) →
    vae.SkipTransformerEncoder/Decoder (input_i / middle / output_i /
    skip_linear_i / final_norm)."""
    n = num_layers + (1 if num_layers % 2 == 0 else 0)
    num_block = (n - 1) // 2
    layer_fn = _decoder_layer_torch if decoder else _encoder_layer
    out = {}
    for i in range(num_block):
        out[f"input_{i}"] = layer_fn(state, f"{key}.input_blocks.{i}")
        out[f"output_{i}"] = layer_fn(state, f"{key}.output_blocks.{i}")
        out[f"skip_linear_{i}"] = _linear(state, f"{key}.linear_blocks.{i}")
    out["middle"] = layer_fn(state, f"{key}.middle_block")
    out["final_norm"] = _layernorm(state, f"{key}.norm")
    return out


def _learned_pe(state, key):
    return {"pe": np.ascontiguousarray(state[f"{key}.pe"][:, 0, :])}


# -- module converters ---------------------------------------------------------

def convert_vae(state: Dict[str, np.ndarray], num_layers: int = 8,
                position_embedding: str = "learned",
                decoder_arch: str = "all_encoder") -> Dict:
    """One body-part TransformerVAE state dict (gesture_vae.py:25-96) →
    flax TransformerVAE params subtree."""
    params = {
        "skel_embedding": _linear(state, "skel_embedding"),
        "final_layer": _linear(state, "final_layer"),
        "global_motion_token": state["global_motion_token"],
        "encoder": _skip_stack(state, "encoder", num_layers),
    }
    if decoder_arch == "all_encoder":
        params["decoder"] = _skip_stack(state, "decoder", num_layers)
    else:
        params["decoder"] = _skip_stack(
            state, "decoder", (num_layers - 1) * 4 + 1, decoder=True)
    if position_embedding == "learned":
        params["query_pos_encoder"] = _learned_pe(state, "query_pos_encoder")
        params["query_pos_decoder"] = _learned_pe(state, "query_pos_decoder")
        if decoder_arch != "all_encoder":
            params["mem_pos_decoder"] = _learned_pe(state, "mem_pos_decoder")
    return params


def _stylization(state, key):
    """StylizationBlock (stylization_block.py:14-40) → layers.StylizationBlock."""
    return {
        "emb_layer": _linear(state, f"{key}.emb_layers.1"),
        "norm": _layernorm(state, f"{key}.norm"),
        "out_proj": _linear(state, f"{key}.out_layers.2"),
    }


def _efficient_attention(state, key, cross: bool):
    out = {
        "norm": _layernorm(state, f"{key}.norm"),
        "query": _linear(state, f"{key}.query"),
        "key": _linear(state, f"{key}.key"),
        "value": _linear(state, f"{key}.value"),
        "proj_out": _stylization(state, f"{key}.proj_out"),
    }
    if cross:
        out["text_norm"] = _layernorm(state, f"{key}.text_norm")
    return out


def convert_denoiser(state: Dict[str, np.ndarray], num_layers: int = 8
                     ) -> Dict:
    """ReGestureTransformer state dict (raggesture.py:887-1114 over
    DiffusionTransformer, diffusion_transformer.py:334-431) → flax
    GestureDenoiser params.  Pass the state dict with the outer
    MotionDiffusion prefix already stripped (see ``convert_release``)."""
    params = {
        "joint_embed": _linear(state, "joint_embed"),
        "time_embed_1": _linear(state, "time_embed.0"),
        "time_embed_2": _linear(state, "time_embed.2"),
        "speaker_embedding": {"embedding": state["speaker_embedding.weight"]},
        "global_positional_embedding": _learned_pe(
            state, "global_positional_embedding"),
        "out": _linear(state, "out"),
    }
    # 768→512 projections are Linear in the shipped config; if the latent
    # dims matched they'd be Identity and absent from the state dict
    if "text_pre_proj.weight" in state:
        params["text_pre_proj"] = _linear(state, "text_pre_proj")
    if "audio_pre_proj.weight" in state:
        params["audio_pre_proj"] = _linear(state, "audio_pre_proj")
    for i in range(num_layers):
        key = f"temporal_decoder_blocks.{i}"
        params[f"block_{i}"] = {
            "sa_block": _efficient_attention(state, f"{key}.sa_block", False),
            "ca_xf_text": _efficient_attention(
                state, f"{key}.ca_blocks.xf_text", True),
            "ca_xf_audio": _efficient_attention(
                state, f"{key}.ca_blocks.xf_audio", True),
            "ca_xf_spk": _efficient_attention(
                state, f"{key}.ca_blocks.xf_spk", True),
            "ca_mix": _linear(state, f"{key}.ca_mix"),
            "ffn": {
                "linear1": _linear(state, f"{key}.ffn.linear1"),
                "linear2": _linear(state, f"{key}.ffn.linear2"),
                "proj_out": _stylization(state, f"{key}.ffn.proj_out"),
            },
        }
    return params


PART_ATTR = {"upper": "upper_vae", "hands": "hands_vae", "face": "face_vae",
             "lowertrans": "lowertrans_vae"}


def convert_release(denoiser_state: Dict[str, np.ndarray],
                    vae_states: Optional[Dict[str, Dict]] = None,
                    num_layers: int = 8, vae_num_layers: int = 8) -> Dict:
    """Assemble the full MotionDiffusionModel param tree
    {"params": {"codec": ..., "denoiser": ...}} from:

      - ``denoiser_state``: the mmcv checkpoint state dict (keys prefixed
        ``model.`` for the inner ReGestureTransformer — the prefix is
        stripped here).  If it embeds ``gesture_rep_encoder.{part}_vae.*``
        (it does in the release), the codec converts from the same file.
      - ``vae_states``: optional per-part standalone VAE state dicts
        {"upper": state, ...} overriding the embedded ones.
    """
    state = strip_prefix(denoiser_state, "model.")
    codec = {}
    for part, attr in PART_ATTR.items():
        if vae_states and part in vae_states:
            codec[f"{part}_vae"] = convert_vae(vae_states[part],
                                               vae_num_layers)
        else:
            sub = {
                k[len(f"gesture_rep_encoder.{attr}."):]: v
                for k, v in state.items()
                if k.startswith(f"gesture_rep_encoder.{attr}.")
            }
            if not sub:
                raise KeyError(
                    f"no weights for {part}: neither vae_states[{part!r}] "
                    f"nor embedded gesture_rep_encoder.{attr}.*")
            codec[f"{part}_vae"] = convert_vae(sub, vae_num_layers)
    denoiser = convert_denoiser(state, num_layers)
    return {"params": {"codec": codec, "denoiser": denoiser}}


def assert_tree_matches(converted, reference_tree, path=""):
    """Structural check: every converted leaf exists in the model-init tree
    with the same shape (catches mapping drift early)."""
    import jax

    conv_flat = {"/".join(str(k.key) for k in p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    ref_flat = {"/".join(str(k.key) for k in p): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(reference_tree)[0]}
    missing = sorted(set(ref_flat) - set(conv_flat))
    extra = sorted(set(conv_flat) - set(ref_flat))
    mismatched = sorted(
        k for k in set(conv_flat) & set(ref_flat)
        if tuple(conv_flat[k]) != tuple(ref_flat[k])
    )
    if missing or extra or mismatched:
        raise ValueError(
            f"param tree mismatch at {path or 'root'}:\n"
            f"  missing from conversion: {missing[:10]}\n"
            f"  unexpected in conversion: {extra[:10]}\n"
            f"  shape mismatches: {[(k, conv_flat[k], ref_flat[k]) for k in mismatched[:10]]}"
        )


def convert_fgd(state: Dict[str, np.ndarray]) -> Dict:
    """VAESKConv (AESKConv_240_100.bin, mogen/models/eval_models/model.py:
    244-252) → flax FGDEmbedder params.

    Encoder: ``encoder.layers.{i}.0.residual.0`` SkeletonConv (+ ``.mask``
    buffer, baked into the weight here), ``.residual.1`` GroupNorm,
    ``.0.shortcut`` SkeletonConv.  Decoder (VQDecoderV3): two ResBlocks then
    (Upsample, Conv, LeakyReLU) stages and a final Conv; conv weights keep
    torch's (out, in, k) layout — the flax ConvDecoder uses raw OIH params.
    """
    params: Dict = {"encoder": {}, "decoder": {}}

    i = 0
    while f"encoder.layers.{i}.0.residual.0.weight" in state:
        base = f"encoder.layers.{i}.0"

        def conv(key):
            w = state[f"{key}.weight"]
            mask = state.get(f"{key}.mask")
            if mask is not None:
                w = w * mask
            return {"weight": w, "bias": state[f"{key}.bias"]}

        params["encoder"][f"layer_{i}"] = {
            "conv": conv(f"{base}.residual.0"),
            "norm": {"scale": state[f"{base}.residual.1.weight"],
                     "bias": state[f"{base}.residual.1.bias"]},
            "shortcut": conv(f"{base}.shortcut"),
        }
        i += 1
    if i == 0:
        raise KeyError("no encoder.layers.*.0.residual.0.weight in state "
                       "dict — is this a VAESKConv checkpoint?")

    # decoder.main.{idx}: ResBlocks carry .model.{0,2}, convs carry .weight
    res_idx = sorted(
        {int(k.split(".")[2]) for k in state
         if k.startswith("decoder.main.") and ".model." in k})
    conv_idx = sorted(
        {int(k.split(".")[2]) for k in state
         if k.startswith("decoder.main.") and ".model." not in k
         and k.endswith(".weight")})
    dec = params["decoder"]
    for n, idx in enumerate(res_idx[:2]):
        dec[f"res{n}_c1_w"] = state[f"decoder.main.{idx}.model.0.weight"]
        dec[f"res{n}_c1_b"] = state[f"decoder.main.{idx}.model.0.bias"]
        dec[f"res{n}_c2_w"] = state[f"decoder.main.{idx}.model.2.weight"]
        dec[f"res{n}_c2_b"] = state[f"decoder.main.{idx}.model.2.bias"]
    # upsample-stage convs are all but the last plain conv; last is 'final'
    for n, idx in enumerate(conv_idx[:-1]):
        dec[f"up{n}_w"] = state[f"decoder.main.{idx}.weight"]
        dec[f"up{n}_b"] = state[f"decoder.main.{idx}.bias"]
    dec["final_w"] = state[f"decoder.main.{conv_idx[-1]}.weight"]
    dec["final_b"] = state[f"decoder.main.{conv_idx[-1]}.bias"]

    if "fc_mu.weight" in state:
        params["fc_mu"] = _linear(state, "fc_mu")
        params["fc_logvar"] = _linear(state, "fc_logvar")
    return {"params": params}
