"""Full-release-shape torch→JAX conversion parity harness.

Proves the released-checkpoint conversion path minus the 3 GB download
(/root/reference/tools/download_weights.py:1-60): torch stand-in modules are
instantiated at the released shapes (4 VAEs @ nfeats 78/180/106/61, latent
512, 8 layers, ff 1024; denoiser @ D=512, 16 heads, 8 layers, text 768,
time-embed 2048, 25 speakers, 43 tokens; FGD @ 330→240), their state dicts
are asserted KEY-AND-SHAPE-IDENTICAL to the golden fixtures generated from
the reference's own classes (tools/dev/gen_golden_fixtures.py), and every
converted module is asserted numerically equal to the live torch stand-in
forward at those shapes — the protocol of tests/test_convert.py, which
tiny/symmetric dims could not fully trust (in_proj q/k/v splits, head
splits, 768→512 projections, conv layouts).

Checkpoint sources this mirrors: the per-part VAE ``.pth`` files and
``epoch_64.pth`` (mmcv ``model.`` prefix, embedded VAEs —
/root/reference/mogen/models/transformers/diffusion_transformer.py:151-188)
and ``AESKConv_240_100.bin`` (/root/reference/mogen/models/eval_models/
model.py:244-252, tools/evaluate.py:159-165).

Everything here is slow-marked: full-size CPU compiles dominate (cached in
.jax_cache after the first run).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raggesture_tpu.models.denoiser import DenoiserConfig, GestureDenoiser  # noqa: E402
from raggesture_tpu.models.vae import TransformerVAE, VAEConfig  # noqa: E402
from raggesture_tpu.utils.convert_torch import (  # noqa: E402
    PART_ATTR,
    assert_tree_matches,
    convert_denoiser,
    convert_fgd,
    convert_release,
    convert_vae,
)
from tests.test_convert import (  # noqa: E402
    TorchDenoiser,
    TorchSkipEncoder,
    _torch_skip_forward,
    torch_denoiser_forward,
)

pytestmark = pytest.mark.slow

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

# release hyperparameters (configs/raggesture_beatx/basegesture_len150_beat
# .py:40-41 and the shipped per-part VAE yamls)
D, FF, LAYERS, HEADS = 512, 1024, 8, 16
TEXT_DIM, EMB_DIM, N_SPK, N_TOK = 768, 2048, 25, 43
CHUNK, FRAMES = 15, 150
PE_LEN = 1024  # PositionEmbeddingLearned1D max_len (position_encoding.py)

VAE_PARTS = {  # part: (nfeats, num_heads) from the released yaml configs
    "upper": (78, 4),
    "hands": (180, 4),
    "face": (106, 4),
    "lowertrans": (61, 8),
}


def load_fix(name):
    with open(os.path.join(FIX, name)) as f:
        return json.load(f)


def shapes_of(state):
    return {k: list(v.shape) for k, v in state.items()}


# ---------------------------------------------------------------- stand-ins


class FullTorchVAE(tnn.Module):
    """Release-shape TransformerVAE stand-in (gesture_vae.py:25-96,
    all_encoder arch, learned PE).  The released checkpoints also carry an
    unused ``mem_pos_decoder`` (built unconditionally, used only by the
    encoder_decoder arch) — replicated so the key set matches exactly."""

    def __init__(self, nfeats, heads):
        super().__init__()
        self.skel_embedding = tnn.Linear(nfeats, D)
        self.final_layer = tnn.Linear(D, nfeats)
        self.global_motion_token = tnn.Parameter(torch.randn(2, D))
        for name in ("query_pos_encoder", "query_pos_decoder",
                     "mem_pos_decoder"):
            mod = tnn.Module()
            mod.pe = tnn.Parameter(torch.randn(PE_LEN, 1, D) * 0.02)
            setattr(self, name, mod)
        self.encoder = TorchSkipEncoder(D, heads, FF, LAYERS)
        # all_encoder decode arch runs num_heads*8 heads (gesture_vae.py:63)
        self.decoder = TorchSkipEncoder(D, heads * 8, FF, LAYERS)


def full_vae_cfg(nfeats, heads):
    return VAEConfig(nfeats=nfeats, latent_dim=D, num_layers=LAYERS,
                     num_heads=heads, ff_size=FF, dropout=0.0,
                     frame_chunk_size=CHUNK, num_frames=FRAMES,
                     pe_max_len=PE_LEN)


def sine_buffer(n, d):
    """PositionEmbeddingSine1D's registered buffer (position_encoding.py:
    40-54) recomputed with the torch formula."""
    pe = torch.zeros(n, d)
    position = torch.arange(0, n, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d, 2).float()
                         * (-np.log(10000.0) / d))
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return pe.unsqueeze(0).transpose(0, 1)  # (n, 1, d)


def full_torch_denoiser():
    td = TorchDenoiser(d=D, heads=HEADS, ff=FF, layers=LAYERS,
                       text_dim=TEXT_DIM, emb_dim=EMB_DIM,
                       num_tokens=N_TOK, n_spk=N_SPK)
    # the released state dict also carries the deterministic sine buffer
    seq = tnn.Module()
    seq.register_buffer("pe", sine_buffer(FRAMES // CHUNK, D))
    td.sequence_embedding = seq
    return td


def full_denoiser_cfg():
    cfg = DenoiserConfig(dropout=0.0)
    # the defaults ARE the release sizes — pin them so fixture drift is loud
    assert (cfg.latent_dim, cfg.ff_size, cfg.num_layers, cfg.num_heads) == (
        D, FF, LAYERS, HEADS)
    assert (cfg.text_latent_dim, cfg.time_embed_dim, cfg.num_speakers,
            cfg.num_tokens) == (TEXT_DIM, EMB_DIM, N_SPK, N_TOK)
    return cfg


# ------------------------------------------------------------------- tests


@pytest.mark.parametrize("part", sorted(VAE_PARTS))
def test_fullsize_vae_golden_shapes_and_parity(part):
    """Stand-in state dict == golden fixture, and the converted params
    reproduce the live torch encode/decode at released shapes."""
    nfeats, heads = VAE_PARTS[part]
    torch.manual_seed(sum(map(ord, part)))
    tv = FullTorchVAE(nfeats, heads).eval()
    state = {k: v.detach().numpy() for k, v in tv.state_dict().items()}

    golden = load_fix("golden_keys_vae.json")[part]
    assert shapes_of(state) == golden

    params = {"params": convert_vae(state, num_layers=LAYERS)}
    vae = TransformerVAE(full_vae_cfg(nfeats, heads))

    B = 1
    n_chunks = FRAMES // CHUNK
    feats_np = np.random.RandomState(1).randn(B, FRAMES, nfeats).astype(
        np.float32)

    # encode parity (encode_to_dist chunking + global tokens, :111-193)
    with torch.no_grad():
        x = torch.from_numpy(feats_np)
        x = x.reshape(B * n_chunks, CHUNK, nfeats).permute(1, 0, 2)
        x = tv.skel_embedding(x)
        dist = tv.global_motion_token[:, None, :].tile(1, B * n_chunks, 1)
        xseq = torch.cat((dist, x), dim=0)
        xseq = xseq + tv.query_pos_encoder.pe[: xseq.shape[0]]
        latent = _torch_skip_forward(tv.encoder, xseq)[:2]
        mu_t = latent[0].reshape(B, n_chunks, D).numpy()
        logvar_t = latent[1].reshape(B, n_chunks, D).numpy()

    mu_j, logvar_j = vae.apply(params, jnp.asarray(feats_np),
                               method=vae.encode_dist)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=5e-4)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t, atol=5e-4)

    # decode parity (all_encoder arch with the PE-as-pos quirk, :195-239)
    with torch.no_grad():
        z = torch.from_numpy(mu_t).permute(1, 0, 2)
        queries = torch.zeros(FRAMES, B, D)
        xseq = torch.cat((z, queries), dim=0)
        query_pos = xseq + tv.query_pos_decoder.pe[: xseq.shape[0]]
        out = _torch_skip_forward(tv.decoder, xseq, pos=query_pos)[n_chunks:]
        rec_t = tv.final_layer(out).permute(1, 0, 2).numpy()

    rec_j = vae.apply(params, jnp.asarray(mu_t), FRAMES, method=vae.decode)
    np.testing.assert_allclose(np.asarray(rec_j), rec_t, atol=1e-3)


def test_fullsize_denoiser_golden_shapes_and_parity():
    """Stand-in (+ sine buffer) == golden fixture's non-VAE keys; converted
    denoiser matches the live torch forward at D=512/16 heads/8 layers."""
    torch.manual_seed(3)
    td = full_torch_denoiser().eval()
    state = {k: v.detach().numpy() for k, v in td.state_dict().items()}

    golden = load_fix("golden_keys_denoiser.json")
    golden_den = {k[len("model."):]: v for k, v in golden.items()
                  if not k.startswith("model.gesture_rep_encoder.")}
    assert shapes_of(state) == golden_den

    cfg = full_denoiser_cfg()
    # our sine table replaces the checkpoint's sequence_embedding.pe buffer
    from raggesture_tpu.models.layers import sine_position_table

    np.testing.assert_allclose(
        np.asarray(sine_position_table(cfg.tokens_per_part, D)),
        state["sequence_embedding.pe"][:, 0, :], atol=1e-6)

    dn_params = {"params": convert_denoiser(state, num_layers=LAYERS)}
    den = GestureDenoiser(cfg)

    rng = np.random.RandomState(4)
    B = 2
    x = rng.randn(B, N_TOK, D).astype(np.float32)
    word = rng.randn(B, 24, TEXT_DIM).astype(np.float32)
    audio = rng.randn(B, 32, TEXT_DIM).astype(np.float32)
    spk = np.array([1, 24])
    t = np.array([7, 999])
    mask = np.ones((B, N_TOK), np.float32)
    mask[:, list(cfg.sep_indices)] = 0.0

    from tests.test_fused_denoiser import parity_query_masks

    qm = parity_query_masks(cfg, B)
    ref = torch_denoiser_forward(td, cfg, x, word, audio, spk, t, mask,
                                 np.asarray(qm["xf_text"]))

    conds = den.apply(dn_params, jnp.asarray(word), jnp.asarray(audio),
                      jnp.asarray(spk), method=den.encode_conditions)
    out = den.apply(dn_params, jnp.asarray(x), jnp.asarray(t),
                    jnp.asarray(mask), conds, qm, jnp.ones((B, 1, 1)))
    valid = np.asarray(qm["xf_text"]).astype(bool) & mask.astype(bool)
    np.testing.assert_allclose(np.asarray(out)[valid], ref[valid], atol=2e-3)
    # scale check so atol can't hide a broken conversion outright
    assert np.abs(ref[valid]).mean() > 1e-3


def test_fullsize_release_assembly_loads_into_architecture():
    """The combined mmcv-layout stand-in state dict (``model.`` prefix,
    embedded VAEs) is key+shape-identical to the golden epoch_64.pth
    fixture, and ``convert_release`` of it produces exactly the param tree
    the release-config architecture initializes — i.e. the converted
    weights drop into StagedGenerator/training unchanged."""
    torch.manual_seed(5)
    state = {f"model.{k}": v.detach().numpy()
             for k, v in full_torch_denoiser().state_dict().items()}
    for part, attr in PART_ATTR.items():
        tv = FullTorchVAE(*VAE_PARTS[part])
        for k, v in tv.state_dict().items():
            state[f"model.gesture_rep_encoder.{attr}.{k}"] = (
                v.detach().numpy())
        del tv

    golden = load_fix("golden_keys_denoiser.json")
    assert shapes_of(state) == golden

    tree = convert_release(state, num_layers=LAYERS, vae_num_layers=LAYERS)

    from raggesture_tpu.builders import build_architecture
    from raggesture_tpu.config import Config
    from raggesture_tpu.datasets.fixtures import synthetic_batch
    from raggesture_tpu.models.architecture import init_params

    cfg = Config.fromfile(os.path.join(
        os.path.dirname(FIX), "..", "configs", "raggesture_beatx",
        "basegesture_len150_beat.py"))
    model = build_architecture(cfg.model)
    batch = synthetic_batch(seed=0, batch=1, frames=FRAMES, audio_frames=32)
    params = init_params(model, jax.random.PRNGKey(0), batch)
    assert_tree_matches(tree, params)


def _torch_fgd_encoder(state, x):
    """LocalEncoder semantics (eval_models/model.py:12-107, skeleton.py:
    551-589) driven by the converted-from state dict with torch ops: per
    stage, masked strided conv + GroupNorm(10) residual, k=1 masked strided
    shortcut, optional mean skeleton pooling, tanh."""
    y = x
    i = 0
    while f"encoder.layers.{i}.0.residual.0.weight" in state:
        base = f"encoder.layers.{i}.0"

        def t(key):
            return torch.from_numpy(state[key])

        w = t(f"{base}.residual.0.weight") * t(f"{base}.residual.0.mask")
        k = w.shape[-1]
        pad = (k - 1) // 2
        res = tF.conv1d(tF.pad(y, (pad, pad)), w,
                        t(f"{base}.residual.0.bias"), stride=2)
        res = tF.group_norm(res, 10, t(f"{base}.residual.1.weight"),
                            t(f"{base}.residual.1.bias"), eps=1e-5)
        short = tF.conv1d(y, t(f"{base}.shortcut.weight")
                          * t(f"{base}.shortcut.mask"),
                          t(f"{base}.shortcut.bias"), stride=2)
        y = res + short
        pool_key = f"{base}.common.0.weight"
        if pool_key in state:
            y = torch.einsum("oc,bct->bot", t(pool_key), y)
        y = torch.tanh(y)
        i += 1
    assert i == 4
    return y


def test_fullsize_fgd_encoder_parity():
    """Converted FGD encoder (masked SkeletonConvs + GroupNorm quirk + chain
    pooling) matches a torch forward at the released 330→240 shapes, driven
    by a golden-shaped state dict with the reference's REAL topology
    constants (masks + pool matrices from golden_fgd_topology.npz)."""
    golden = load_fix("golden_keys_fgd.json")
    topo = np.load(os.path.join(FIX, "golden_fgd_topology.npz"))
    rng = np.random.RandomState(9)
    state = {}
    for k, shape in golden.items():
        if k in topo.files:
            state[k] = topo[k].astype(np.float32)
        else:
            # small weights keep tanh stages out of saturation so parity
            # is tested on live (non-clipped) activations
            state[k] = (rng.randn(*shape) * 0.05).astype(np.float32)
    assert shapes_of(state) == golden

    params = convert_fgd(state)

    from raggesture_tpu.models.eval_fgd import FGDConfig, FGDEmbedder

    # evaluate.py runs the released bin non-variationally (fc_mu unused);
    # flax ignores the extra converted fc_* subtrees
    model = FGDEmbedder(FGDConfig())
    x = rng.randn(2, 32, 330).astype(np.float32)
    z = np.asarray(model.apply(params, jnp.asarray(x),
                               method=model.map2latent))
    assert z.shape == (2, 2, 240)

    with torch.no_grad():
        ref = _torch_fgd_encoder(
            state, torch.from_numpy(x).permute(0, 2, 1)
        ).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(z, ref, atol=2e-5)
    assert np.abs(ref).mean() > 1e-4
