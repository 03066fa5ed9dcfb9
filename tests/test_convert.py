"""torch→JAX weight conversion: structural match against model init trees
and numeric parity of converted modules vs live torch forwards.

The torch fixtures below rebuild the *naming and shapes* of the reference
checkpoints (gesture_vae.py TransformerVAE over detr_utils
SkipTransformerEncoder; diffusion_transformer.py DecoderLayer stack) using
stock ``torch.nn`` modules, so ``convert_*`` is exercised against the real
state-dict layout without needing the 3 GB release download."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raggesture_tpu.models.vae import (  # noqa: E402
    SkipTransformerEncoder,
    TransformerVAE,
    VAEConfig,
)
from raggesture_tpu.models.denoiser import DenoiserConfig, GestureDenoiser  # noqa: E402
from raggesture_tpu.utils.convert_torch import (  # noqa: E402
    assert_tree_matches,
    convert_denoiser,
    convert_release,
    convert_vae,
    strip_prefix,
)

D, HEADS, FF, LAYERS = 16, 2, 32, 4  # tiny but odd-rounded like the real 8


# ---------------------------------------------------------------- fixtures --
class TorchSkipEncoder(tnn.Module):
    """Same parameter naming as detr_utils.SkipTransformerEncoder:101-148."""

    def __init__(self, d, heads, ff, num_layers):
        super().__init__()
        n = num_layers + (1 if num_layers % 2 == 0 else 0)
        nb = (n - 1) // 2

        def layer():
            return tnn.TransformerEncoderLayer(d, heads, ff, dropout=0.0,
                                               activation="gelu")

        self.input_blocks = tnn.ModuleList([layer() for _ in range(nb)])
        self.middle_block = layer()
        self.output_blocks = tnn.ModuleList([layer() for _ in range(nb)])
        self.linear_blocks = tnn.ModuleList(
            [tnn.Linear(2 * d, d) for _ in range(nb)])
        self.norm = tnn.LayerNorm(d)

    def forward(self, x):  # x: (T, B, D), reference batch_first=False
        xs = []
        for m in self.input_blocks:
            x = m(x)
            xs.append(x)
        x = self.middle_block(x)
        for m, lin in zip(self.output_blocks, self.linear_blocks):
            x = lin(torch.cat([x, xs.pop()], dim=-1))
            x = m(x)
        return self.norm(x)


class TorchVAE(tnn.Module):
    """Parameter naming of gesture_vae.TransformerVAE:25-96 (learned PE,
    all_encoder arch)."""

    def __init__(self, nfeats, d=D, heads=HEADS, ff=FF, layers=LAYERS):
        super().__init__()
        self.skel_embedding = tnn.Linear(nfeats, d)
        self.final_layer = tnn.Linear(d, nfeats)
        self.global_motion_token = tnn.Parameter(torch.randn(2, d))
        self.query_pos_encoder = tnn.Module()
        self.query_pos_encoder.pe = tnn.Parameter(torch.randn(64, 1, d))
        self.query_pos_decoder = tnn.Module()
        self.query_pos_decoder.pe = tnn.Parameter(torch.randn(64, 1, d))
        self.encoder = TorchSkipEncoder(d, heads, ff, layers)
        self.decoder = TorchSkipEncoder(d, heads * 8, ff, layers)


def vae_cfg(nfeats):
    return VAEConfig(nfeats=nfeats, latent_dim=D, num_layers=LAYERS,
                     num_heads=HEADS, ff_size=FF, dropout=0.0,
                     frame_chunk_size=5, num_frames=10, pe_max_len=64)


# ------------------------------------------------------------------- tests --
def test_skip_encoder_numeric_parity():
    torch.manual_seed(0)
    enc = TorchSkipEncoder(D, HEADS, FF, LAYERS).eval()
    state = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    from raggesture_tpu.utils.convert_torch import _skip_stack

    # wrap with the "encoder." prefix the VAE state dict uses
    prefixed = {f"encoder.{k}": v for k, v in state.items()}
    params = {"params": _skip_stack(prefixed, "encoder", LAYERS)}

    cfg = vae_cfg(8)
    model = SkipTransformerEncoder(cfg, LAYERS, HEADS)
    x = np.random.RandomState(1).randn(2, 7, D).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x).permute(1, 0, 2)).permute(1, 0, 2).numpy()
    out = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_vae_conversion_structure_and_forward():
    torch.manual_seed(1)
    nfeats = 8
    tv = TorchVAE(nfeats).eval()
    state = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params = {"params": convert_vae(state, num_layers=LAYERS)}

    cfg = vae_cfg(nfeats)
    vae = TransformerVAE(cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 10, nfeats), jnp.float32)
    init = vae.init({"params": jax.random.PRNGKey(0)}, x, sample=False,
                    method=vae.encode_to_dist)
    dec_init = vae.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 2, D)), method=vae.decode)
    merged = dict(dec_init["params"])
    merged.update(init["params"])
    assert_tree_matches(params, {"params": merged})

    # converted params run encode + decode
    z, (mu, logvar) = vae.apply(params, x, sample=False,
                                method=vae.encode_to_dist)
    assert z.shape == (2, 2, D)
    rec = vae.apply(params, z, method=vae.decode)
    assert rec.shape == (2, 10, nfeats)
    assert np.isfinite(np.asarray(rec)).all()


def test_vae_ddp_prefix_stripping():
    tv = TorchVAE(8)
    state = {f"module.{k}": v.detach().numpy()
             for k, v in tv.state_dict().items()}
    stripped = strip_prefix(state, "module.")
    params = convert_vae(stripped, num_layers=LAYERS)
    assert "skel_embedding" in params


class TorchStylization(tnn.Module):
    def __init__(self, d, emb_dim):
        super().__init__()
        self.emb_layers = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb_dim, 2 * d))
        self.norm = tnn.LayerNorm(d)
        self.out_layers = tnn.Sequential(tnn.SiLU(), tnn.Dropout(0.0),
                                         tnn.Linear(d, d))

    def forward(self, h, emb):
        scale, shift = torch.chunk(self.emb_layers(emb).unsqueeze(1), 2, dim=2)
        return self.out_layers(self.norm(h) * (1 + scale) + shift)


class TorchEffSelfAttn(tnn.Module):
    """Reference EfficientSelfAttention semantics (efficient_attention.py:8-45)
    re-expressed as a parity fixture."""

    def __init__(self, d, heads, emb_dim):
        super().__init__()
        self.num_heads = heads
        self.norm = tnn.LayerNorm(d)
        self.query = tnn.Linear(d, d)
        self.key = tnn.Linear(d, d)
        self.value = tnn.Linear(d, d)
        self.proj_out = TorchStylization(d, emb_dim)

    def forward(self, x, src_mask, emb):
        B, T, Dd = x.shape
        H = self.num_heads
        q = torch.softmax(self.query(self.norm(x)).view(B, T, H, -1), dim=-1)
        k = torch.softmax(
            (self.key(self.norm(x)) + (1 - src_mask) * -1000000
             ).view(B, T, H, -1), dim=1)
        v = (self.value(self.norm(x)) * src_mask).view(B, T, H, -1)
        att = torch.einsum("bnhd,bnhl->bhdl", k, v)
        y = torch.einsum("bnhd,bhdl->bnhl", q, att).reshape(B, T, Dd)
        return x + self.proj_out(y, emb)


class TorchEffCrossAttn(tnn.Module):
    def __init__(self, d, dc, heads, emb_dim):
        super().__init__()
        self.num_heads = heads
        self.norm = tnn.LayerNorm(d)
        self.text_norm = tnn.LayerNorm(dc)
        self.query = tnn.Linear(d, d)
        self.key = tnn.Linear(dc, d)
        self.value = tnn.Linear(dc, d)
        self.proj_out = TorchStylization(d, emb_dim)

    def forward(self, x, xf, emb, query_mask, cond_type):
        B, T, Dd = x.shape
        N = xf.shape[1]
        H = self.num_heads
        q = torch.softmax(self.query(self.norm(x)).view(B, T, H, -1), dim=-1)
        key = self.key(self.text_norm(xf))
        tct = ((cond_type % 10) > 0).float().view(B, 1, 1).repeat(1, N, 1)
        key = key + (1 - tct) * -1000000
        k = torch.softmax(key.view(B, N, H, -1), dim=1)
        v = self.value(self.text_norm(xf) * tct).view(B, N, H, -1)
        att = torch.einsum("bnhd,bnhl->bhdl", k, v)
        y = torch.einsum("bnhd,bhdl->bnhl", q, att)
        y = y + (1 - query_mask).view(B, T, 1, 1) * -1000000
        return x + self.proj_out(y.reshape(B, T, Dd), emb)


class TorchFFN(tnn.Module):
    def __init__(self, d, ff, emb_dim):
        super().__init__()
        self.linear1 = tnn.Linear(d, ff)
        self.linear2 = tnn.Linear(ff, d)
        self.activation = tnn.GELU()
        self.proj_out = TorchStylization(d, emb_dim)

    def forward(self, x, emb):
        y = self.linear2(self.activation(self.linear1(x)))
        return x + self.proj_out(y, emb)


class TorchDenoiser(tnn.Module):
    """Parameter naming of the reference denoiser
    (diffusion_transformer.py:334-431 + raggesture.py:887-1038)."""

    def __init__(self, d=D, heads=HEADS, ff=FF, layers=2, text_dim=24,
                 emb_dim=4 * D, num_tokens=11, n_spk=5):
        super().__init__()
        self.joint_embed = tnn.Linear(d, d)
        self.time_embed = tnn.Sequential(
            tnn.Linear(d, emb_dim), tnn.SiLU(), tnn.Linear(emb_dim, emb_dim))
        self.text_pre_proj = tnn.Linear(text_dim, d)
        self.audio_pre_proj = tnn.Linear(text_dim, d)
        self.speaker_embedding = tnn.Embedding(n_spk, d)
        self.global_positional_embedding = tnn.Module()
        self.global_positional_embedding.pe = tnn.Parameter(
            torch.randn(num_tokens, 1, d))
        self.out = tnn.Linear(d, d)

        blocks = []
        for _ in range(layers):
            blk = tnn.Module()
            blk.sa_block = TorchEffSelfAttn(d, heads, emb_dim)
            blk.ca_blocks = tnn.ModuleDict({
                name: TorchEffCrossAttn(d, d, heads, emb_dim)
                for name in ("xf_text", "xf_audio", "xf_spk")
            })
            blk.ca_mix = tnn.Linear(3 * d, d)
            blk.ffn = TorchFFN(d, ff, emb_dim)
            blocks.append(blk)
        self.temporal_decoder_blocks = tnn.ModuleList(blocks)


def torch_denoiser_forward(td, cfg, x, word, audio, spk, t, mask, qm_np):
    """Reference forward_train semantics (raggesture.py:1018-1038) driven
    through a TorchDenoiser stand-in's modules, cond_type fixed so the
    conditions are kept.  Shared by the tiny parity test here and the
    full-release-shape harness (test_convert_fullsize.py)."""
    from raggesture_tpu.models.layers import timestep_embedding, sine_position_table

    d = td.joint_embed.in_features
    n_tok = x.shape[1]
    B = x.shape[0]
    with torch.no_grad():
        emb_in = torch.from_numpy(np.asarray(
            timestep_embedding(jnp.asarray(t), d)))
        emb = td.time_embed(emb_in)
        xf_text = td.text_pre_proj(torch.from_numpy(word))
        xf_audio = td.audio_pre_proj(torch.from_numpy(audio))
        xf_spk = td.speaker_embedding(torch.from_numpy(spk)).unsqueeze(1)
        h = td.joint_embed(torch.from_numpy(x))
        L = cfg.tokens_per_part
        pos = np.asarray(sine_position_table(L, d))
        sep = np.zeros((1, d), np.float32)
        pos_cat = np.concatenate([pos, sep, pos, sep, pos, sep, pos])[:n_tok]
        h = h + torch.from_numpy(pos_cat).unsqueeze(0)
        h = h + td.global_positional_embedding.pe[:n_tok, 0][None]
        src_mask = torch.from_numpy(mask[..., None])
        qm_t = torch.from_numpy(qm_np)
        cond_type = torch.ones(B, 1, 1) * 99  # % 10 > 0 -> conditions kept
        for blk in td.temporal_decoder_blocks:
            h = blk.sa_block(h, src_mask, emb)
            outs = [blk.ca_blocks[n](h, xf, emb, qm_t, cond_type)
                    for n, xf in (("xf_text", xf_text), ("xf_audio", xf_audio),
                                  ("xf_spk", xf_spk))]
            h = blk.ca_mix(torch.cat(outs, dim=-1))
            h = blk.ffn(h, emb)
        return td.out(h).numpy()


def test_denoiser_conversion_full_parity():
    """Converted denoiser matches a live torch forward to float tolerance."""
    torch.manual_seed(3)
    layers, text_dim, n_tok, n_spk = 2, 24, 11, 5
    td = TorchDenoiser(layers=layers, text_dim=text_dim, num_tokens=n_tok,
                       n_spk=n_spk).eval()
    state = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    dn_params = {"params": convert_denoiser(state, num_layers=layers)}

    cfg = DenoiserConfig(latent_dim=D, time_embed_dim=4 * D,
                         num_layers=layers, num_heads=HEADS, ff_size=FF,
                         dropout=0.0, text_latent_dim=text_dim,
                         audio_latent_dim=text_dim, num_speakers=n_spk,
                         max_seq_len=10, frame_chunk_size=5)
    assert cfg.num_tokens == n_tok
    den = GestureDenoiser(cfg)

    rng = np.random.RandomState(4)
    B = 2
    x = rng.randn(B, n_tok, D).astype(np.float32)
    word = rng.randn(B, 6, text_dim).astype(np.float32)
    audio = rng.randn(B, 8, text_dim).astype(np.float32)
    spk = np.array([1, 3])
    t = np.array([7, 99])
    # zero all separators like latent_motion_mask does (the real model always
    # masks them out of self-attention keys/values; without this, the -1e6
    # query-mask quirk's float32 cancellation noise at separators would
    # contaminate valid tokens through sa token mixing)
    mask = np.ones((B, n_tok), np.float32)
    mask[:, list(cfg.sep_indices)] = 0.0

    from tests.test_fused_denoiser import parity_query_masks

    ref = torch_denoiser_forward(
        td, cfg, x, word, audio, spk, t, mask,
        np.asarray(parity_query_masks(cfg, B)["xf_text"]))

    conds = den.apply(dn_params, jnp.asarray(word), jnp.asarray(audio),
                      jnp.asarray(spk), method=den.encode_conditions)
    qm = parity_query_masks(cfg, B)
    out = den.apply(dn_params, jnp.asarray(x), jnp.asarray(t),
                    jnp.asarray(mask), conds, qm, jnp.ones((B, 1, 1)))
    # compare valid tokens only: the reference's -1e6 query-mask quirk makes
    # separator-token values catastrophically cancel in float32 LayerNorm —
    # bit-level noise there differs across frameworks by design (the
    # reference discards those tokens; they carry zero loss weight)
    valid = np.asarray(qm["xf_text"])[..., None].astype(bool) & (
        mask[..., None].astype(bool))
    np.testing.assert_allclose(np.asarray(out)[valid[..., 0]],
                               ref[valid[..., 0]], atol=2e-4)

    # structural match against a fresh init (cover both methods so the
    # condition encoders' params are traced, like architecture.init_params)
    import flax.linen as nn

    def run(mdl):
        cc = mdl.encode_conditions(jnp.asarray(word), jnp.asarray(audio),
                                   jnp.asarray(spk))
        return mdl(jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask), cc, qm,
                   jnp.ones((B, 1, 1)))

    init = nn.init(run, den)(jax.random.PRNGKey(0))
    assert_tree_matches(dn_params, init)


def test_convert_release_assembles_full_tree():
    """mmcv 'model.'-prefixed dict with embedded VAEs → full param tree."""
    torch.manual_seed(5)
    layers = 2
    td = TorchDenoiser(layers=layers, text_dim=24, num_tokens=11, n_spk=5)
    state = {f"model.{k}": v.detach().numpy()
             for k, v in td.state_dict().items()}
    # embed 4 tiny VAEs like the release checkpoint does
    nfeats = {"upper": 8, "hands": 12, "face": 9, "lowertrans": 11}
    for part, attr in (("upper", "upper_vae"), ("hands", "hands_vae"),
                       ("face", "face_vae"), ("lowertrans", "lowertrans_vae")):
        tv = TorchVAE(nfeats[part])
        for k, v in tv.state_dict().items():
            state[f"model.gesture_rep_encoder.{attr}.{k}"] = v.detach().numpy()
    tree = convert_release(state, num_layers=layers, vae_num_layers=LAYERS)
    assert set(tree["params"]) == {"codec", "denoiser"}
    assert set(tree["params"]["codec"]) == {
        "upper_vae", "hands_vae", "face_vae", "lowertrans_vae"}
    assert tree["params"]["denoiser"]["block_1"]["ca_mix"]["kernel"].shape == (
        3 * D, D)


def _torch_layer_post(layer, src, pos=None):
    """detr_utils.TransformerEncoderLayer.forward_post semantics (:359-371)
    driven through a stock torch layer's submodules (pos added to q/k only)."""
    qk = src if pos is None else src + pos
    a = layer.self_attn(qk, qk, src)[0]
    src = layer.norm1(src + layer.dropout1(a))
    f = layer.linear2(layer.dropout(layer.activation(layer.linear1(src))))
    return layer.norm2(src + layer.dropout2(f))


def _torch_skip_forward(enc, x, pos=None):
    """SkipTransformerEncoder.forward (:125-148) with optional pos."""
    xs = []
    for m in enc.input_blocks:
        x = _torch_layer_post(m, x, pos)
        xs.append(x)
    x = _torch_layer_post(enc.middle_block, x, pos)
    for m, lin in zip(enc.output_blocks, enc.linear_blocks):
        x = lin(torch.cat([x, xs.pop()], dim=-1))
        x = _torch_layer_post(m, x, pos)
    return enc.norm(x)


def test_full_vae_encode_decode_torch_parity():
    """End-to-end TransformerVAE parity: converted weights reproduce the
    reference's encode_to_dist (chunking, global tokens, PE-on-stream) and
    all_encoder decode (PE-as-pos quirk) from a LIVE torch model
    (gesture_vae.py:128-239)."""
    torch.manual_seed(11)
    nfeats, chunk, frames = 8, 5, 10
    tv = TorchVAE(nfeats).eval()
    state = {k: v.detach().numpy() for k, v in tv.state_dict().items()}
    params = {"params": convert_vae(state, num_layers=LAYERS)}
    cfg = vae_cfg(nfeats)
    vae = TransformerVAE(cfg)

    B = 2
    feats_np = np.random.RandomState(12).randn(B, frames, nfeats).astype(
        np.float32)
    n_chunks = frames // chunk

    with torch.no_grad():
        x = torch.from_numpy(feats_np)
        x = x.reshape(B * n_chunks, chunk, nfeats).permute(1, 0, 2)
        x = tv.skel_embedding(x)
        dist = tv.global_motion_token[:, None, :].tile(1, B * n_chunks, 1)
        xseq = torch.cat((dist, x), dim=0)
        xseq = xseq + tv.query_pos_encoder.pe[: xseq.shape[0]]
        latent = _torch_skip_forward(tv.encoder, xseq)[:2]
        mu_t = latent[0].reshape(B, n_chunks, D).numpy()
        logvar_t = latent[1].reshape(B, n_chunks, D).numpy()

    mu_j, logvar_j = vae.apply(params, jnp.asarray(feats_np),
                               method=vae.encode_dist)
    np.testing.assert_allclose(np.asarray(mu_j), mu_t, atol=5e-5)
    np.testing.assert_allclose(np.asarray(logvar_j), logvar_t, atol=5e-5)

    # decode parity (all_encoder arch with the pos quirk)
    z_np = mu_t
    with torch.no_grad():
        z = torch.from_numpy(z_np).permute(1, 0, 2)  # (n_chunks, B, D)
        queries = torch.zeros(frames, B, D)
        xseq = torch.cat((z, queries), dim=0)
        query_pos = xseq + tv.query_pos_decoder.pe[: xseq.shape[0]]
        out = _torch_skip_forward(tv.decoder, xseq, pos=query_pos)[n_chunks:]
        rec_t = tv.final_layer(out).permute(1, 0, 2).numpy()

    rec_j = vae.apply(params, jnp.asarray(z_np), frames, method=vae.decode)
    np.testing.assert_allclose(np.asarray(rec_j), rec_t, atol=1e-4)
