"""FGD (VAESKConv) conversion: state-dict naming → flax FGDEmbedder params,
plus numeric parity of the conv decoder against a live torch VQDecoderV3."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from raggesture_tpu.models.eval_fgd import FGDConfig, FGDEmbedder  # noqa: E402
from raggesture_tpu.utils.convert_torch import assert_tree_matches, convert_fgd  # noqa: E402


def small_cfg():
    return FGDConfig(input_dim=330, latent_dim=240, num_layers=4)


def _init_tree(model, cfg):
    x = jnp.zeros((1, 32, cfg.input_dim))
    return model.init({"params": jax.random.PRNGKey(0),
                       "vae": jax.random.PRNGKey(1)}, x)


def fake_state_from_init(init):
    """Reverse-construct a torch-named VAESKConv state dict with the shapes
    of our init tree (validates key mapping and layout conversion)."""
    rng = np.random.RandomState(0)
    p = init["params"]
    state = {}
    for name, layer in sorted(p["encoder"].items()):
        i = int(name.split("_")[1])
        base = f"encoder.layers.{i}.0"
        w = rng.randn(*layer["conv"]["weight"].shape).astype(np.float32)
        state[f"{base}.residual.0.weight"] = w
        state[f"{base}.residual.0.mask"] = np.ones_like(w)
        state[f"{base}.residual.0.bias"] = rng.randn(
            *layer["conv"]["bias"].shape).astype(np.float32)
        state[f"{base}.residual.1.weight"] = rng.randn(
            *layer["norm"]["scale"].shape).astype(np.float32)
        state[f"{base}.residual.1.bias"] = rng.randn(
            *layer["norm"]["bias"].shape).astype(np.float32)
        sw = rng.randn(*layer["shortcut"]["weight"].shape).astype(np.float32)
        state[f"{base}.shortcut.weight"] = sw
        state[f"{base}.shortcut.mask"] = np.ones_like(sw)
        state[f"{base}.shortcut.bias"] = rng.randn(
            *layer["shortcut"]["bias"].shape).astype(np.float32)
    dec = p["decoder"]
    # VQDecoderV3 main indices: 0,1 ResBlocks; (2,3,4)x4 up stages; 14 final
    for n in range(2):
        for cidx, cname in ((0, "c1"), (2, "c2")):
            state[f"decoder.main.{n}.model.{cidx}.weight"] = rng.randn(
                *dec[f"res{n}_{cname}_w"].shape).astype(np.float32)
            state[f"decoder.main.{n}.model.{cidx}.bias"] = rng.randn(
                *dec[f"res{n}_{cname}_b"].shape).astype(np.float32)
    n_up = sum(1 for k in dec if k.startswith("up") and k.endswith("_w"))
    for n in range(n_up):
        idx = 3 + 3 * n
        state[f"decoder.main.{idx}.weight"] = rng.randn(
            *dec[f"up{n}_w"].shape).astype(np.float32)
        state[f"decoder.main.{idx}.bias"] = rng.randn(
            *dec[f"up{n}_b"].shape).astype(np.float32)
    state[f"decoder.main.{2 + 3 * n_up}.weight"] = rng.randn(
        *dec["final_w"].shape).astype(np.float32)
    state[f"decoder.main.{2 + 3 * n_up}.bias"] = rng.randn(
        *dec["final_b"].shape).astype(np.float32)
    if "fc_mu" in p:
        for fc in ("fc_mu", "fc_logvar"):
            state[f"{fc}.weight"] = rng.randn(
                *p[fc]["kernel"].shape[::-1]).astype(np.float32)
            state[f"{fc}.bias"] = rng.randn(
                *p[fc]["bias"].shape).astype(np.float32)
    return state


def test_fgd_conversion_structure_and_run():
    cfg = small_cfg()
    model = FGDEmbedder(cfg)
    init = _init_tree(model, cfg)
    state = fake_state_from_init(init)
    params = convert_fgd(state)
    assert_tree_matches(params, init)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 32, cfg.input_dim),
                    jnp.float32)
    z = model.apply(params, x, method=model.map2latent,
                    rngs={"vae": jax.random.PRNGKey(0)})
    assert z.shape == (2, 32 // 16, cfg.latent_dim)
    assert np.isfinite(np.asarray(z)).all()


def test_fgd_decoder_numeric_parity():
    """Converted VQDecoderV3 weights reproduce torch's forward exactly."""
    cfg = small_cfg()
    C, n_up, out_dim = cfg.latent_dim, cfg.num_layers, cfg.input_dim

    class ResBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.model = tnn.Sequential(
                tnn.Conv1d(c, c, 3, 1, 1), tnn.LeakyReLU(0.2),
                tnn.Conv1d(c, c, 3, 1, 1))

        def forward(self, x):
            return x + self.model(x)

    torch.manual_seed(7)
    # VQDecoderV3 channel plan (model.py:168-177): stage i maps
    # channels[i] -> channels[i+1], channels = [C]*(n_up-1) + [C, out_dim]
    channels = [C] * (n_up - 1) + [C, out_dim]
    layers = [ResBlock(C), ResBlock(C)]
    for i in range(n_up):
        layers += [tnn.Upsample(scale_factor=2, mode="nearest"),
                   tnn.Conv1d(channels[i], channels[i + 1], 3, 1, 1),
                   tnn.LeakyReLU(0.2)]
    layers += [tnn.Conv1d(channels[-1], channels[-1], 3, 1, 1)]
    tdec = tnn.Module()
    tdec.main = tnn.Sequential(*layers)
    tdec.eval()

    state = {f"decoder.{k}": v.detach().numpy()
             for k, v in tdec.state_dict().items()}
    # encoder stub entries so convert_fgd's encoder loop is satisfied
    model = FGDEmbedder(cfg)
    init = _init_tree(model, cfg)
    enc_state = {k: v for k, v in fake_state_from_init(init).items()
                 if k.startswith("encoder.") or k.startswith("fc_")}
    state.update(enc_state)
    params = convert_fgd(state)

    z = np.random.RandomState(2).randn(2, 2, C).astype(np.float32)
    with torch.no_grad():
        ref = tdec.main(torch.from_numpy(z).permute(0, 2, 1)
                        ).permute(0, 2, 1).numpy()
    out = model.apply(params, jnp.asarray(z), method=model.decode)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)
