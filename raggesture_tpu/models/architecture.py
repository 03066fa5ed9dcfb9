"""MotionDiffusion: training loss and inference orchestration.

Functional rebuild of the reference architecture (/root/reference/mogen/
models/architectures/diffusion_architecture.py:64-582): the frozen 4-part
VAE codec produces the 43-token latent sequence; training regresses the
denoiser's x0 prediction with a masked, body-part-weighted MSE; inference
runs DDPM/DDIM (optionally with DDIM inversion of retrieved exemplar latents,
noise splicing, insertion guidance, outpainting, and prev-latent handoff for
long-form synthesis) and decodes the result.

Everything here is a pure function of (params, batch, rng) so the train step
jits and shards with pjit, and the entire inference chain — conditions,
inversion scans, guided sampling scan, VAE decode — compiles into one XLA
program per shape signature.

Key deviation from the reference (for TPU): the reference DDIM-inverts
retrieved exemplars one (batch-item, query) at a time in a Python loop with
batch-1 shapes (diffusion_architecture.py:323-354); we stack all exemplars
into one batched inversion scan (``invert_exemplars``) — identical math,
one compiled program, B-fold parallel on the MXU.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion import gaussian as G
from ..diffusion import sampling as S
from ..diffusion.gaussian import MeanType, VarType
from ..diffusion.schedules import DiffusionSchedule, make_schedule
from .codec import CodecConfig, GestureCodec, part_features
from .conditioning import (
    ScaleFuncConfig,
    joint_scale_vector,
    make_conditioned_model_fn,
    make_mixed_model_fn,
    scale_func_table,
)
from .denoiser import (
    COND_KEYS,
    DenoiserConfig,
    GestureDenoiser,
    default_query_masks,
    latent_motion_mask,
)


@dataclasses.dataclass(frozen=True)
class DiffusionSpec:
    """diffusion_train / diffusion_test blocks of the shipped config
    (configs/raggesture_beatx/basegesture_len150_beat.py:140-158)."""

    beta_scheduler: str = "scaled_linear"
    diffusion_steps: int = 1000
    model_mean_type: str = "start_x"
    model_var_type: str = "fixed_large"
    respace: Optional[str] = None
    num_inference_timesteps: Optional[int] = None
    classifier_free_guidance_scale: float = 0.0

    def schedule(self) -> DiffusionSchedule:
        return make_schedule(
            self.beta_scheduler, self.diffusion_steps, self.respace,
            self.num_inference_timesteps,
        )

    @property
    def mean_type(self) -> MeanType:
        return MeanType(self.model_mean_type)

    @property
    def var_type(self) -> VarType:
        return VarType(self.model_var_type)


@dataclasses.dataclass(frozen=True)
class ArchitectureConfig:
    denoiser: DenoiserConfig = DenoiserConfig()
    codec: CodecConfig = CodecConfig()
    diffusion_train: DiffusionSpec = DiffusionSpec()
    diffusion_test: DiffusionSpec = DiffusionSpec(
        respace="15,15,8,6,6", num_inference_timesteps=50
    )
    scale_func: Optional[ScaleFuncConfig] = ScaleFuncConfig()
    per_joint_scale: Optional[Dict[str, float]] = None
    body_part_lossweights: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(upper=1.0, hands=1.0, face=1.0, lowertransl=1.0)
    )
    inference_type: str = "ddim"


class MotionDiffusionModel(nn.Module):
    """Bundle module: codec + denoiser under one parameter tree.

    Param layout: {"params": {"codec": ..., "denoiser": ...}} — the codec
    subtree is frozen at train time (optimizer masking), mirroring the
    reference's requires_grad=False VAEs + VAE_FreezeHook."""

    cfg: ArchitectureConfig = ArchitectureConfig()

    def setup(self):
        self.codec = GestureCodec(self.cfg.codec, name="codec")
        self.denoiser = GestureDenoiser(self.cfg.denoiser, name="denoiser")

    def encode_motion(self, batch: Dict[str, jnp.ndarray], rng=None, sample=True):
        feats = part_features(
            batch["motion_upper"], batch["motion_lower"], batch["motion_face"],
            batch["motion_hands"], batch["trans"], batch["facial"],
            batch["contact"],
        )
        return self.codec.encode(feats, batch.get("motion_mask"), rng=rng,
                                 sample=sample)

    def encode_motion_dist(self, batch: Dict[str, jnp.ndarray]):
        """(mu, logvar) at the 43-token layout — the frozen-codec latent
        cache's encode (see GestureCodec.encode_dist)."""
        feats = part_features(
            batch["motion_upper"], batch["motion_lower"], batch["motion_face"],
            batch["motion_hands"], batch["trans"], batch["facial"],
            batch["contact"],
        )
        return self.codec.encode_dist(feats, batch.get("motion_mask"))

    def decode_latents(self, z):
        return self.codec.decode(z)

    def encode_conditions(self, batch):
        return self.denoiser.encode_conditions(
            batch["word"], batch["audio"], batch["speaker_ids"]
        )

    def denoise(self, latents, t_orig, token_mask, conds, query_masks,
                cond_mask, deterministic=True):
        return self.denoiser(latents, t_orig, token_mask, conds, query_masks,
                             cond_mask, deterministic)

    def __call__(self, batch, rng=None):
        """Init-path: touch every submodule so flax creates all params."""
        z, token_mask = self.encode_motion(batch, rng=rng, sample=False)
        conds = self.encode_conditions(batch)
        B = z.shape[0]
        qm = default_query_masks(self.cfg.denoiser, B)
        t = jnp.zeros((B,), jnp.int32)
        cond_mask = jnp.ones((B, 1, 1))
        out = self.denoise(z, t, token_mask, conds, qm, cond_mask)
        dec = self.decode_latents(z)
        return out, dec


def init_params(model: MotionDiffusionModel, rng: jax.Array,
                batch: Dict[str, jnp.ndarray]):
    """Initialize parameters submodule-by-submodule.

    One monolithic ``model.init`` traces 4 VAE encoders+decoders plus the
    denoiser into a single XLA program whose compile time blows up
    super-linearly (>25 min on the remote compiler vs ~10 s per submodule).
    Each part is initialized in its own small jit and the trees are
    assembled into the exact structure ``model.init`` would produce."""
    from .codec import PART_NAMES, TransformerVAE
    from .denoiser import GestureDenoiser

    cfg = model.cfg
    B = batch["motion_upper"].shape[0]
    keys = jax.random.split(rng, len(PART_NAMES) + 1)

    codec_params = {}
    for i, part in enumerate(PART_NAMES):
        vcfg = cfg.codec.vae_config(part)
        vae = TransformerVAE(vcfg)
        x = jnp.zeros((1, cfg.codec.num_frames, vcfg.nfeats))

        @jax.jit
        def vae_init(key, x=x, vae=vae):
            pe = vae.init(key, x, sample=False, method=vae.encode_to_dist)
            z = jnp.zeros((1, cfg.codec.tokens_per_part, vcfg.latent_dim))
            pd = vae.init(key, z, method=vae.decode)
            # merge: encode and decode touch disjoint + shared submodules
            merged = dict(pd["params"])
            merged.update(pe["params"])
            return {"params": merged}

        codec_params[f"{part}_vae"] = vae_init(keys[i])["params"]

    den = GestureDenoiser(cfg.denoiser)
    dn = cfg.denoiser
    lat = jnp.zeros((1, dn.num_tokens, dn.latent_dim))
    t = jnp.zeros((1,), jnp.int32)
    mask = jnp.ones((1, dn.num_tokens))
    conds_raw = {
        "word": jnp.zeros((1, 4, dn.text_latent_dim)),
        "audio": jnp.zeros((1, 4, dn.audio_latent_dim)),
        "speaker_ids": jnp.zeros((1,), jnp.int32),
    }

    @jax.jit
    def den_init(key):
        def run(mdl):
            conds = mdl.encode_conditions(conds_raw["word"], conds_raw["audio"],
                                          conds_raw["speaker_ids"])
            qm = default_query_masks(dn, 1)
            return mdl(lat, t, mask, conds, qm, jnp.ones((1, 1, 1)))
        return nn.init(run, den)(key)

    den_params = den_init(keys[-1])["params"]
    return {"params": {"codec": codec_params, "denoiser": den_params}}


def lossweight_mask(cfg: ArchitectureConfig, token_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-token loss weights from body_part_lossweights
    (diffusion_architecture.py:167-173)."""
    w = jnp.ones_like(token_mask)
    slices = cfg.denoiser.part_slices()
    bw = cfg.body_part_lossweights
    names = {"upper": "upper", "hands": "hands", "face": "face",
             "lowertrans": "lowertransl"}
    for part, sl in slices.items():
        w = w.at[:, sl].set(bw[names[part]])
    return w


def training_loss(
    model: MotionDiffusionModel,
    params,
    sched_train: DiffusionSchedule,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    t: Optional[jnp.ndarray] = None,
    t_weights: Optional[jnp.ndarray] = None,
    return_per_sample: bool = False,
    fused_codec: bool = False,
    fused_ctx: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One training-loss evaluation (reference diffusion_architecture.py:
    178-212 + gaussian_diffusion.training_losses :1432-1535).

    Masked MSE between the denoiser's x0 prediction and the clean latents,
    weighted per body part, normalized by the token mask sum.

    ``fused_codec`` runs the frozen 4-part encode through the stacked
    3+1-program path (models/fused_codec.py) — same latent distribution
    (z0 is rsampled from the identical (mu, logvar); eps draws differ from
    the per-part path, like the latent cache).

    ``fused_ctx`` routes the denoiser forward through
    fused_denoiser.train_denoise_ctx: all-layer cross-attention contexts
    in one fused pass per condition stream (Pallas custom_vjp on TPU, the
    jnp reference elsewhere) — the round-5 fix for the cond-K/V chains
    that dominate the train device step (docs/TRAIN_DECOMP.json).  Same
    math as the flax forward (tests/test_cond_ctx.py); requires the
    shipped dropout=0 config (the fused path takes no dropout rng)."""
    cfg = model.cfg
    r_enc, r_t, r_noise, r_cond, r_drop = jax.random.split(rng, 5)

    if "latent_mu" in batch:
        # frozen-codec latent cache (datasets/latent_cache.py): z0 is drawn
        # from the precomputed per-window (mu, logvar) — distributionally
        # IDENTICAL to a live rsampling encode (fresh eps per step either
        # way) minus ~25 GFLOP/sample of frozen encode (docs/PERFORMANCE.md)
        mu = batch["latent_mu"].astype(jnp.float32)
        std = jnp.exp(0.5 * batch["latent_logvar"].astype(jnp.float32))
        z0 = mu + std * jax.random.normal(r_enc, mu.shape, mu.dtype)
        token_mask = latent_motion_mask(cfg.denoiser, batch["motion_mask"])
    elif fused_codec:
        from .fused_codec import fused_encode_dist, stack_codec_params
        from .layers import strided_token_mask

        feats = part_features(
            batch["motion_upper"], batch["motion_lower"],
            batch["motion_face"], batch["motion_hands"], batch["trans"],
            batch["facial"], batch["contact"])
        # the stack is rebuilt in-graph each step: pure reshapes/pads of
        # frozen params (~6 MB), negligible next to the ~25 GFLOP/sample
        # encode it batches, and grad-free under the stop_gradient below
        cp = params["params"]["codec"]
        mu, lv = fused_encode_dist(cfg.codec, cp,
                                   stack_codec_params(cp, cfg.codec),
                                   feats, batch.get("motion_mask"))
        z0 = mu + jnp.exp(0.5 * lv) * jax.random.normal(r_enc, mu.shape,
                                                        mu.dtype)
        fm = batch.get("motion_mask")
        if fm is None:
            fm = jnp.ones(batch["motion_upper"].shape[:2])
        token_mask = strided_token_mask(fm, cfg.codec.frame_chunk_size)
    else:
        with jax.named_scope("codec_encode"):
            z0, token_mask = model.apply(
                params, batch, rng=r_enc, sample=True,
                method=model.encode_motion
            )
    # the codec is frozen (reference: requires_grad=False VAEs +
    # VAE_FreezeHook) — stop_gradient lets XLA DCE the codec backward
    z0 = jax.lax.stop_gradient(z0)
    token_mask = jax.lax.stop_gradient(token_mask)
    B, T, D = z0.shape

    if t is None:
        # default uniform schedule sampler (gaussian_diffusion.py:62-74);
        # importance samplers draw t host-side and pass it in
        t = jax.random.randint(r_t, (B,), 0, sched_train.num_timesteps)
    noise = jax.random.normal(r_noise, z0.shape, z0.dtype)
    x_t = G.q_sample(sched_train, z0, t, noise)

    # named scopes land in op metadata (tf_op) so the train-step trace
    # decomposition (tools/dev/train_decomp.py) can attribute device time
    with jax.named_scope("cond_encode"):
        conds = model.apply(params, batch, method=model.encode_conditions)
    qm = default_query_masks(cfg.denoiser, B)
    # ~10% condition dropout: cond_type ~ U{0..99}, dropped when % 10 == 0
    cond_type = jax.random.randint(r_cond, (B, 1, 1), 0, 100)
    cond_mask = ((cond_type % 10) > 0).astype(z0.dtype)

    with jax.named_scope("denoise"):
        if fused_ctx:
            from .fused_denoiser import train_denoise_ctx

            assert cfg.denoiser.dropout == 0.0, \
                "fused_ctx training path supports the shipped dropout=0"
            pred = train_denoise_ctx(params, cfg.denoiser, x_t, t,
                                     token_mask, conds, qm, cond_mask)
        else:
            pred = model.apply(
                params, x_t, t, token_mask, conds, qm, cond_mask, False,
                method=model.denoise, rngs={"dropout": r_drop},
            )
    target = G.training_target(sched_train, cfg.diffusion_train.mean_type,
                               z0, x_t, noise, t)

    sq = jnp.mean((pred - target) ** 2, axis=-1)  # (B, T)
    lw = lossweight_mask(cfg, token_mask)
    masked = sq * token_mask * lw
    per_sample = masked.sum(axis=1) / jnp.maximum(token_mask.sum(axis=1), 1.0)
    if t_weights is not None:
        # importance-weighted objective (LossAwareSampler contract,
        # gaussian_diffusion.py:38-59)
        loss = (per_sample * t_weights).mean()
    else:
        loss = masked.sum() / jnp.maximum(token_mask.sum(), 1.0)
    logs = {"recon_loss": loss, "mse_unweighted": (sq * token_mask).sum()
            / jnp.maximum(token_mask.sum(), 1.0)}
    if return_per_sample:
        logs["per_sample_loss"] = per_sample
        logs["t"] = t
    return loss, logs


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class InferenceOptions:
    """The inference_kwargs surface of the reference
    (diffusion_architecture.py:214-249 + tools/visualize.py:74-95)."""

    use_inversion: bool = False
    insertion_guidance: bool = False
    guidance_lr: float = 0.1
    inversion_start_time: int = -1
    outpaint: bool = False
    use_prev_latent: bool = False
    eta: float = 0.0

    def validate(self):
        if self.outpaint:
            assert not self.use_inversion and not self.insertion_guidance
        if self.insertion_guidance:
            assert self.use_inversion
        if self.use_prev_latent:
            assert not self.outpaint


def guidance_iters_schedule(name_or_list, num_steps: int = 50) -> jnp.ndarray:
    """Named guidance-iteration schedules (tools/visualize.py:74-95).

    Indexed by spaced step i (0 = cleanest).  ``decreasing_till_25`` =
    [0]*25 + [0,1,...,24]: no guidance in the clean half, ramping iterations
    toward the noisy half."""
    h = num_steps // 2
    if isinstance(name_or_list, (list, tuple)):
        arr = list(name_or_list)
    elif name_or_list == "all_one":
        arr = [1] * num_steps
    elif name_or_list in ("all_zero", "none"):
        arr = [0] * num_steps
    elif name_or_list in ("all_10", "constant"):
        arr = [10] * num_steps
    elif name_or_list == "decreasing":
        arr = list(range(num_steps))
    elif name_or_list == "increasing":
        arr = list(range(num_steps - 1, -1, -1))
    elif name_or_list == "drop_decreasing_till_25":
        arr = [0] * h + list(range(num_steps))[h:]
    elif name_or_list == "step_increasing_from_25":
        arr = list(range(num_steps - 1, -1, -1))[:h] + [0] * (num_steps - h)
    elif name_or_list == "decreasing_till_25":
        arr = [0] * h + list(range(num_steps - h))
    elif name_or_list == "increasing_from_25":
        arr = list(range(h - 1, -1, -1)) + [0] * (num_steps - h)
    else:
        raise ValueError(f"unknown guidance schedule {name_or_list}")
    assert len(arr) == num_steps
    return jnp.asarray(arr, dtype=jnp.int32)


def masked_prev_latent(cfg: DenoiserConfig, prev_latent: jnp.ndarray) -> jnp.ndarray:
    """Long-form handoff: move each part's LAST latent token to its FIRST
    position, zero elsewhere (diffusion_architecture.py:286-297)."""
    out = jnp.zeros_like(prev_latent)
    for sl in cfg.part_slices().values():
        first = sl.start
        last = sl.stop - 1
        out = out.at[:, first].set(prev_latent[:, last])
    return out


def zero_first_tokens(cfg: DenoiserConfig, inv: jnp.ndarray) -> jnp.ndarray:
    """Zero each part's first token across all inversion steps — used with
    prev-latent handoff so guidance never fights the handoff token
    (diffusion_architecture.py:416-420). inv: (S, B, T, D)."""
    for sl in cfg.part_slices().values():
        inv = inv.at[:, :, sl.start, :].set(0.0)
    return inv


def generate(
    model: MotionDiffusionModel,
    params,
    sched_test: DiffusionSchedule,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    opts: InferenceOptions = InferenceOptions(),
    re_dict: Optional[Dict[str, Any]] = None,
    guidance_iters: Optional[jnp.ndarray] = None,
    prev_latent: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Full inference (diffusion_architecture.py:213-582).

    ``re_dict`` is the retrieval product (host-assembled, device arrays):
      raw_motion_latents (B, T, D)  - spliced exemplar latents (outpainting)
      inv_latents   (Q, T, D)       - uncropped exemplar latents to invert
      inv_conds     dict of stacked exemplar conditions (word/audio/speaker)
      inv_mask      (Q, T)          - exemplar token masks
      splice        (Q, 4) int      - (batch_idx, q_start, r_start, length)
                                      in latent-token units, for the
                                      upper+hands rows splice
    Returns decoded parts + the raw output latents (prev_latentout)."""
    opts.validate()
    cfg = model.cfg
    dcfg = cfg.denoiser
    r_noise, r_coef, r_loop = jax.random.split(rng, 3)

    z_gt, token_mask = model.apply(params, batch, rng=None, sample=False,
                                   method=model.encode_motion)
    B, T, D = z_gt.shape
    conds = model.apply(params, batch, method=model.encode_conditions)
    qm = default_query_masks(dcfg, B)

    def bound_apply(x, t_orig, mmask, cc, qq, cm):
        return model.apply(params, x, t_orig, mmask, cc, qq, cm, True,
                           method=model.denoise)

    # sampler model_fn with the scale-func condition mixing
    if cfg.scale_func is not None:
        coef_table = scale_func_table(r_coef, sched_test, cfg.scale_func,
                                      cfg.diffusion_train.diffusion_steps)
        js = joint_scale_vector(dcfg, cfg.per_joint_scale)
        model_fn = make_mixed_model_fn(
            lambda x, t, m, c, q, cm: bound_apply(x, t, m, c, q, cm),
            conds, token_mask, qm, coef_table, js,
        )
    else:
        model_fn = make_conditioned_model_fn(
            lambda x, t, m, c, q, cm: bound_apply(x, t, m, c, q, cm),
            conds, token_mask, qm,
        )

    mean_type = cfg.diffusion_test.mean_type
    var_type = cfg.diffusion_test.var_type
    cfg_scale = cfg.diffusion_test.classifier_free_guidance_scale
    common = dict(mean_type=mean_type, var_type=var_type, cfg_scale=cfg_scale)

    start_noise = jax.random.normal(r_noise, (B, T, D))
    inv_all = None

    if opts.use_inversion:
        assert re_dict is not None and "inv_latents" in re_dict
        inv_stack = invert_exemplars(model, params, sched_test, re_dict, **common)
        start_noise, inv_all = splice_inverted(
            dcfg, sched_test, start_noise, inv_stack, re_dict["splice"],
            opts.inversion_start_time, with_guidance=opts.insertion_guidance,
        )
        if opts.insertion_guidance and opts.use_prev_latent and prev_latent is not None:
            inv_all = zero_first_tokens(dcfg, inv_all)

    in_seq = None
    if opts.use_prev_latent and prev_latent is not None:
        in_seq = masked_prev_latent(dcfg, prev_latent)
    elif opts.outpaint:
        rml = re_dict["raw_motion_latents"]
        in_seq = rml[:, 0] if rml.ndim == 4 else rml

    if cfg.inference_type == "ddpm":
        # the DDPM loop takes none of the DDIM-only hooks — fail loudly
        # instead of silently discarding the (already computed) inversion
        # splice / in_seq (the reference cannot reach this combination
        # either: its guided/outpaint paths are DDIM-only,
        # diffusion_architecture.py:424-474)
        if opts.use_inversion or opts.insertion_guidance or in_seq is not None:
            raise ValueError(
                "inference_type='ddpm' supports none of use_inversion/"
                "insertion_guidance/outpaint/prev-latent — use the ddim "
                "sampler (the shipped config) for retrieval-guided modes")
        out = S.ddpm_sample_loop(model_fn, sched_test, start_noise, r_loop,
                                 **common)
    elif opts.insertion_guidance:
        gi = guidance_iters if guidance_iters is not None else \
            guidance_iters_schedule("constant", sched_test.num_timesteps)
        out = S.ddim_guided_sample_loop(
            model_fn, sched_test, start_noise, r_loop,
            inverted_latents=inv_all, guidance_iters=gi,
            guidance_lr=opts.guidance_lr, eta=opts.eta,
            init_in_seq=in_seq, **common,
        )
    else:
        out = S.ddim_sample_loop(model_fn, sched_test, start_noise, r_loop,
                                 eta=opts.eta, in_seq=in_seq, **common)

    decoded = model.apply(params, out, method=model.decode_latents)
    results = {f"pred_{k}": v for k, v in decoded.items()}
    results["prev_latentout"] = out
    results["output_latents"] = out
    return results


class StagedGenerator:
    """Inference split into separately-jitted stages.

    One monolithic ``generate`` program (4 VAE encodes + condition encoders +
    a 50-step denoiser scan + 4 VAE decodes) compiles super-linearly slowly
    on the remote TPU compiler; staging it into four jits (encode / conds /
    sampling scan / decode) costs only a few small host round-trips and
    compiles in minutes, with each stage cached independently.

    Supports the same options as :func:`generate` (inversion + insertion
    guidance + prev-latent + outpaint) EXCEPT stochastic DDIM: every
    pipeline compiles the RNG-free eta=0 chain, and a nonzero
    ``InferenceOptions.eta`` raises (use :func:`generate` for eta > 0)."""

    def __init__(self, model: MotionDiffusionModel, params,
                 sched_test: DiffusionSchedule, fused: bool = False,
                 merged_ca: bool = False, layer_kernel: bool = True,
                 bf16_conditions: Optional[bool] = None,
                 fused_codec: Optional[bool] = None):
        """``fused=True`` routes every denoiser call through the performance
        apply-path (models/fused_denoiser.py: Pallas self-attention kernel +
        stacked adaLN) — numerically equivalent, inference-only.
        ``merged_ca=True`` runs each layer's three cached-context
        cross-attentions + ca_mix as ONE Pallas kernel — measured ~10% slower
        than three separate kernels on v5e (26.1 vs 23.7 ms per 50-step scan),
        kept as an option for other shapes; it disables the (default)
        ``layer_kernel`` path, which would otherwise take precedence and
        never reach the merged-CA kernel."""
        self.model = model
        self._params = params
        self.sched = sched_test
        self.fused = fused
        self.merged_ca = merged_ca
        # fused (stacked 3-part) codec decode in the pipeline tail — the
        # measured serving-tail lever (models/fused_codec.py).  Defaults to
        # the fused perf path's setting; numerics are exact either way.
        self.fused_codec = fused if fused_codec is None else fused_codec
        # exemplar-inversion cache: the 50-step DDIM inversion of an
        # exemplar depends only on (params, exemplar latents, its own
        # conditions) — and memoized retrieval returns the SAME exemplars
        # across many clips, so the trajectories are reused.  Keyed by the
        # exemplar's sample name (re_dict["inv_names"]); each entry is an
        # (S, T, D) stack (~4.4 MB at flagship size).
        self.inv_cache_capacity = 64
        self._inv_cache: Dict[str, jnp.ndarray] = {}
        # assembled (stacked+padded) trajectories keyed by the exemplar-name
        # tuple: repeat calls with the same exemplar set (the memoized-
        # retrieval common case) dispatch ZERO assembly ops
        self._inv_stack_cache: Dict[tuple, jnp.ndarray] = {}
        # splice gather/mask memo: the numpy map build + 2 device puts cost
        # real per-call latency on remote-TPU rigs
        self._splice_memo: Dict[bytes, tuple] = {}
        # an explicitly-requested merged_ca wins over the default-on
        # layer kernel (fused_denoise_ctx checks layer_kernel first)
        self.layer_kernel = layer_kernel and not merged_ca
        # ship the big condition features (word/audio, ~1.6 MB/clip) to the
        # device as bfloat16: on TPU the MXU rounds f32 matmul operands to
        # bf16 anyway (docs/PERFORMANCE.md), so this halves the dominant
        # per-dispatch transfer at zero numeric cost.  Off by default on
        # CPU, where matmuls are true f32 and the cast would be visible.
        self.bf16_conditions = (
            bf16_conditions if bf16_conditions is not None
            else jax.default_backend() == "tpu")
        cfg = model.cfg

        self._encode = jax.jit(
            lambda p, b: model.apply(p, b, rng=None, sample=False,
                                     method=model.encode_motion)
        )
        self._conds = jax.jit(
            lambda p, b: model.apply(p, b, method=model.encode_conditions)
        )

        def encode_and_conds(p, b):
            # one dispatch for both call-prologue stages (each jit call pays
            # a full tunnel round-trip on this rig)
            z, mask = model.apply(p, b, rng=None, sample=False,
                                  method=model.encode_motion)
            cc = model.apply(p, b, method=model.encode_conditions)
            return z, mask, cc

        self._encode_and_conds = jax.jit(encode_and_conds)
        self._decode = jax.jit(
            lambda p, z: model.apply(p, z, method=model.decode_latents)
        )

        mean_type = cfg.diffusion_test.mean_type
        var_type = cfg.diffusion_test.var_type
        cfg_scale = cfg.diffusion_test.classifier_free_guidance_scale
        self._common = dict(mean_type=mean_type, var_type=var_type,
                            cfg_scale=cfg_scale)

        def bound_apply(p, x, t_orig, mmask, cc, qq, cm):
            return model.apply(p, x, t_orig, mmask, cc, qq, cm, True,
                               method=model.denoise)

        def build_model_fn(p, conds, token_mask, qm, coef_table, js,
                           mixed: bool, pro=None):
            """Sampler model_fn for one traced loop.

            Fused path: the linear cross-attention contexts (a function of
            the conditions only, never of x or t) are precomputed HERE —
            once per loop trace, outside the scan — so the 50-step chain
            never touches the condition-side GEMMs (the reference recomputes
            k/v in all 2x50x8x3 cross-attention calls)."""
            mixed = mixed and cfg.scale_func is not None
            if not fused:
                ba = lambda *a: bound_apply(p, *a)
                if mixed:
                    return make_mixed_model_fn(ba, conds, token_mask, qm,
                                               coef_table, js)
                return make_conditioned_model_fn(ba, conds, token_mask, qm)

            from .conditioning import mix_outputs
            from .fused_denoiser import (
                adaln_table,
                fused_denoise_ctx,
                layer_kernel_mask_rows,
                pack_layers,
                precompute_cross_contexts,
                stack_layer_contexts,
            )

            pd = p["params"]["denoiser"] if "denoiser" in p.get(
                "params", {}) else p["params"]
            # every sampling loop's t_orig is timestep_map[step_idx] and is
            # shared across the batch, so the adaLN rows for ALL steps are
            # one GEMM (see fused_denoiser.adaln_table) — precomputed ONCE
            # per generator together with the packed layer weights and
            # passed in as ``pro`` (rebuilding them inside each clip's
            # program cost ~1.5 ms/clip of parameter re-layout)
            if pro is not None:
                table, wpacks = pro
            else:
                table = adaln_table(p, cfg.denoiser,
                                    jnp.asarray(sched_test.timestep_map))
                wpacks = pack_layers(pd, cfg.denoiser, self.layer_kernel)

            def _stack_ctx3(ctx):
                # per-layer (B, 3, D, D) context stacks: conditions-only,
                # built once per run OUTSIDE the scan (XLA does not hoist
                # ops feeding a Pallas custom-call out of the loop).  The
                # layer kernel wants pack-precision (bf16) stacks; the
                # optional merged-CA kernel keeps its historical f32.
                if jax.default_backend() != "tpu":
                    return None
                if self.layer_kernel:
                    return stack_layer_contexts(cfg.denoiser, ctx)
                if self.merged_ca:
                    return stack_layer_contexts(cfg.denoiser, ctx,
                                                dtype=jnp.float32)
                return None

            def _mask_rows(mask, qmasks):
                # once-per-run validity/query-mask row tables for the layer
                # kernel (conditions-only — the pad/stack must not repeat
                # inside the scan, see layer_kernel_mask_rows)
                if not (self.layer_kernel
                        and jax.default_backend() == "tpu"):
                    return None, None
                return layer_kernel_mask_rows(cfg.denoiser, mask, qmasks)
            if mixed:
                B = token_mask.shape[0]
                conds2 = {k: jnp.concatenate([v, v], axis=0)
                          for k, v in conds.items()}
                mask2 = jnp.concatenate([token_mask, token_mask], axis=0)
                qm2 = {k: jnp.concatenate([v, v], axis=0)
                       for k, v in qm.items()}
                cm2 = jnp.concatenate(
                    [jnp.ones((B, 1, 1)), jnp.zeros((B, 1, 1))], axis=0)
                ctx = precompute_cross_contexts(pd, cfg.denoiser, conds2, cm2)
                ctx3s = _stack_ctx3(ctx)
                mrows2, qrows2 = _mask_rows(mask2, qm2)

                def model_fn(x, t_orig, step_idx):
                    Bx = x.shape[0]
                    x2 = jnp.concatenate([x, x], axis=0)
                    t2 = jnp.concatenate([t_orig, t_orig], axis=0)
                    out = fused_denoise_ctx(p, cfg.denoiser, x2, t2, mask2,
                                            ctx, qm2, merged_ca=self.merged_ca,
                                            adaln_row=table[step_idx],
                                            layer_kernel=self.layer_kernel,
                                            packed_layers=wpacks,
                                            ctx3_list=ctx3s,
                                            mask_rows=mrows2,
                                            qmask_rows=qrows2)
                    return mix_outputs(out, Bx, coef_table, step_idx, js)

                return model_fn

            cm = jnp.ones((token_mask.shape[0], 1, 1))
            ctx = precompute_cross_contexts(pd, cfg.denoiser, conds, cm)
            ctx3s = _stack_ctx3(ctx)
            mrows, qrows = _mask_rows(token_mask, qm)

            def model_fn(x, t_orig, step_idx):
                return fused_denoise_ctx(p, cfg.denoiser, x, t_orig,
                                         token_mask, ctx, qm,
                                         merged_ca=self.merged_ca,
                                         adaln_row=table[step_idx],
                                         layer_kernel=self.layer_kernel,
                                         packed_layers=wpacks,
                                         ctx3_list=ctx3s,
                                         mask_rows=mrows,
                                         qmask_rows=qrows)

            return model_fn

        def ddim_loop(p, noise, rng, conds, token_mask, coef_table, js,
                      in_seq, pro, use_in_seq):
            qm = default_query_masks(cfg.denoiser, noise.shape[0])
            model_fn = build_model_fn(p, conds, token_mask, qm, coef_table,
                                      js, mixed=True, pro=pro)
            return S.ddim_sample_loop(
                model_fn, sched_test, noise, rng,
                in_seq=in_seq if use_in_seq else None, **self._common,
            )

        self._ddim_plain = jax.jit(partial(ddim_loop, use_in_seq=False),
                                   static_argnames=())
        self._ddim_inseq = jax.jit(partial(ddim_loop, use_in_seq=True))

        def guided_loop(p, noise, rng, conds, token_mask, coef_table, js,
                        inv_all, gi, lr, init_in_seq, pro):
            qm = default_query_masks(cfg.denoiser, noise.shape[0])
            model_fn = build_model_fn(p, conds, token_mask, qm, coef_table,
                                      js, mixed=True, pro=pro)
            return S.ddim_guided_sample_loop(
                model_fn, sched_test, noise, rng, inverted_latents=inv_all,
                guidance_iters=gi, guidance_lr=lr, init_in_seq=init_in_seq,
                **self._common,
            )

        self._guided = jax.jit(guided_loop)

        def invert_loop(p, inv_lat, inv_mask, conds, pro):
            Q = inv_lat.shape[0]
            qm = default_query_masks(cfg.denoiser, Q)
            mf = build_model_fn(p, conds, inv_mask, qm, None, None,
                                mixed=False, pro=pro)
            return S.ddim_reverse_sample_loop(
                mf, sched_test, inv_lat, return_all_timesteps=True,
                **self._common,
            )

        self._invert = jax.jit(invert_loop)

        def ddim_cond_loop(p, noise, token_mask, conds, pro):
            """Plain conditioned DDIM (no scale-func mixing) — the exact
            forward inverse of invert_loop, for the inversion self-check."""
            qm = default_query_masks(cfg.denoiser, noise.shape[0])
            model_fn = build_model_fn(p, conds, token_mask, qm, None, None,
                                      mixed=False, pro=pro)
            return S.ddim_sample_loop(model_fn, sched_test, noise,
                                      jax.random.PRNGKey(0), **self._common)

        self._ddim_cond = jax.jit(ddim_cond_loop)

        def prep(r_coef, r_noise, shape):
            """Per-call prologue (one dispatch): the scale-func coefficient
            table with its >t100 coin flips + the start noise."""
            coef = (
                scale_func_table(r_coef, sched_test, cfg.scale_func,
                                 cfg.diffusion_train.diffusion_steps)
                if cfg.scale_func is not None
                else jnp.zeros((sched_test.num_timesteps, 4))
            )
            return coef, jax.random.normal(r_noise, shape)

        self._prep = jax.jit(prep, static_argnames=("shape",))

        def pipeline_prologue(p, core, rng, pro):
            """Shared pipeline head: rng splits (mirroring __call__, so
            pipeline outputs match the staged path bit-for-bit for the same
            rng), condition encoders, token mask from the frame mask (the
            GT motion encode — 4 VAE encoders — is skipped entirely),
            scale-func coefficient table + start noise, and the mixed
            model_fn with its precomputed cross-attention contexts."""
            r_noise, r_coef, r_loop = jax.random.split(rng, 3)
            conds = model.apply(p, core, method=model.encode_conditions)
            token_mask = latent_motion_mask(cfg.denoiser,
                                            core["motion_mask"])
            B = token_mask.shape[0]
            T, D = cfg.denoiser.num_tokens, cfg.denoiser.latent_dim
            coef_table, noise = prep(r_coef, r_noise, (B, T, D))
            qm = default_query_masks(cfg.denoiser, B)
            js = joint_scale_vector(cfg.denoiser, cfg.per_joint_scale)
            model_fn = build_model_fn(p, conds, token_mask, qm, coef_table,
                                      js, mixed=True, pro=pro)
            return model_fn, noise, r_loop

        def pipeline_results(p, out, cstack):
            """Shared pipeline tail: 4-part VAE decode + the uniform return
            contract (same keys for every option combination).  ``cstack``
            (the stacked 3-part codec tree, parameter-only — built once per
            generator like ``pro``) routes the decode through the fused
            2-program path; None falls back to 4 per-part passes."""
            if cstack is not None:
                from .fused_codec import fused_decode

                decoded = fused_decode(cfg.codec, p["params"]["codec"],
                                       cstack, out)
            else:
                decoded = model.apply(p, out, method=model.decode_latents)
            results = {f"pred_{k}": v for k, v in decoded.items()}
            results["prev_latentout"] = out
            results["output_latents"] = out
            return results

        def invert_section(p, inv_core, inv_lat, inv_mask, pro):
            """Batched exemplar inversion under the exemplars' OWN raw
            conditions (no scale-func mixing)."""
            inv_conds = model.apply(p, inv_core,
                                    method=model.encode_conditions)
            qm_inv = default_query_masks(cfg.denoiser, inv_lat.shape[0])
            mf_inv = build_model_fn(p, inv_conds, inv_mask, qm_inv, None,
                                    None, mixed=False, pro=pro)
            return S.ddim_reverse_sample_loop(
                mf_inv, sched_test, inv_lat, return_all_timesteps=True,
                **self._common)

        def sample_pipeline(p, batch, rng, pro, cstack):
            """Plain DDIM generation as ONE program: condition encoders ->
            scale-func table + start noise -> 50-step sampling scan -> 4-part
            VAE decode.

            The staged path costs 4 host->device dispatches per clip (a full
            tunnel round trip each on remote-TPU rigs); plain generation
            (no retrieval / inversion / in_seq — the bench.py protocol and
            the no-retrieval visualize path) needs none of the intermediate
            host values, so it runs in a single dispatch."""
            model_fn, noise, r_loop = pipeline_prologue(p, batch, rng, pro)
            out = S.ddim_sample_loop(model_fn, sched_test, noise, r_loop,
                                     **self._common)
            return pipeline_results(p, out, cstack)

        self._sample_pipeline = jax.jit(sample_pipeline)

        def sample_inseq_pipeline(p, batch, rng, in_seq, pro, cstack):
            """sample_pipeline with the in_seq q-sample overwrite (outpaint
            / prev-latent long-form handoff) — one dispatch per chunk."""
            model_fn, noise, r_loop = pipeline_prologue(p, batch, rng, pro)
            out = S.ddim_sample_loop(model_fn, sched_test, noise, r_loop,
                                     in_seq=in_seq, **self._common)
            return pipeline_results(p, out, cstack)

        self._sample_inseq_pipeline = jax.jit(sample_inseq_pipeline)

        def guided_pipeline(p, core, inv_lat, inv_mask, inv_core, gather,
                            smask, gi, lr, rng, pro, cstack,
                            inversion_start_time):
            """Inversion + splice + insertion-guided DDIM + decode as ONE
            program (the common retrieval-guided configuration: no
            outpaint / prev-latent).  The staged path pays ~7 host->device
            dispatches per clip; this pays 1.  The splice gather/mask index
            maps arrive precomputed (host data — see splice_inverted)."""
            model_fn, noise, r_loop = pipeline_prologue(p, core, rng, pro)
            inv_stack = invert_section(p, inv_core, inv_lat, inv_mask, pro)
            start_noise, inv_all = _splice_apply(
                noise, inv_stack, gather, smask, inversion_start_time, True)
            out = S.ddim_guided_sample_loop(
                model_fn, sched_test, start_noise, r_loop,
                inverted_latents=inv_all, guidance_iters=gi,
                guidance_lr=lr, init_in_seq=jnp.zeros_like(start_noise),
                **self._common)
            return pipeline_results(p, out, cstack)

        self._guided_pipeline = jax.jit(
            guided_pipeline, static_argnames=("inversion_start_time",))

        def guided_pipeline_cached(p, core, inv_stack, gather, smask, gi,
                                   lr, rng, pro, cstack,
                                   inversion_start_time):
            """guided_pipeline with the exemplar-inversion scan REMOVED:
            ``inv_stack`` (S, Q, T, D) arrives precomputed (from the
            per-exemplar inversion cache).  At full cache hit the guided
            configuration costs the same scan as plain sampling plus the
            analytic guidance updates."""
            model_fn, noise, r_loop = pipeline_prologue(p, core, rng, pro)
            start_noise, inv_all = _splice_apply(
                noise, inv_stack, gather, smask, inversion_start_time, True)
            out = S.ddim_guided_sample_loop(
                model_fn, sched_test, start_noise, r_loop,
                inverted_latents=inv_all, guidance_iters=gi,
                guidance_lr=lr, init_in_seq=jnp.zeros_like(start_noise),
                **self._common)
            return pipeline_results(p, out, cstack)

        self._guided_pipeline_cached = jax.jit(
            guided_pipeline_cached,
            static_argnames=("inversion_start_time",))

        self._refresh_prologue()

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, new_params):
        # swapping parameters (EMA weights, a reloaded checkpoint) must
        # recompute the parameter-only prologue, or the pipelines would
        # mix the new params with the construction-time adaLN table /
        # packed weights — and invalidates every cached inversion
        self._params = new_params
        self._inv_cache.clear()
        self._inv_stack_cache.clear()
        self._refresh_prologue()

    def _cached_inv_stack(self, p, inv_lat, inv_mask, inv_core, names,
                          q_bucket):
        """(S, q_bucket, T, D) padded inversion trajectories with
        per-exemplar caching.

        Misses are inverted in ONE bucketed _invert call (power-of-two Q so
        the jit compiles per bucket, not per distinct miss count); the
        assembled padded stack is itself memoized by the exemplar-name
        tuple, so repeat calls with the same exemplar set (memoized
        retrieval) dispatch no assembly ops at all."""
        skey = (tuple(names), q_bucket)
        hit = self._inv_stack_cache.get(skey)
        if hit is not None:
            return hit
        for n in names:  # LRU: touch hits BEFORE eviction can reach them
            if n in self._inv_cache:
                self._inv_cache[n] = self._inv_cache.pop(n)
        missing = [i for i, n in enumerate(names) if n not in self._inv_cache]
        if missing:
            Qm = len(missing)
            Qb = 1 << max(Qm - 1, 0).bit_length()
            idx = jnp.asarray(missing + [missing[0]] * (Qb - Qm))
            sub_core = {k: jnp.asarray(v)[idx] for k, v in inv_core.items()}
            conds = self._conds(p, sub_core)
            stack = self._invert(p, inv_lat[idx], inv_mask[idx], conds,
                                 self._pro)
            for j, i in enumerate(missing):
                self._inv_cache[names[i]] = stack[:, j]
            # evict oldest-first, but never a name this call still needs
            # (Q may exceed the capacity; allow temporary overflow then)
            need = set(names)
            for victim in list(self._inv_cache):
                if len(self._inv_cache) <= self.inv_cache_capacity:
                    break
                if victim not in need:
                    self._inv_cache.pop(victim)
        rows = [self._inv_cache[n] for n in names]
        rows += [jnp.zeros_like(rows[0])] * (q_bucket - len(rows))
        assembled = jnp.stack(rows, axis=1)
        self._inv_stack_cache[skey] = assembled
        while len(self._inv_stack_cache) > self.inv_cache_capacity:
            self._inv_stack_cache.pop(next(iter(self._inv_stack_cache)))
        return assembled

    def inv_cache_fingerprint(self) -> str:
        """Identity key for PERSISTED inversion trajectories: the parameter
        tree plus everything else a trajectory depends on — the test
        schedule's timestep map, the sampler statics (mean/var type, CFG
        scale) and the apply path (fused / layer-kernel / merged-CA /
        bf16-conditions, whose results differ at float ulp level).  Same
        contract as the retrieval memo's corpus fingerprint
        (retrieval/database.py — the rebuild of DatabaseSaveHook,
        /root/reference/mogen/core/model_freeze_hooks.py:48-181)."""
        import hashlib
        import json

        from ..datasets.latent_cache import tree_fingerprint

        ident = {
            "params": tree_fingerprint(self._params),
            "timestep_map": [int(t) for t in self.sched.timestep_map],
            "mean_type": str(self._common["mean_type"]),
            "var_type": str(self._common["var_type"]),
            "cfg_scale": float(self._common["cfg_scale"]),
            "path": [bool(self.fused), bool(self.layer_kernel),
                     bool(self.merged_ca), bool(self.bf16_conditions)],
        }
        return hashlib.sha1(
            json.dumps(ident, sort_keys=True).encode()).hexdigest()[:16]

    def save_inv_cache(self, path: str) -> int:
        """Persist the per-exemplar inversion cache to ``path`` (one .npz:
        the (N, S, T, D) trajectory stack + a fingerprinted name manifest),
        so a serving restart does not re-pay the 50-step inversion of every
        exemplar it has already seen.  Returns the number of entries
        written (0 = nothing cached yet, no file touched)."""
        import json
        import os

        import numpy as np

        names = list(self._inv_cache)  # insertion order == LRU oldest-first
        if not names:
            return 0
        stack = np.stack([np.asarray(self._inv_cache[n], np.float32)
                          for n in names])
        meta = json.dumps({"fingerprint": self.inv_cache_fingerprint(),
                           "names": names})
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, stack=stack,
                     meta=np.frombuffer(meta.encode(), np.uint8))
        os.replace(tmp, path)
        return len(names)

    def load_inv_cache(self, path: str) -> int:
        """Load trajectories persisted by :meth:`save_inv_cache` into the
        live cache (preserving their LRU order, keeping the most-recent
        ``inv_cache_capacity``).  A missing file or a fingerprint mismatch
        (different weights / schedule / apply path) is silently a no-op —
        the cache is an accelerator, never a correctness input.  Returns
        the number of entries loaded."""
        import json
        import os

        import numpy as np

        if not os.path.exists(path):
            return 0
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"].tobytes()).decode())
            if meta.get("fingerprint") != self.inv_cache_fingerprint():
                return 0
            stack = np.asarray(z["stack"])
        keep = meta["names"][max(0, len(meta["names"])
                                 - self.inv_cache_capacity):]
        off = len(meta["names"]) - len(keep)
        for j, n in enumerate(keep):
            self._inv_cache[n] = jnp.asarray(stack[off + j])
        return len(keep)

    def _cast_conds(self, d):
        """bf16 on the wire for word/audio (see ``bf16_conditions``):
        one shared policy with the train runner (utils/wire.py).  Numpy
        arrays only — device-resident inputs were already shipped, and an
        eager device cast would add a dispatch for nothing."""
        if not self.bf16_conditions:
            return d
        from ..utils.wire import cast_condition_features

        return cast_condition_features(d)

    def _splice_maps_memo(self, splice, B: int):
        """Memoized splice_maps: the gather/mask build is pure host data
        layout + two device puts — worth skipping on repeat calls."""
        import numpy as np

        key = (np.asarray(splice).tobytes(), B)
        hit = self._splice_memo.get(key)
        if hit is None:
            hit = splice_maps(self.model.cfg.denoiser, splice, B,
                              self.model.cfg.denoiser.num_tokens)
            self._splice_memo[key] = hit
            while len(self._splice_memo) > 256:
                self._splice_memo.pop(next(iter(self._splice_memo)))
        return hit

    def _refresh_prologue(self):
        """One-time (per params) prologue: the adaLN step table + packed
        layer weights + the stacked codec tree are pure functions of the
        parameters; rebuilding them inside every clip's program cost
        ~1.5 ms/clip."""
        cfg = self.model.cfg
        params = self._params
        self._codec_stack = None
        if self.fused_codec and "codec" in params.get("params", {}):
            from .fused_codec import stack_codec_params

            self._codec_stack = stack_codec_params(
                params["params"]["codec"], cfg.codec)
        if not self.fused:
            self._pro = None
            return
        from .fused_denoiser import adaln_table, pack_layers

        pd0 = params["params"]["denoiser"] if "denoiser" in params.get(
            "params", {}) else params["params"]
        self._pro = (
            adaln_table(params, cfg.denoiser,
                        jnp.asarray(self.sched.timestep_map)),
            pack_layers(pd0, cfg.denoiser, self.layer_kernel),
        )

    def sample(self, batch, rng):
        """Single-dispatch plain generation (see sample_pipeline above).
        Identical to ``self(batch, rng)`` with default InferenceOptions
        (both route through sample_pipeline)."""
        b = self._cast_conds({k: batch[k] for k in (
            "word", "audio", "speaker_ids", "motion_mask")})
        return self._sample_pipeline(self.params, b, rng, self._pro,
                                     self._codec_stack)

    def inversion_self_check(self, re_dict) -> Dict[str, jnp.ndarray]:
        """Numerical sanity check of the DDIM inversion round-trip
        (reference --visualize_inversion, diffusion_architecture.py:316-382):

          - ``error_curve`` (S, Q): MSE between each inversion step's latent
            and the clean exemplar latent — should grow with noise level;
          - ``recon_error`` (Q,): MSE after DDIM-sampling back down from the
            final inverted latent under the same conditions — should be
            small (the round trip is the identity up to discretization);
          - ``recon_decoded``: decoded body-part motions of the round-trip
            reconstruction (for visual comparison against retrieval_0.npz).
        """
        p = self.params
        inv_lat = jnp.asarray(re_dict["inv_latents"])
        inv_mask = jnp.asarray(re_dict["inv_mask"])
        inv_conds = self._conds(
            p, self._cast_conds(_inv_conds_core(re_dict)))
        stack = self._invert(p, inv_lat, inv_mask, inv_conds, self._pro)
        error_curve = jnp.mean((stack - inv_lat[None]) ** 2, axis=(2, 3))
        recon = self._ddim_cond(p, stack[-1], inv_mask, inv_conds, self._pro)
        recon_error = jnp.mean((recon - inv_lat) ** 2, axis=(1, 2))
        decoded = self._decode(p, recon)
        return {"error_curve": error_curve, "recon_error": recon_error,
                "recon_decoded": {f"pred_{k}": v for k, v in decoded.items()}}

    def __call__(self, batch, rng, opts: InferenceOptions = InferenceOptions(),
                 re_dict=None, guidance_iters=None, prev_latent=None):
        opts.validate()
        if opts.eta:
            # every StagedGenerator pipeline is compiled as the RNG-free
            # eta=0 DDIM chain (the shipped config, docs/PERFORMANCE.md);
            # silently ignoring a nonzero eta would return deterministic
            # samples for a stochastic request
            raise NotImplementedError(
                "StagedGenerator compiles eta=0 DDIM only; use generate() "
                "for eta > 0")
        cfg = self.model.cfg
        dcfg = cfg.denoiser
        p = self.params

        if (opts.use_inversion and opts.insertion_guidance
                and not opts.outpaint
                and not (opts.use_prev_latent and prev_latent is not None)):
            # the common retrieval-guided configuration runs as ONE
            # program (see guided_pipeline); other option combinations
            # keep the general staged path below
            gi = guidance_iters if guidance_iters is not None else \
                guidance_iters_schedule("constant", self.sched.num_timesteps)
            core = self._cast_conds({k: batch[k] for k in (
                "word", "audio", "speaker_ids", "motion_mask")})
            inv_core = self._cast_conds(_inv_conds_core(re_dict))
            inv_lat = jnp.asarray(re_dict["inv_latents"])
            inv_mask = jnp.asarray(re_dict["inv_mask"])
            B = jnp.asarray(batch["motion_mask"]).shape[0]
            gather, smask = self._splice_maps_memo(re_dict["splice"], B)
            Q = inv_lat.shape[0]
            Qb = 1 << max(Q - 1, 0).bit_length()
            inv_names = re_dict.get("inv_names")
            if (self.inv_cache_capacity > 0 and inv_names is not None
                    and len(inv_names) == Q and re_dict.get("num_queries")):
                # per-exemplar inversion caching: memoized retrieval repeats
                # exemplars across clips, so their 50-step inversion scans
                # amortize away and guided sampling approaches plain cost
                stack = self._cached_inv_stack(p, inv_lat, inv_mask,
                                               inv_core, list(inv_names), Qb)
                return self._guided_pipeline_cached(
                    p, core, stack, gather, smask, jnp.asarray(gi),
                    opts.guidance_lr, rng, self._pro, self._codec_stack,
                    inversion_start_time=int(opts.inversion_start_time))
            # the exemplar count varies per clip with retrieval hits;
            # bucket it to the next power of two (zero rows, mask 0) so
            # the monolithic pipeline compiles once per bucket, not once
            # per distinct Q (the splice gather never references pad rows)
            if Qb != Q:
                padq = lambda a: jnp.concatenate(
                    [a, jnp.zeros((Qb - Q,) + a.shape[1:], a.dtype)], axis=0)
                inv_lat, inv_mask = padq(inv_lat), padq(inv_mask)
                inv_core = {k: padq(v) for k, v in inv_core.items()}
            return self._guided_pipeline(
                p, core, inv_lat, inv_mask, inv_core, gather, smask,
                jnp.asarray(gi), opts.guidance_lr, rng, self._pro,
                self._codec_stack,
                inversion_start_time=int(opts.inversion_start_time))

        if not opts.use_inversion and not opts.insertion_guidance:
            # plain / outpaint / prev-latent generation without inversion:
            # also one dispatch (sample_pipeline variants)
            core = self._cast_conds({k: batch[k] for k in (
                "word", "audio", "speaker_ids", "motion_mask")})
            if opts.use_prev_latent and prev_latent is not None:
                in_seq = masked_prev_latent(dcfg, prev_latent)
            elif opts.outpaint:
                rml = jnp.asarray(re_dict["raw_motion_latents"])
                in_seq = rml[:, 0] if rml.ndim == 4 else rml
            else:
                return self._sample_pipeline(p, core, rng, self._pro,
                                             self._codec_stack)
            return self._sample_inseq_pipeline(p, core, rng, in_seq,
                                               self._pro, self._codec_stack)

        r_noise, r_coef, r_loop = jax.random.split(rng, 3)

        z_gt, token_mask, conds = self._encode_and_conds(
            p, self._cast_conds({k: batch[k] for k in (
                "motion_upper", "motion_lower", "motion_face", "motion_hands",
                "trans", "facial", "contact", "motion_mask", "word", "audio",
                "speaker_ids") if k in batch}))
        B, T, D = z_gt.shape
        coef_table, start_noise = self._prep(r_coef, r_noise, (B, T, D))
        js = joint_scale_vector(dcfg, cfg.per_joint_scale)
        inv_all = None

        if opts.use_inversion:
            inv_conds = self._conds(
            p, self._cast_conds(_inv_conds_core(re_dict)))
            inv_stack = self._invert(p, jnp.asarray(re_dict["inv_latents"]),
                                     jnp.asarray(re_dict["inv_mask"]),
                                     inv_conds, self._pro)
            start_noise, inv_all = splice_inverted(
                dcfg, self.sched, start_noise, inv_stack, re_dict["splice"],
                opts.inversion_start_time,
                with_guidance=opts.insertion_guidance,
            )
            if (opts.insertion_guidance and opts.use_prev_latent
                    and prev_latent is not None):
                inv_all = zero_first_tokens(dcfg, inv_all)

        in_seq = jnp.zeros_like(start_noise)
        use_in_seq = False
        if opts.use_prev_latent and prev_latent is not None:
            in_seq = masked_prev_latent(dcfg, prev_latent)
            use_in_seq = True
        elif opts.outpaint:
            rml = jnp.asarray(re_dict["raw_motion_latents"])
            in_seq = rml[:, 0] if rml.ndim == 4 else rml
            use_in_seq = True

        if opts.insertion_guidance:
            gi = guidance_iters if guidance_iters is not None else \
                guidance_iters_schedule("constant", self.sched.num_timesteps)
            out = self._guided(p, start_noise, r_loop, conds, token_mask,
                               coef_table, js, inv_all, gi,
                               opts.guidance_lr, in_seq, self._pro)
        elif use_in_seq:
            out = self._ddim_inseq(p, start_noise, r_loop, conds, token_mask,
                                   coef_table, js, in_seq, self._pro)
        else:
            out = self._ddim_plain(p, start_noise, r_loop, conds, token_mask,
                                   coef_table, js, in_seq, self._pro)

        decoded = self._decode(p, out)
        results = {f"pred_{k}": v for k, v in decoded.items()}
        results["prev_latentout"] = out
        results["output_latents"] = out
        # NOTE: no gt_latents key — the single-dispatch pipelines never
        # encode GT motion, so the return contract is identical across every
        # option combination (the reference's forward_test returns none
        # either, diffusion_architecture.py:188-420).
        return results


def invert_exemplars(model, params, sched_test, re_dict, *, mean_type,
                     var_type, cfg_scale):
    """Batched DDIM inversion of all retrieved exemplars at once.

    Each exemplar is inverted under its OWN text/audio/speaker conditions
    (diffusion_architecture.py:334-354).  Returns (S, Q, T, D): the inversion
    trajectory of each exemplar, clean->noisy."""
    inv_lat = re_dict["inv_latents"]          # (Q, T, D)
    inv_conds = re_dict["inv_conds"]          # dict of (Q, ., .)
    inv_mask = re_dict["inv_mask"]            # (Q, T)
    Q = inv_lat.shape[0]

    conds = model.apply(
        params,
        {"word": inv_conds["word"], "audio": inv_conds["audio"],
         "speaker_ids": inv_conds["speaker_ids"]},
        method=model.encode_conditions,
    )
    qm = default_query_masks(model.cfg.denoiser, Q)

    def bound_apply(x, t_orig, step_idx):
        cm = jnp.ones((x.shape[0], 1, 1), x.dtype)
        return model.apply(params, x, t_orig, inv_mask, conds, qm, cm, True,
                           method=model.denoise)

    return S.ddim_reverse_sample_loop(
        bound_apply, sched_test, inv_lat, mean_type=mean_type,
        var_type=var_type, cfg_scale=cfg_scale, return_all_timesteps=True,
    )


def splice_inverted(dcfg: DenoiserConfig, sched, start_noise, inv_stack,
                    splice, inversion_start_time: int, with_guidance: bool):
    """Splice inverted exemplar windows into the start noise (upper + hands
    rows only) and build the per-step guidance targets
    (diffusion_architecture.py:386-420).

    splice: (Q, 4) int32 rows (batch_idx, q_start, r_start, length) in latent
    token units; length <= tokens_per_part.  The window placement is pure
    data layout over CONCRETE host values, so the (b, t) -> source-token
    index map is built in numpy and applied as ONE jitted gather — the
    previous per-window dynamic_slice/update chain dispatched ~8 device ops
    per query (a full host->device round trip each on remote-TPU rigs,
    dominating guided-mode latency)."""
    gather, mask = splice_maps(dcfg, splice, *start_noise.shape[:2])
    return _splice_apply(start_noise, inv_stack, gather, mask,
                         int(inversion_start_time), bool(with_guidance))


def _inv_conds_core(re_dict) -> Dict[str, Any]:
    """The retrieved exemplars' own raw conditions (for inversion).

    Device arrays pass through UNTOUCHED: the retrieval database's payload
    bank (retrieval/database.py::_payload_row) stages exemplar features on
    the device at retrieval time, and pulling them back to host here cost a
    measured ~35 ms re-transfer per guided clip on remote-tunnel rigs.
    Host inputs stay numpy so StagedGenerator._cast_conds can apply the
    bf16 wire cast before the jit boundary's device put."""
    import numpy as np

    def keep(v):
        return v if isinstance(v, jax.Array) else np.asarray(v)

    return {
        "word": keep(re_dict["inv_conds"]["word"]),
        "audio": keep(re_dict["inv_conds"]["audio"]),
        "speaker_ids": keep(re_dict["inv_conds"]["speaker_ids"]),
    }


def splice_maps(dcfg: DenoiserConfig, splice, B: int, T: int):
    """Host-side (B·T,) gather index + (B, T) write mask for the latent
    window splice (see splice_inverted)."""
    import numpy as np

    L = dcfg.tokens_per_part
    splice_np = np.asarray(splice)
    # (B, T) map: flat (q*T + t') source index into the exemplar latents,
    # -1 = keep the original noise row.  Later queries overwrite earlier
    # ones, matching the reference's sequential splice.
    src_idx = np.full((B, T), -1, np.int64)
    for q in range(splice_np.shape[0]):
        b, q_start, r_start, ln = (int(v) for v in splice_np[q])
        if ln <= 0:
            continue
        if (b < 0 or b >= B or q_start < 0 or r_start < 0
                or q_start + ln > L or r_start + ln > L):
            # numpy would silently wrap negative offsets into other rows;
            # reject contract-violating retrieval output instead
            raise ValueError(
                f"splice row {q} out of range: (b={b}, q_start={q_start}, "
                f"r_start={r_start}, len={ln}) for L={L}, B={B}")
        for off in (0, L + 1):  # upper row, hands row
            cols = np.arange(ln)
            src_idx[b, off + q_start + cols] = q * T + off + r_start + cols
    keep = src_idx < 0
    gather = jnp.asarray(np.where(keep, 0, src_idx).reshape(-1), jnp.int32)
    mask = jnp.asarray(~keep, jnp.float32)
    return gather, mask


@partial(jax.jit, static_argnames=("inversion_start_time", "with_guidance"))
def _splice_apply(start_noise, inv_stack, gather, mask,
                  inversion_start_time, with_guidance):
    S_steps = inv_stack.shape[0]
    B, T, D = start_noise.shape
    m = mask[..., None]                                   # (B, T, 1)
    start_latents = inv_stack[inversion_start_time].reshape(-1, D)
    spliced = start_latents[gather].reshape(B, T, D)
    start_noise = start_noise * (1.0 - m) + spliced * m
    if not with_guidance:
        return start_noise, None
    flat = inv_stack.reshape(S_steps, -1, D)
    inv_all = flat[:, gather].reshape(S_steps, B, T, D) * m[None]
    return start_noise, inv_all
