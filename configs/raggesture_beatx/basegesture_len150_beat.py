# RAG-Gesture flagship: 150-frame BEAT2 gesture latent diffusion with
# retrieval-augmented sampling.  Hyperparameter-equivalent to the shipped
# upstream configuration (see SURVEY.md §2.1) on a TPU runtime (orbax
# checkpoints, optax cosine Adam, jax.sharding data-parallel mesh).
_base_ = ["../_base_/datasets/beatx_len150_15fps.py"]

# -- runtime ------------------------------------------------------------------
checkpoint_config = dict(interval=2, max_to_keep=5, async_save=True)
log_config = dict(interval=10, tensorboard=True)
log_level = "INFO"
load_from = None
resume_from = None
workflow = [("train", 1)]

optimizer = dict(type="Adam", lr=1e-4)           # bf16=True for mixed precision
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="CosineAnnealing", min_lr_ratio=1e-6, by_epoch=False)
# multi_step: train steps per jitted dispatch (lax.scan over a stacked
# batch) — amortizes per-dispatch marshaling of the ~3000-leaf state tree
runner = dict(type="EpochBasedRunner", max_epochs=500, multi_step=8)

custom_hooks = [
    # retrieval memoization persistence (the codec is frozen by optimizer
    # masking, so no freeze hook is needed)
    dict(type="DatabaseSaveHook", save_dir="experiments/retrieval_dicts"),
]

# -- model dimensions ----------------------------------------------------------
D = 512            # latent width (tokens and VAE latents)
FRAMES = 150       # window length @ 15 fps
CHUNK = 15         # frames per latent token (10 tokens/part, 43 with seps)

model = dict(
    type="MotionDiffusion",
    model=dict(
        type="ReGestureTransformer",
        latent_dim=D,
        max_seq_len=FRAMES,
        frame_chunk_size=CHUNK,
        time_embed_dim=4 * D,
        num_layers=8,
        body_part_cat_axis="time",
        sa_block_cfg=dict(type="EfficientSelfAttention", num_heads=16,
                          dropout=0),
        ca_block_cfg=dict(type="EfficientCrossAttention", num_heads=16,
                          dropout=0),
        ffn_cfg=dict(ffn_dim=1024, dropout=0),
        # frozen body-part codec (convert the released torch checkpoints
        # with tools/convert_weights.py)
        vae_cfg=dict(
            latent_dim=D,
            frame_chunk_size=CHUNK,
            num_layers=8,
            num_heads=4,
            lowertrans_num_heads=8,
            upper_ckpt="experiments/vae/upper.msgpack",
            hands_ckpt="experiments/vae/hands.msgpack",
            face_ckpt="experiments/vae/face.msgpack",
            lowertrans_ckpt="experiments/vae/lowertrans.msgpack",
        ),
        # conditions arrive as precomputed 768-d BERT / wav2vec2 features;
        # num_layers=0 means identity encoders + a 768->512 projection
        text_encoder=dict(latent_dim=768, num_layers=0, ff_size=2048,
                          use_text_proj=False, pretrained_model=None),
        audio_encoder=dict(latent_dim=768, num_layers=0, dropout=0.1,
                           pretrained_model=None),
        speaker_embedding=dict(num_speakers=25),
        retrieval_train=False,
        retrieval_cfg=dict(
            num_retrieval=1,
            topk=2,
            latent_dim=D,
            text_latent_dim=768,
            max_seq_len=FRAMES,
            motion_fps=15,
            motion_framechunksize=CHUNK,
            cache_path="experiments/retrieval_cache_stratified/",
            new_cache=False,
            stratified_db_creation=True,
            # (max_seq_len // data_stride) // 2 = 150 // 5 // 2
            stratification_interval=15,
        ),
        # timestep-dependent condition-mixing coefficients
        scale_func_cfg=dict(coarse_scale=6.5, both_coef=0.52351,
                            text_coef=-0.28419, retr_coef=2.39872),
    ),
    loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
    body_part_lossweights=dict(upper=1.0, hands=1.0, face=1.0,
                               lowertransl=1.0),
    diffusion_train=dict(beta_scheduler="scaled_linear", diffusion_steps=1000,
                         model_mean_type="start_x",
                         model_var_type="fixed_large"),
    diffusion_test=dict(beta_scheduler="scaled_linear", diffusion_steps=1000,
                        model_mean_type="start_x",
                        model_var_type="fixed_large",
                        # 50 DDIM steps over 5 equal 200-step ranges
                        respace="15,15,8,6,6",
                        num_inference_timesteps=50,
                        classifier_free_guidance_scale=0),
    inference_type="ddim",
)
