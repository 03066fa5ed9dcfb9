# RAG-Gesture flagship: 150-frame BEAT2 gesture latent diffusion with
# retrieval-augmented sampling.  Capability match for /root/reference/
# configs/raggesture_beatx/basegesture_len150_beat.py (same hyperparameters,
# TPU runtime: orbax checkpoints, jax.sharding data-parallel mesh, optax).
_base_ = ["../_base_/datasets/beatx_len150_15fps.py"]

# checkpoint saving (reference checkpoint_config interval=2)
checkpoint_config = dict(interval=2, max_to_keep=5, async_save=True)

log_level = "INFO"
load_from = None
resume_from = None
workflow = [("train", 1)]

# optimizer (reference: Adam 1e-4, no grad clip, CosineAnnealing to 1e-6)
optimizer = dict(type="Adam", lr=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="CosineAnnealing", min_lr_ratio=1e-6, by_epoch=False)
runner = dict(type="EpochBasedRunner", max_epochs=500)

log_config = dict(interval=10, tensorboard=True)

custom_hooks = [
    # the codec (4 VAEs) is frozen by optimizer masking — no hook needed;
    # retrieval memoization is persisted like the reference DatabaseSaveHook
    dict(type="DatabaseSaveHook", save_dir="experiments/retrieval_dicts"),
]

input_feats = 189
max_seq_len = 150
frame_chunk_size = 15
motion_fps = 15
latent_dim = 512
time_embed_dim = 2048
inp_text_latent_dim = 768
ff_size = 1024
num_heads = 16
num_layers = 8
dropout = 0

model = dict(
    type="MotionDiffusion",
    model=dict(
        type="ReGestureTransformer",
        input_feats=input_feats,
        max_seq_len=max_seq_len,
        frame_chunk_size=frame_chunk_size,
        latent_dim=latent_dim,
        time_embed_dim=time_embed_dim,
        num_layers=num_layers,
        body_part_cat_axis="time",
        sa_block_cfg=dict(
            type="EfficientSelfAttention",
            latent_dim=latent_dim,
            num_heads=num_heads,
            dropout=dropout,
            time_embed_dim=time_embed_dim,
        ),
        ca_block_cfg=dict(
            type="EfficientCrossAttention",
            latent_dim=latent_dim,
            text_latent_dim=latent_dim,
            num_heads=num_heads,
            dropout=dropout,
            time_embed_dim=time_embed_dim,
        ),
        ffn_cfg=dict(
            latent_dim=latent_dim,
            ffn_dim=ff_size,
            dropout=dropout,
            time_embed_dim=time_embed_dim,
        ),
        vae_cfg=dict(
            # torch checkpoints converted with tools/convert_weights.py
            upper_ckpt="experiments/vae/upper.msgpack",
            lowertrans_ckpt="experiments/vae/lowertrans.msgpack",
            face_ckpt="experiments/vae/face.msgpack",
            hands_ckpt="experiments/vae/hands.msgpack",
            latent_dim=latent_dim,
            frame_chunk_size=frame_chunk_size,
            num_layers=8,
            num_heads=4,
            lowertrans_num_heads=8,
        ),
        text_encoder=dict(
            pretrained_model=None,
            latent_dim=inp_text_latent_dim,
            num_layers=0,
            ff_size=2048,
            dropout=dropout,
            use_text_proj=False,
        ),
        audio_encoder=dict(
            pretrained_model=None,
            latent_dim=inp_text_latent_dim,
            num_layers=0,
            dropout=0.1,
        ),
        speaker_embedding=dict(num_speakers=25),
        retrieval_train=False,
        retrieval_cfg=dict(
            motion_feat_dim=input_feats,
            num_retrieval=1,
            topk=2,
            latent_dim=latent_dim,
            text_latent_dim=inp_text_latent_dim,
            max_seq_len=max_seq_len,
            motion_fps=motion_fps,
            motion_framechunksize=frame_chunk_size,
            cache_path="experiments/retrieval_cache_stratified/",
            new_cache=False,
            stratified_db_creation=True,
            stratification_interval=15,  # (max_seq_len // stride) // 2
        ),
        scale_func_cfg=dict(
            coarse_scale=6.5, both_coef=0.52351, text_coef=-0.28419,
            retr_coef=2.39872,
        ),
    ),
    loss_recon=dict(type="MSELoss", loss_weight=1, reduction="none"),
    body_part_lossweights=dict(upper=1.0, hands=1.0, face=1.0, lowertransl=1.0),
    diffusion_train=dict(
        beta_scheduler="scaled_linear",
        diffusion_steps=1000,
        model_mean_type="start_x",
        model_var_type="fixed_large",
    ),
    diffusion_test=dict(
        beta_scheduler="scaled_linear",
        diffusion_steps=1000,
        model_mean_type="start_x",
        model_var_type="fixed_large",
        respace="15,15,8,6,6",  # 50 DDIM steps over 5 equal 200-step ranges
        num_inference_timesteps=50,
        classifier_free_guidance_scale=0,
    ),
    inference_type="ddim",
)
