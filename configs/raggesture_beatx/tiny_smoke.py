# Tiny smoke-test config: 30-frame windows, 32-d latents, 2-layer stacks.
# The capability analogue of the reference's ``tiny=True`` dataset mode
# (/root/reference/mogen/datasets/beatx_dataset.py:159-167) extended to the
# model: the whole train→infer→evaluate chain runs in seconds on CPU.
_base_ = ["basegesture_len150_beat.py"]

max_seq_len = 30
latent_dim = 32

model = dict(
    model=dict(
        max_seq_len=30,
        latent_dim=32,
        time_embed_dim=64,
        num_layers=2,
        sa_block_cfg=dict(num_heads=4),
        ffn_cfg=dict(ffn_dim=64),
        # text/audio latent dims stay 768: the cached BERT/wav2vec2 (or stub)
        # features are 768-wide regardless of model size
        vae_cfg=dict(latent_dim=32, num_layers=2, num_heads=2,
                     lowertrans_num_heads=2, ff_size=64),
        retrieval_cfg=dict(latent_dim=32, max_seq_len=30,
                           motion_framechunksize=15),
    ),
    diffusion_train=dict(diffusion_steps=100),
    diffusion_test=dict(diffusion_steps=100, respace="2,2,2,2,2",
                        num_inference_timesteps=10),
)

base_data_cfg = dict(pose_length=30, stride=15, tiny=False, debug=True)
train_cfg = dict(base_data_cfg, split="train")
val_cfg = dict(base_data_cfg, split="val")
test_cfg = dict(base_data_cfg, split="test")
data = dict(samples_per_device=4, train=train_cfg, val=val_cfg, test=test_cfg)

runner = dict(max_epochs=2)
checkpoint_config = dict(interval=1)
log_config = dict(interval=1, tensorboard=False)
custom_hooks = [
    dict(type="DatabaseSaveHook", save_dir="work_dirs/tiny_retrieval_dicts"),
]
