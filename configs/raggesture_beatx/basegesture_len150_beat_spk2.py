# Single-speaker (speaker 2) flagship variant — reference
# configs/raggesture_beatx/basegesture_len150_beat_spk2.py (diff: spk2
# dataset base, ckpt interval 5, num_speakers=1, separate caches).
_base_ = [
    "basegesture_len150_beat.py",
    "../_base_/datasets/beatx_len150_15fps_spk2.py",
]

checkpoint_config = dict(interval=5)

custom_hooks = [
    dict(type="DatabaseSaveHook", save_dir="experiments/retrieval_dicts_spk2"),
]

model = dict(
    model=dict(
        speaker_embedding=dict(num_speakers=1),
        retrieval_cfg=dict(
            cache_path="experiments/retrieval_cache_stratified_spk2/",
        ),
    ),
)
