# BEAT2 (BEAT-X) dataset: 150-frame windows @ 15 fps, 16 kHz audio.
# Capability match for /root/reference/configs/_base_/datasets/
# beatx_len150_15fps.py:21-68 — same hyperparameters, TPU-native loader
# (array-shard cache instead of LMDB, Flax HF featurizers).

motion_length = 150
motion_fps = 15
audio_sr = 16000

base_data_cfg = dict(
    type="BEATXDataset",
    pose_rep="smplxflame_30",
    facial_rep="smplxflame_30",
    data_path="datasets/beat_english_v2.0.0/",
    cache_path="cache/beatx_cache/",
    debug=False,
    tiny=False,
    sample_rate=audio_sr,
    fps=motion_fps,
    stride=5,
    pose_length=motion_length,
    deps_path="datasets/assets_deps/",
    # SMPL-X body model for foot-contact FK during cache build (hard
    # requirement unless allow_fake_contacts is set)
    smplx_asset="datasets/assets_deps/smplx_models/smplx/"
                "SMPLX_NEUTRAL_2020.npz",
    allow_fake_contacts=False,
    training_speakers=list(range(1, 31)),
    pose_fps=motion_fps,
    audio_sr=audio_sr,
    new_cache=False,
    clean_first_seconds=0,
    clean_final_seconds=0,
    audio_rep="wav2vec",           # melspec | wav2vec
    word_rep="bert_framealigned",  # bert_framealigned | bert
    id_rep="idx",
    sem_rep="info",
    prom_rep="prom",
    emo_rep="emo",
)

train_cfg = dict(base_data_cfg, split="train")
val_cfg = dict(base_data_cfg, split="val")
test_cfg = dict(base_data_cfg, split="test")

data = dict(
    samples_per_device=128,  # reference samples_per_gpu=128
    workers_per_device=8,
    train=train_cfg,
    val=val_cfg,
    test=test_cfg,
)
