# Single-speaker (speaker 2) BEAT2 variant — reference
# configs/_base_/datasets/beatx_len150_15fps_spk2.py (speaker filter + its
# own cache dirs).
_base_ = ["beatx_len150_15fps.py"]

base_data_cfg = dict(
    training_speakers=[2],
    cache_path="cache/beatx_cache_spk2/",
)

train_cfg = dict(base_data_cfg, split="train")
val_cfg = dict(base_data_cfg, split="val")
test_cfg = dict(base_data_cfg, split="test")

data = dict(train=train_cfg, val=val_cfg, test=test_cfg)
