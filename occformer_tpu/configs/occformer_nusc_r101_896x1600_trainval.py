# R101-DCN high-res trained on train+val scenes, for the nuScenes test-server
# submission.  Mirrors reference occformer_nusc_r101_896x1600_trainval.py:
# trainval infos for training, test infos (test-submit placeholders) for
# inference.
_base_ = ["./occformer_nusc_r101_896x1600.py"]

data = dict(
    train=dict(ann_file="data/nuscenes_infos_temporal_trainval.pkl"),
    test=dict(ann_file="data/nuscenes_infos_temporal_test.pkl", test_mode=True),
)
