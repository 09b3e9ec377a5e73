# OccFormer nuScenes R101-DCN 6x896x1600 — high-res variant (bf16 training).
# Mirrors the reference r101 config diff: deeper backbone with DCNv2 in stages
# 3-4, larger input, mixed precision (fp16 on GPU -> bf16 on TPU, no loss
# scaling needed).
_base_ = ["./occformer_nusc_r50_256x704.py"]

data_config = {
    "cams": ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
             "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"],
    "Ncams": 6,
    "input_size": (896, 1600),
    "src_size": (900, 1600),
    "resize": (-0.06, 0.11),
    "rot": (-5.4, 5.4),
    "flip": True,
    "crop_h": (0.0, 0.0),
    "resize_test": 0.00,
}

model = dict(
    img_backbone=dict(
        _delete_=True,
        type="ResNet",
        depth=101,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=0,
        norm_eval=False,
        style="pytorch",
        dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, False, True, True),
    ),
    img_view_transformer=dict(data_config=data_config),
)

fp16 = dict(loss_scale="dynamic")  # GPU artifact; bf16 on TPU needs no scaling
compute_dtype = "bfloat16"
