"""Test bootstrap: force an 8-device virtual CPU mesh.

The container's sitecustomize imports jax and registers the axon TPU plugin
before any test code runs, so env vars are too late — use jax.config updates,
which take effect because backends initialize lazily.  Multi-host/multi-chip
logic is validated on CPU (SURVEY.md §4 implication 5); the real-chip path is
exercised by bench.py and the driver's entry checks.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the tiny-model programs recompile across
# many tests/subprocesses; caching them cuts the suite wall time.  The dir
# is host-fingerprinted — XLA:CPU executables are ISA-specific but the
# cache key is not (see utils/compile_cache.py) — so a host move starts
# a clean cache instead of SIGILL-ing in CLI subprocesses.
import sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from occformer_tpu.utils.compile_cache import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir(os.path.join(os.path.dirname(__file__), "..")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---------------------------------------------------------------------------
# `-m quick` smoke tier (VERDICT r3 #7): one representative test per
# component family, ~5 min wall, so every round can verify the whole
# surface cheaply.  Tests can also self-mark with @pytest.mark.quick.
# Matching is by nodeid prefix so parametrized cases stay included.
# ---------------------------------------------------------------------------
_QUICK_PREFIXES = (
    "test_sampling.py::test_grid_sample_3d_matches_torch",
    "test_geometry_scatter.py::test_get_geometry_matches_numpy_oracle",
    "test_swin_parity.py::test_swin_block_parity_no_shift",
    "test_dualpath_convert.py::test_dualpath_block_conversion_parity",
    "test_pixel_decoder_layer_convert.py::"
    "test_pixel_decoder_layer_conversion_parity",
    "test_mask2former_head_convert.py::"
    "test_mask2former_head_conversion_parity",
    "test_losses.py::test_hungarian_matches_scipy",
    "test_loss_edge_cases.py::test_zero_match_all_invalid_gt",
    "test_data.py::test_majority_vote_voxelize_matches_oracle",
    "test_dataset_fixture.py::test_nuscenes_train_pipeline_from_disk",
    "test_group_sampler.py::test_batches_are_group_pure",
    "test_native.py::test_native_majority_vote_matches_numpy",
    "test_pointcloud_ops.py::test_dynamic_voxelize",
    "test_spconv.py::test_subm_conv_preserves_active_set",
    "test_dcn_convert.py::test_dcn_conversion_numeric_parity",
    "test_convert.py::test_resnet18_conversion_numeric_parity",
    "test_secondfpn_convert.py::test_secondfpn_conversion_numeric_parity",
    "test_depthnet_convert.py::test_depthnet_conversion_numeric_parity",
    "test_train_step.py::test_train_step_updates_params",
    "test_eval_loop.py::test_evaluate_accumulates_metrics",
    "test_configs_metrics.py::test_config_loads_and_translates",
    "test_export_torch.py::test_export_roundtrip_bit_exact",
    "test_multihost_train.py::test_host_shards_are_group_pure_and_disjoint",
    "test_pos_embed.py::test_sine_pos_encoding_matches_reference",
    "test_flops.py::test_matmul",
    "test_fuse.py::test_resnet_fused_outputs_match",
    "test_pretrained_init.py::test_r50_torchvision_init_coverage",
    "test_panoptic.py::test_panoptic_eval_perfect_prediction",
    "test_temporal.py::test_shift_feature_identity",
    "test_bevstereo.py::test_k_list_matches_reference_formula",
    "test_freeze.py::test_freeze_mask_paths",
)


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        nid = item.nodeid.split("/")[-1]
        if any(nid.startswith(p) for p in _QUICK_PREFIXES):
            item.add_marker(_pytest.mark.quick)
