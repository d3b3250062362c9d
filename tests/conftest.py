"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware.

Note: this environment ships a sitecustomize that pins JAX_PLATFORMS=axon
(the TPU tunnel), so plain env vars are not enough — we must override via
jax.config before the backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"


# ---- slow-test gating -------------------------------------------------------
# Tests marked @pytest.mark.slow (e.g. the flagship-dims full-model parity
# forward, ~10-20 min on this 1-core CPU box) are skipped unless RUN_SLOW=1
# is set or --runslow is passed, so the default suite stays fast.
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (RUN_SLOW=1)")


# Centralized slow-tier roster (round-5 VERDICT item 8: default suite
# < 5 min single-core).  Every entry was measured >= ~8 s on this box
# (work_dirs/pytest_durations.log, full-suite run 2026-08-20); the slow
# tier is run once per round via tools/run_tests.sh slow and recorded in
# docs/STATUS.md.  Key = "<file basename>::<test name>" (parametrized
# tests match on the bare name).  Explicit @pytest.mark.slow decorators
# in test files still work independently of this roster.
SLOW_ROSTER = {
    "test_multihost.py::test_two_process_train_step_bitwise_synchronized",
    "test_multihost.py::test_train_cli_two_process",
    "test_bucket_miou.py::test_bucketed_eval_miou_delta",
    "test_tp.py::test_tp_train_step_runs_and_matches",
    "test_tp.py::test_tp_forward_parity",
    "test_tp.py::test_tp_rules_hit_ffns",
    "test_lazy_masks.py::test_lazy_masks_matches_dense",
    "test_lazy_masks.py::test_lazy_masks_train_step_runs",
    "test_lazy_masks.py::test_lazy_masks_masked_attention_mode",
    "test_multichip.py::test_dryrun_multichip_8",
    "test_multichip.py::test_point_loss_train_step_data_parallel",
    "test_multichip.py::test_data_parallel_eval_matches_single_device",
    "test_multichip.py::test_spatial_sharding_matches_replicated",
    "test_train_and_eval.py::test_grad_accumulation_matches_big_batch_direction",
    "test_train_and_eval.py::test_train_step_runs_and_decreases_nothing_nan",
    "test_train_and_eval.py::test_fpn_train_step_with_loss_decode_zoo",
    "test_train_and_eval.py::test_cascade_segmentor_train_and_predict",
    "test_train_and_eval.py::test_train_checkpoint_restores_into_eval_variables",
    "test_train_and_eval.py::test_slide_matches_whole_when_single_window",
    "test_train_and_eval.py::test_slide_overlapping_windows",
    "test_learning.py::test_auction_vs_hungarian_training_equivalence",
    "test_learning.py::test_overfits_two_class_task",
    "test_learning.py::test_point_sampled_losses_learn",
    "test_learning.py::test_norm_eval_freezes_backbone_stats",
    "test_collapse_t.py::test_collapse_t_training_exact",
    "test_collapse_t.py::test_collapse_t_inference_exact",
    "test_dab_detr.py::test_dab_decoder_knob_trains_end_to_end",
    "test_dab_detr.py::test_dab_decoder_point_queries_and_grads",
    "test_dab_detr.py::test_dab_decoder_forward_and_refinement",
    "test_api_tta_viz.py::test_init_and_inference_model",
    "test_api_tta_viz.py::test_inferencer_batch_and_visualization",
    "test_panoptic.py::test_panoptic_train_batches_and_step",
    "test_panoptic.py::test_whole_panoptic_e2e",
    "test_spike_op.py::test_packed_residuals_full_model_identical",
    "test_losses.py::test_auction_near_optimal_tight_gaps",
    "test_losses.py::test_auction_matches_scipy_cost",
    "test_losses.py::test_criterion_weights_scale_losses",
    "test_losses.py::test_unroll_matches_scan",
    "test_losses.py::test_auction_vs_hungarian_assignment_agreement",
    "test_losses.py::test_compact_gt_exactness_both_branches",
    "test_losses.py::test_loss_at_pred_vs_gt_equivalence",
    "test_losses.py::test_slot_mode_matches_dense_mode",
    "test_mask2former.py::test_masked_attention_grads_flow",
    "test_mask2former.py::test_masked_attention_shapes_and_param_compat",
    "test_point_sample.py::test_criterion_point_mode_runs_and_grads_flow",
    "test_point_sample.py::test_criterion_point_mode_dense_masks_and_compact",
    "test_point_sample.py::test_point_focal_converges_to_exact_with_uniform_points",
    "test_head.py::test_segmentor_end_to_end_predict",
    "test_head.py::test_head_train_shapes",
    "test_head.py::test_fpn_segmentor_end_to_end",
    "test_head.py::test_head_eval_returns_last_only",
    "test_head.py::test_transformer_encoder_pixel_decoder",
    "test_module_parity.py::test_cycle_mlp_block_shapes",
    "test_backbone.py::test_pyramid_shapes",
    "test_backbone.py::test_train_mode_updates_batch_stats",
    "test_backbone.py::test_firing_rates_observable",
    "test_train_and_eval.py::test_bucketed_eval_shares_one_compilation",
    "test_full_model_parity.py::test_full_model_logit_parity",
    "test_convert_sdtv3.py::test_backbone_logit_parity",
    "test_convert_sdtv3.py::test_backbone_roundtrip_tree_exact",
    "test_convert_sdtv3.py::test_full_model_conversion_and_parity",
    "test_config_and_tools.py::test_firing_rates_api",
    "test_msda.py::test_spike_deformable_encoder_end_to_end",
    "test_module_parity.py::test_msresnet_pyramid_and_classifier",
    "test_module_parity.py::test_msresnet_basic_block_parity",
    "test_module_parity.py::test_spike_mha_factored_equals_dense",
    "test_serving.py::test_serving_batches_and_matches_unbatched",
    "test_serving.py::test_serving_concurrent_submitters",
    "test_spikeformer_lib.py::test_decoder_layer_forward_and_grad",
    "test_dcnv3.py::test_dcnv3_pallas_backward_matches_xla_grad",
    "test_ann2snn.py::test_converter_snn_approximates_ann",
}


def _roster_key(item):
    name = item.name.split("[")[0]
    return f"{os.path.basename(str(item.fspath))}::{name}"


def pytest_collection_modifyitems(config, items):
    for item in items:
        if _roster_key(item) in SLOW_ROSTER:
            item.add_marker(pytest.mark.slow)
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: set RUN_SLOW=1 or --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
