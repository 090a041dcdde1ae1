"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
without TPU hardware (the driver dry-runs the real multi-chip path the same
way)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# -- smoke tier (VERDICT r3 weak #8): a <5-min gate covering every subsystem
# with at least its imports + one semantic test.  Curated here (not as
# per-file decorators) so the tier stays reviewable in one place.
# Run: python -m pytest tests/ -m smoke -q
_SMOKE = {
    "test_schedule.py::test_linear_betas_match_compvis_formula",
    "test_schedule.py::test_schedule_loop_order_starts_at_981",
    "test_masks.py::test_matches_reference_semantics",
    "test_losses.py::test_global_resize_matches_torch_upsample_avgpool",
    "test_samplers.py::test_dpm1_equals_ddim",
    "test_samplers.py::test_plms_matches_reference_step_arithmetic",
    "test_samplers.py::test_dpm2m_lower_order_final_matches_reference_rule",
    "test_attention.py::test_spacetime_blend_matches_reference_loop",
    "test_attention.py::test_zero_coef_is_vanilla",
    "test_unet.py::test_shapes_and_finite",
    "test_vae.py::test_roundtrip_shapes",
    "test_spacetime.py::test_init_coef_matches_reference",
    "test_pallas_spacetime.py::test_kernel_matches_xla_oracle",
    "test_pallas_mha.py::test_mha_forward_matches_xla",
    "test_pallas_geglu.py::test_erf_polynomial_matches_lax_erf",
    "test_pallas_geglu.py::test_forward_matches_xla",
    "test_parallel.py::test_partition_specs_rules",
    "test_layout_training.py::test_bert_schedule_matches_reference",
    "test_layout_training.py::test_hinge_loss_matches_reference_formula",
    "test_ldm_training.py::test_lvlb_weights_match_reference_formula",
    "test_ldm_training.py::test_scaled_lr_rule",
    "test_legacy_training.py::test_log_pdf_loss_matches_oracle",
    "test_legacy_training.py::test_iou_calculator_matches_reference_semantics",
    "test_legacy_layout.py::test_rel2layout_shapes",
    "test_native_bpe.py::test_native_matches_python",
    "test_tokenizer_golden.py::test_clip_structural_ids_single_byte_words",
    "test_frontend_eval.py::test_readme_golden_sentence",
    "test_frontend_eval.py::test_relation_pass_matches_reference",
    "test_frontend_eval.py::test_layout_relation_consistency_metric",
    "test_serving.py::test_engine_shapes_and_seed_determinism",
    "test_retrieval.py::test_exact_search_matches_numpy",
    "test_batch_runner.py::test_batched_vanilla",
    "test_vg_inference.py::test_scene_graph_to_words_both_formats",
    "test_fairseq_convert.py::test_fairseq_dictionary_bridge",
    "test_vae_training.py::test_kl_divergence_formula",
    "test_loader.py::test_image_paths_dataset_lsun_semantics",
    "test_aux.py::test_watermark_roundtrip",
    "test_aux.py::test_scripts_dir_shadows_no_stdlib_module",
    "test_testbed.py::test_oracle_near_perfect_on_clean_scenes",
    "test_testbed.py::test_training_caption_relation_is_uninformative",
    "test_testbed.py::test_gt_layout_satisfies_protocol_relation_rule",
    "test_testbed.py::test_method_eval_loop_smoke",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        key = f"{item.fspath.basename}::{item.name.split('[')[0]}"
        if key in _SMOKE:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _np_seed():
    np.random.seed(0)
