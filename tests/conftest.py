"""Test configuration: run everything on a virtual 8-device CPU mesh.

The sandbox's sitecustomize registers the TPU ('axon') PJRT plugin and forces
``jax_platforms='axon,cpu'`` in every interpreter, so the env-var route
(JAX_PLATFORMS=cpu) is overridden.  We re-force CPU through jax.config before
any backend is initialized, and request 8 virtual CPU devices so mesh/pjit
sharding tests exercise real multi-device paths (SURVEY.md §4 item 4).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

# The suite's baselines assume seed-determined random init: a default
# checkpoint leaking in from the environment (or from the committed
# artifacts/mars_depth_v2.pth auto-default) would silently turn every
# "random init" fixture into trained weights.  Setting the env var to ""
# disables BOTH (inference._init_variables treats a present-but-empty var
# as "no default checkpoint"); tests that exercise the hook monkeypatch it.
os.environ["MONODEPTH_TPU_CHECKPOINT"] = ""


# Smoke tier (`pytest -m smoke` / `make test-smoke`): one high-value test per
# subsystem, <=5 min on a fresh checkout, so every session gets a cheap
# whole-framework signal without the ~20-min full suite.  Curated here (not
# as decorators) so the tier is visible in one place; a missing node id
# fails the smoke run loudly instead of silently shrinking coverage.
SMOKE_TESTS = {
    # numeric core + literal reference parity (torch oracle)
    "tests/test_layers.py::test_ssim_matches_torch",
    "tests/test_reference_parity.py::test_decoder_literal_parity",
    "tests/test_model_parity.py::test_absrel_delta1_parity_budget",
    "tests/test_encoder_quirks.py::test_grid_other_sizes_keep_cls_and_pad",
    "tests/test_dtype_and_bn.py::test_eval_mode_batchnorm_parity",
    "tests/test_resize.py::test_bilinear_matches_torch[True-in_size0-out_size0]",
    # kernels (Pallas interpret on CPU)
    "tests/test_pallas_attention.py::test_fused_mha_matches_xla[197]",
    "tests/test_windowed_attention.py::test_windowed_mha_matches_naive",
    "tests/test_native_patching.py::test_native_patching_model_forward",
    "tests/test_quant.py::test_model_int8_close_to_f32[False]",
    # parallelism: mesh equality, FSDP placement, distributed loader sharding
    "tests/test_parallel.py::test_sharded_forward_matches_single_device",
    "tests/test_fsdp.py::test_fsdp_params_and_optstate_sharded",
    "tests/test_distributed.py::test_loader_shards_are_disjoint_and_complete",
    "tests/test_parallel_inference.py::test_sharded_inference_ragged_batch",
    # training: one full adapter train+checkpoint e2e, plus the photometric
    # and sequence objectives' cheap semantic checks (their adapter-level
    # integration runs in the full suite)
    "tests/test_training.py::test_adapter_trains_and_checkpoints",
    "tests/test_photometric.py::test_photometric_losses_finite_and_differentiable",
    "tests/test_pose.py::test_sequence_loss_prefers_true_depth",
    # data: loaders, curated pairing, checkpointable grain iterator
    "tests/test_data.py::test_get_mars_dataloaders",
    "tests/test_pairing.py::test_manifest_gates_gap_and_corr",
    "tests/test_grain_pipeline.py::test_checkpointable_iter_mid_epoch_resume",
    # CLI e2e + verbatim reference flags
    "tests/test_cli.py::test_run_mars_depth_standard",
    "tests/test_cli_reference_flags.py::test_run_mars_depth_reference_flags",
    # serving + AOT export
    "tests/test_serve.py::test_http_predict_roundtrip",
    "tests/test_export.py::test_export_roundtrip_symbolic_batch",
    # evaluation / terrain / visualization / native / hpo
    "tests/test_evaluation.py::test_real_cda_scores",
    "tests/test_terrain.py::test_grid_mesh_and_stitch",
    "tests/test_terrain_mesh.py::test_alpha_shape_hemisphere_geometry",
    "tests/test_visualization.py::test_multiview",
    "tests/test_native.py::test_resize_matches_torch_convention",
    "tests/test_refinement.py::test_multi_scale_fusion_refine_pipeline",
    "tests/test_inference_engine.py::test_predict_batch_uniform_and_mixed_sources",
    "tests/test_hpo.py::test_grid_search_enumerates",
    "tests/test_bench_smoke.py::test_bench_emits_json_line",
    "tests/test_profiling.py::test_benchmark_fn",
    "tests/test_vit_variants.py::test_encoder_variant_shapes[small]",
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        if item.nodeid in SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
            matched.add(item.nodeid)
    # When the whole suite was collected for a smoke run, every curated id
    # must still exist — otherwise a rename silently drops smoke coverage.
    if "smoke" in (config.option.markexpr or "") and len(items) > 300:
        missing = SMOKE_TESTS - matched
        assert not missing, f"SMOKE_TESTS name vanished tests: {sorted(missing)}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
