"""Root conftest: force tests onto a virtual 8-device CPU platform.

The axon sitecustomize imports jax at interpreter startup (before pytest
collects this file), so JAX_PLATFORMS env vars are too late — but backends
initialize lazily, so switching the config still works. We also force fp32
matmuls so numerical tests are deterministic across platforms. Real-TPU
benchmarking lives in bench.py, not in the test suite.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: re-runs of the suite (and of individual
# heavy tests) skip XLA recompiles — decisive on 1-core judge hosts where
# a single train-graph compile costs minutes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# ---------------------------------------------------------------------------
# Speed split: `pytest -m fast` is the <2-min regression subset; the full
# suite stays the merge gate. Modules doing multi-step training/denoising
# or reference-oracle golden runs are marked slow; everything else fast.
# ---------------------------------------------------------------------------

SLOW_MODULES = {
    "test_train",
    "test_trainer",
    "test_comp_distill",
    "test_comp_face_align",
    "test_comp_three_phase",
    "test_golden_comp_assembly",
    "test_recon_multistep",
    "test_recon_step",
    "test_joint_train",
    "test_golden_comp",
    "test_golden_pipeline",
    "test_golden_unet",
    "test_golden_sdxl",
    "test_golden_mmdit",
    "test_golden_sbg",
    "test_golden_id2ada",
    "test_golden_models",
    "test_golden_reference",
    "test_golden_optimizers",
    "test_golden_vae_schedule",
    "test_golden_losses",
    "test_inference",
    "test_serving",
    "test_motion",
    "test_bisenet_gma",
    "test_face_parsing_train",
    "test_attention",
    "test_attention_bwd",
    "test_attention_vmem",
    "test_deepcache",
    "test_checkpoint",
    "test_unet",
    "test_id2ada",
    "test_clip",
    "test_face_losses",
    "test_retinaface",
    "test_vae",
    "test_quant",
    "test_ckpt_lib",
}


# `pytest -m smoke`: the genuinely-cheap tier — finishes in <60 s on a
# 1-core host (measured 2026-08-21: ~43 s on nproc=1, cold cache). No
# multi-step training graphs, no golden torch oracles, no big compiles.
SMOKE_MODULES = {
    "test_schedules",
    "test_text",
    "test_data",
    "test_prompt_selection",
    "test_evaluation",
    "test_makeup",
    "test_native",
}


def pytest_configure(config):
    config.addinivalue_line("markers", "fast: quick regression subset")
    config.addinivalue_line("markers", "slow: heavy training/golden tests")
    config.addinivalue_line(
        "markers", "smoke: <60s-anywhere tier (runs on 1-core hosts)")


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)
        if mod in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
