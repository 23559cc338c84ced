"""Test configuration: run on a virtual 8-device CPU mesh with float64.

- 8 virtual CPU devices let the multi-chip sharding paths (mesh collectives,
  sharded statevector) run without TPU hardware, per SURVEY.md section 5.
- x64 is enabled because the reference's tightest golden tolerance is 1e-15
  (ChebyshevStep block-encoding test, reference ChebyshevStep.py:133).

Note: this environment's sitecustomize registers a remote TPU PJRT plugin and
forces ``jax_platforms=axon,cpu`` via jax.config at interpreter start, so
setting the JAX_PLATFORMS env var here is not enough -- we must override the
config value itself.  XLA_FLAGS must still be set before the (lazy) CPU
client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Slow-test marking (single source of truth).  The full suite takes ~16-19
# min on this image's one CPU core; the tests below each cost >= 10 s
# (measured with --durations, r4).  Quick dev loop:
#
#     python -m pytest tests/ -q -m "not slow"      (~half the wall-clock)
#
# Full (unfiltered) runs remain the merge gate.
SLOW_TESTS = {
    "test_tp_forward_matches_dense",
    "test_pp_forward_matches_dense",
    "test_qr_sweep_matches_svd_scoring",
    "test_exact_amplitudes_20_qubits_both_exchange_impls",
    "test_fanin_lr_scaling_stabilizes_deep_training",
    "test_optimize_data_parallel_matches_single_device",
    "test_qr_sweep_matches_svd_and_routes_big_f32_layers",
    "test_rdma_h_wall_schedule_matches_collective_and_dense",
    "test_notebook_executes",
    "test_complex_noisy_piecewise_target",
    "test_sharded_engine_matches_dense",
    "test_train_tensor_parallel_matches_single_device",
    "test_train_fused_f32_tracks_xla_trajectory",
    "test_train_tensor_axis_explicit_control",
    "test_exact_amplitudes_15_qubits_random_circuit",
    "test_mnist_n_times_ensemble",
    "test_train_data_parallel_matches_single_device",
    "test_forward_parity_with_lead",
    "test_run_experiment_end_to_end",
    "test_simple_function_fit_mse",
    "test_random_circuits_match",
    "test_delayed_kernel_block_size_invariance",
    "test_anneal_solver_on_small_model",
    "test_delayed_tempering_matches_reference_kernel_quality",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >= 10 s on one CPU core (skip with -m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.name.split("[")[0]
        if base in SLOW_TESTS:
            item.add_marker(_pytest.mark.slow)
