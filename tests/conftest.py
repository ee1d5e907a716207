import os

# Fake an 8-device platform on CPU so mesh/sharding logic is exercised without
# a TPU pod — the same trick the reference notebooks use
# (examples/*.ipynb cell 0: xla_force_host_platform_device_count=10).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The env var JAX_PLATFORMS is overridden by the environment's TPU plugin;
# the config update below is authoritative.  Set MTGP_TPU_TESTS=1 to keep the
# real TPU backend so tests/test_pallas_tpu.py runs on hardware:
#   MTGP_TPU_TESTS=1 python -m pytest tests/test_pallas_tpu.py -q
import jax  # noqa: E402

if os.environ.get("MTGP_TPU_TESTS", "") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache (VERDICT r3 #7): the suite is compile-bound on
# this 1-core box; warm reruns skip the XLA CPU compiles entirely. Interpret-
# mode Pallas runs execute through jitted wrappers too, so they benefit as
# well. Keyed by jaxpr + flags, so a code change invalidates only what it
# touches. Disable with MTGP_TEST_NO_CACHE=1 to measure cold-compile cost.
if os.environ.get("MTGP_TEST_NO_CACHE", "") != "1":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------- test tiers
#
# The compile-heavy tests (interpret-mode kernel executions, whole-fit scans,
# golden-run configs) dominate the suite: the 2026-08-19 full run on this
# 1-core box took 150 min, with the tests below accounting for ~85% of it.
# They carry the `slow` marker so a fast tier exists for iteration:
#
#   python -m pytest tests/ -q -m "not slow"   # fast tier, minutes
#   python -m pytest tests/ -q                 # full suite — the merge gate
#
# Names are parametrization-stripped; a name listed here marks every
# parametrization of that test.
SLOW_TESTS = {
    "test_golden_acrobot_diverging_horizon",
    "test_fit_checkpoint_and_resume",
    "test_golden_run_dynamic_policy_small",
    "test_adaptive_fitness_kernel_matches_general",
    "test_fused_collective_evolve_interpret_kernels",
    "test_sharded_fit_constopt_small_local_pop",
    "test_fit_deep_trees_interpret_kernels",
    "test_golden_run_static_policy_small",
    "test_fit_shard_2d_dcn_mesh",
    "test_golden_dynamic_parity_small",
    "test_golden_adaptive_parity_small",
    "test_fit_improves_on_vdp",
    "test_sharded_fit_matches_shapes",
    "test_deep_fitness_kernel_matches_general",
    "test_host_loop_improves",
    "test_trajectory_kernel_matches_ladder_rollout",
    "test_static_policy_smoke",
    "test_reproduce_pairs_kernel_invariants",
    "test_evolve_populations_migration_gate",
    "test_fitness_kernel_matches_general",
    "test_fused_fit_loop",
    "test_golden_run_sr_small",
    "test_golden_policy_parity_small",
    "test_golden_parity_small",
    "test_unrolled_policy_kernel_dynamic",
    "test_evolve_island_shapes_and_elite",
    "test_dynamic_policy_time_varying",
    "test_mutate_candidate_forced_mask",
    "test_unrolled_policy_kernel",
    "test_obs_noise_stream_acrobot_wrapped",
    "test_time_varying_series_decay",
    "test_adaptive_fused_through_evaluator_interpret",
    "test_harmonic_oscillator2_multi_control",
    "test_obs_noise_stream_harmonic",
    "test_interpreter_rolled_kernel_windowed_gather",
    "test_policy_evaluator_adaptive_path",
    "test_fitness_kernel_sde_matches_integrate_sde",
    "test_reactor_param_modes",
    "test_static_policy_acrobot",
    "test_time_varying_series_switch",
    "test_compact_rows_matches_per_lane_scatter",
    "test_harmonic_param_modes",
    "test_different_mode_varies_physics",
    "test_duplicate_detection_in_stats",
    # r3 additions (measured slow at introduction)
    "test_fitness_kernel_skip_m1_matches_no_skip",
    "test_adaptive_probe_sort_exact",
    "test_streamed_controls_match_replay_static_obs_noise",
    "test_fused_fitness_matches_general_static",
    "test_fused_fitness_matches_general_dynamic",
    "test_process_noise_stream_sde",
    # r4 additions
    "test_adaptive_fsal_carry_bit_exact",
    "test_adaptive_shallow_ladder_matches_stack",
    # r5 additions: interpret-mode adaptive/global + deep prepared-API runs
    # measure ~9 min contended; prepare_chained (shallow, evaluator-level)
    # stays in the fast tier as the prepared-API smoke
    "test_adaptive_global_budget_matches_interval",
    "test_prepared_fitness_bit_matches_oneshot",
    "test_adaptive_policy_kernel_matches_general",
    "test_adaptive_policy_kernel_dynamic",
    "test_golden_adaptive_policy_parity_small",
    "test_sharded_adaptive_evaluator_matches_unsharded",
    "test_sharded_fit_adaptive_method",
    "test_golden_adaptive_dynamic_parity_small",
    # top of the r4 fast-tier duration profile (31/16/15 s of the 358 s
    # contended run) — full coverage stays in the merge-gate tier
    "test_sample_tree_tile_valid_and_law",
    "test_sharded_eval_equals_unsharded",
    "test_extract_and_splice_match",
}

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
