"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the JAX analogue of the reference's
``mpirun -n 2 --oversubscribe`` CI job; ref: .github/workflows/CI.yml:49-55).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported (axon sitecustomize); env alone is too late then
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the fast CI gate (< ~4 min CPU);
# the full suite (~12 min) is the nightly tier. Membership below was measured
# with --durations=0 (tests >= 3 s CPU).
_SLOW = {
    "test_checkpoint.py::test_checkpoint_roundtrip",
    "test_config_inputs.py::test_config_file_trains",
    "test_data_parallel.py::test_dp_step_grad_matches_mean_of_local_grads",
    "test_datasets.py::test_distdataset_multiprocess_remote_gets",
    "test_dense_adjacency.py::test_gat_dense_attention_matches_edgewise",
    "test_dense_adjacency.py::test_training_with_dense_adjacency",
    "test_examples.py::test_dftb_example_runs",
    "test_examples.py::test_hpo_example_runs",
    "test_examples.py::test_lj_example_runs",
    "test_examples.py::test_multibranch_example_runs",
    "test_examples.py::test_multidataset_zero_example_runs",
    "test_examples.py::test_omat24_example_runs",
    "test_examples.py::test_qm9_example_runs",
    "test_forces.py::test_energy_force_single_forward_refreshes_stats",
    "test_forces.py::test_energy_force_training_decreases_loss",
    "test_forces.py::test_force_equivariance",
    "test_forces.py::test_mace_force_training_grads_finite",
    "test_forces.py::test_safe_edge_geometry_zero_second_order",
    "test_gfm_ingest.py::test_gfm_driver_synthetic_smoke",
    "test_graph_parallel.py::test_gps_attention_ring_axis_matches_dense",
    "test_graph_parallel.py::test_graph_parallel_halo_step_matches_single_device",
    "test_graph_parallel.py::test_graph_parallel_step_matches_single_device",
    "test_irreps.py::test_sh_pole_gradients_finite",
    "test_mace_oracle.py::test_interaction_block_matches_dense_numpy",
    "test_models_forward.py::test_forward_graph_head",
    "test_models_forward.py::test_performer_approximates_exact_attention",
    "test_multibranch.py::test_branch_parallel_step_matches_reference_semantics",
    "test_multibranch.py::test_multibranch_training_learns_both",
    "test_pallas_spmm.py::test_fused_spmm_grad_weights",
    "test_pallas_spmm.py::test_fused_spmm_grad_x",
    "test_performer_parity.py::test_performer_converges_to_exact_long_sequence",
    "test_performer_parity.py::test_performer_error_shrinks_with_features",
    "test_pipeline_parallel.py::test_pipeline_backward_matches",
    "test_pipeline_parallel.py::test_pipeline_matches_sequential",
    "test_raw_loaders.py::test_eam_example_smoke",
    "test_resume.py::test_continue_loads_exact_state",
    "test_resume.py::test_resume_reproduces_uninterrupted",
    "test_run_adios.py::test_run_training_adios_ddstore_mode",
    "test_run_adios.py::test_run_training_adios_format",
    "test_run_pickle.py::test_run_training_pickle_format",
    "test_scan_epoch.py::test_scan_epoch_matches_step_loop",
    "test_scan_epoch.py::test_trainer_scan_chunk_and_bf16_options",
    "test_sweeps.py::test_conv_checkpointing_matches",
    "test_sweeps.py::test_conv_checkpointing_remat_policies",
    "test_sweeps.py::test_conv_node_head",
    "test_sweeps.py::test_loss_functions",
    "test_sweeps.py::test_mace_radial_types",
    "test_sweeps.py::test_mlp_per_node_head",
    "test_sweeps.py::test_optimizers",
    "test_tensor_parallel.py::test_tp_pure_model_mesh",
    "test_tensor_parallel.py::test_tp_step_matches_replicated",
    "test_torch_parity.py::test_dimenet_interaction_output_match_torch",
    "test_torch_parity.py::test_gatv2_conv_matches_torch",
    "test_training_e2e.py::test_train_multihead",
    "test_training_e2e.py::test_train_singlehead",
    "test_training_gps_mace.py::test_train_gps_gin",
    "test_training_gps_mace.py::test_train_mace",
    "test_zero.py::test_zero_step_matches_and_shards",
    # round-3 additions
    "test_pallas_egnn.py::test_run_training_egnn_uses_edge_slot",
    "test_pallas_egnn.py::test_egcl_fused_matches_unfused_end_to_end",
    "test_pallas_egnn.py::test_gradients_match_reference",
    "test_pipeline_parallel.py::test_pipelined_hydra_model_matches_sequential",
    "test_tensor_parallel.py::test_composed_data_branch_model_matches_dp",
    "test_tensor_parallel.py::test_tp_dryrun_shards_real_dp_batches",
    "test_mace_oracle.py::test_symmetric_product_spans_u_matrix_space",
    "test_mace_oracle.py::test_symmetric_product_mixed_orders_span",
    # round-4 additions
    "test_pallas_egnn.py::test_second_order_grad_of_grad_matches_reference",
    "test_pallas_schnet.py::test_second_order_grad_of_grad_matches_reference",
    "test_edge_slot_sorted.py::test_fused_second_order_force_grads_match_unfused",
    "test_edge_slot_sorted.py::test_force_grads_slotted_matches_plain",
    "test_pipeline_parallel.py::test_pipelined_pna_with_batchnorm_matches_sequential",
    "test_forces.py::test_two_pass_loss_structure_matches_aux",
    "test_forces.py::test_mixed_precision_force_training_finite",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long e2e/training tests (excluded by -m 'not slow')"
    )


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        base = item.nodeid.split("/")[-1].split("[")[0]
        if base in _SLOW:
            item.add_marker(_pytest.mark.slow)
