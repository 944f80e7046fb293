"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Tests must run anywhere (CI, dev box) without TPU hardware; multi-chip
sharding tests use the virtual device mesh.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may import jax at interpreter boot (TPU
# tunnel registration), which bakes JAX_PLATFORMS into jax.config before this
# conftest runs — so override the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy end-to-end/parametrization tier — "
        "`pytest -m 'not slow'` is the <5-minute default tier that still "
        "covers every module; the full suite runs it all")


# Fast-tier selection: every module keeps at least one representative
# test; the heavy encoder-compile/e2e parametrizations carry the `slow`
# marker. Predicates get the test id suffix (name[params]).
def _slow(file_pred):
    return file_pred


_SLOW_PREDICATES = {
    "test_encoder.py":
        lambda n: n != "test_constant_image_reconstructs_exactly",
    "test_roundtrip.py":
        lambda n: n != "test_encode_decode_recon_matches[27]",
    "test_cli.py": lambda n: n != "test_genlabels",
    "test_sbh.py": lambda n: n == "test_full_decoder_with_sbh",
    "test_nxn.py": lambda n: n not in (
        "test_nxn_fires_and_roundtrips", "test_nxn_native_matches_python"),
    "test_tusplit.py": lambda n: (n.startswith("test_hm_decoder_agrees")
                                  or n == "test_full_decode_matches_recon"),
    "test_transform_skip.py": lambda n: n in (
        "test_ts_full_decode_matches_recon", "test_ts_hm_decoder_agrees",
        "test_ts_off_config_roundtrips"),
    "test_sao.py": lambda n: n == "test_merge_decision_and_roundtrip",
    "test_native_entropy.py":
        lambda n: n in ("test_native_matches_python_bytes[22]",
                        "test_native_matches_python_bytes[45]"),
    "test_sharded.py": lambda n: n not in (
        "test_make_mesh_shapes", "test_wavefront_tiled_tables"),
    "test_sharded_hd.py": lambda n: True,
    "test_satd_fused.py":
        lambda n: (n.startswith("test_fused_matches_unfused")
                   and "4]" not in n and "[4" not in n),
    "test_conformance.py":
        lambda n: n != "test_our_decoder_decodes_hm_anchor_stream[27]",
    "test_hash_lite.py": lambda n: (
        n == "test_lite_stream_identical_and_checksum_verifies"
        or n.startswith("test_decoder_verifies_each_hash_type")),
    "test_deblock.py":
        lambda n: (n.startswith("test_deblock_matches_scalar")
                   and "22" not in n),
    "test_decode_errors.py":
        lambda n: n not in ("test_good_stream_decodes",
                            "test_tiles_pps_rejected"),
    "test_convnet2.py": lambda n: n == "test_forward_matches_torch",
    # fast tier keeps the shared-fixture roundtrip + the pure-host guards;
    # the extra encoder compiles (constant-map, LCU alloc) are slow
    "test_sei_poc.py": lambda n: n not in ("test_sei_framing_roundtrip",
                                           "test_cra_refresh_roundtrip"),
    "test_wpp.py": lambda n: n not in ("test_wpp_roundtrip",
                                       "test_wpp_entry_points_parse"),
    "test_cuqp.py": lambda n: n in (
        "test_constant_map_matches_scalar_path",
        "test_lcu_rate_control_allocates",
        "test_hm_decoder_agrees"),
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    for item in items:
        pred = _SLOW_PREDICATES.get(item.fspath.basename)
        if pred is not None and pred(item.name):
            item.add_marker(_pytest.mark.slow)
