"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The driver benches on the real TPU chip; tests exercise numerics + sharding
on CPU (per the build environment contract)."""

import os

os.environ.setdefault("FEMO_PLATFORM", "cpu")
os.environ.setdefault("FEMO_X64", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import femo_alpha_tpu  # noqa: E402,F401  (applies platform/x64 config)
