"""Test config: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world "fake backend" (SURVEY.md §4): multi-chip sharding logic
is exercised with XLA_FLAGS=--xla_force_host_platform_device_count=8 so tests
don't need TPU hardware and are deterministic.

NOTE: the env var JAX_PLATFORMS alone is NOT honored in this image (the
experimental 'axon' TPU plugin wins); jax.config.update must be called too.
"""
import os

# Assignment, NOT setdefault: this image exports JAX_PLATFORMS=axon
# globally, and s3grl_tpu's package import makes the ENV authoritative
# (_honor_platform_env re-applies it over any jax.config.update). With the
# env left at "axon", importing the package mid-suite flipped the config
# back, chip_is_contended() saw an axon selection, and a CPU-only test
# took (or queued on) the real chip's flock behind the accuracy queue —
# the r5 full-suite hang, twice.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
