"""Test configuration: force the CPU backend with 8 virtual devices so
sharding / collective tests run without a TPU slice (SURVEY.md §4).

Note: this machine's TPU is attached through the `axon` PJRT relay whose
sitecustomize force-sets jax_platforms="axon,cpu" — eager dispatch would RPC
every op to the remote chip, making CPU tests ~100x slower. We override the
config *after* jax import, which wins over the plugin's update.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
