"""Test-suite environment: CPU backend with 8 virtual devices.

Mirrors the reference's two-tier test strategy (SURVEY §4) but inverts the
economics: kernel-vs-oracle and multi-chip sharding tests run on the CPU
backend (Pallas ``interpret=True``, ``xla_force_host_platform_device_count``),
so the whole suite is hardware-free.

Note: this environment's sitecustomize may pre-import jax and force the TPU
platform; we flip back to CPU *after* import (legal until a backend is
initialized) and request 8 virtual CPU devices before the CPU client spins up.
"""

import os

if os.environ.get("VIFORSDES_TEST_TPU") == "1":
    # Hardware tier: leave the axon TPU backend registered so the
    # @skipif(backend != "tpu") tests actually execute on the chip.
    # Usage: VIFORSDES_TEST_TPU=1 pytest tests/test_flash_attention.py
    import jax  # noqa: F401
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
