import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (the driver separately dry-runs multichip).
# Set FLOODSEG_TEST_TPU=1 to keep the real accelerator visible instead and
# run the @pytest.mark.tpu hardware tests.
if os.environ.get("FLOODSEG_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # The axon sitecustomize hook force-sets jax_platforms="axon,cpu" at
    # interpreter start, overriding the env var — undo it before any backend
    # initializes so tests really run on CPU.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
