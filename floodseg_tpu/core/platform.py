"""Backend/platform plumbing shared by every CLI entry point."""

import os


def honor_jax_platforms_env() -> None:
    """Honor an explicit ``JAX_PLATFORMS`` even under launchers whose
    sitecustomize force-sets ``jax_platforms`` at interpreter start (which
    would otherwise silently steal the TPU tunnel from a run that asked for
    cpu). No-op when the env var is unset. Must run before first backend
    use; call it at the top of every script-style entry point."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
