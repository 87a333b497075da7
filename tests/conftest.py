"""Shared fixtures for the oracle suites (platform setup lives in the
repo-root conftest.py, which must run before any jax backend initializes)."""

import jax
import pytest


@pytest.fixture
def x64():
    """Enable f64 for the duration of a composed-oracle test: both sides
    (jax and the torch reference) run in double so tolerances measure
    algorithmic parity, not accumulated rounding."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


