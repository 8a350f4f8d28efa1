"""Platform selection helper.

The axon TPU plugin force-registers itself via sitecustomize and sets
JAX_PLATFORMS=axon before user code runs, so the environment variable
alone cannot select CPU. Tools call this right after importing jax to
honor an explicit user override.
"""

import os


def apply_platform_override() -> None:
    want = os.environ.get("CM2_PLATFORM")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
