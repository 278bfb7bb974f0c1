"""Host/runtime environment helpers (no reference counterpart).

The TPU in this development environment is reached through a PJRT plugin that
force-prepends itself to ``jax_platforms`` at import time, which silently
overrides a user's ``JAX_PLATFORMS=cpu`` request (DEVNOTES.md). Entry points
call :func:`respect_jax_platforms_env` so the documented env var works the
way JAX users expect — e.g. to run CLIs/scripts on CPU while the TPU is busy,
or to force the virtual multi-device CPU mesh in tests.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` over any plugin that overrode it.

    Must run before the first JAX backend is created; a no-op when the env
    var is unset or names the plugin platform itself. NOTE: write-only on
    purpose — merely *reading* ``jax.config.jax_platforms`` triggers PJRT
    plugin discovery, which re-prepends the plugin and defeats the override.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want and "axon" not in want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized: too late to switch
