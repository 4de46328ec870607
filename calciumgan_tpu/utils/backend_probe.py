"""Backend-safe platform inspection shared by the driver entry points.

During a tunnel outage ANY call that initialises the default (axon TPU)
backend — ``jax.devices()``, even ``jax.default_backend()`` — hangs in the
plugin's device discovery; that wedged the round-3 driver probe
(MULTICHIP_r03 rc=124). Callers that must route WITHOUT touching the
device (``bench.py:_probe_device``, ``__graft_entry__.dryrun_multichip``)
therefore inspect only the *configured* platform string through this one
helper, so a future fix (say a renamed config key or multi-platform
handling) cannot silently miss one of the two copies.
"""

import os

import jax  # importing jax does NOT initialise a backend


def configured_platforms() -> str:
    """The configured jax platform string, never initialising a backend.

    Reads ``jax.config.jax_platforms`` (in-process override) falling back
    to the ``JAX_PLATFORMS`` env var; returns ``""`` when neither is set,
    i.e. platform selection is deferred to plugin discovery (on this host
    the pre-set axon plugin, which may hang). Only when this returns
    exactly ``"cpu"`` is a device query safe during an outage.
    """
    return str(getattr(jax.config, "jax_platforms", None)
               or os.environ.get("JAX_PLATFORMS") or "")
