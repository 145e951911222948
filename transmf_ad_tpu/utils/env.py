"""Shared truthy-env helper for TRANSMF_* feature flags.

All kernel-routing flags are read at TRACE time (inside flax modules), so
under a cached jitted train step flipping a flag mid-process has no
effect until the step retraces — set flags BEFORE the first compile, or
run each A/B arm in its own process (scripts/tpu_validate.sh does).
"""

from __future__ import annotations

import os

_FALSY = ("", "0", "false", "False", "no", "off")


def env_flag(name: str) -> bool:
    """True iff the env var is set to a truthy value (so `FLAG=0` is OFF,
    matching user expectations for 0/1 flags)."""
    return os.environ.get(name, "") not in _FALSY
