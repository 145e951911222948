"""Logging and misc helpers."""

from .logging import Logger, mkdirs  # noqa: F401
