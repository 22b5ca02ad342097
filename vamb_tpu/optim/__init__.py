"""Optimizers for vamb_tpu models."""

from .dadapt import dadapt_adam  # noqa: F401
