"""Serving layer: continuous batching over the jitted engine."""

from tpu_kquant.serving.scheduler import ContinuousBatcher, Request  # noqa: F401
