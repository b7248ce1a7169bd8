"""Alias package: reference-compatible import path ``pymes_tpu.model.ueg``
(the array-native implementation lives in ``pymes_tpu.models``)."""

from pymes_tpu.models import ueg  # noqa: F401
