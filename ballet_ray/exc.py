"""Validation-surface exceptions (reference ballet/exc.py parity)."""

from __future__ import annotations


class BalletRayError(Exception):
    """Base error for the engine."""


class InvalidProjectStructure(BalletRayError):
    """The contrib package is missing or contains no collectible features."""


class InvalidFeatureApi(BalletRayError):
    """A collected feature failed the feature-API conformance checks."""


class FeatureRejected(BalletRayError):
    """The proposed feature was rejected by the configured accepter."""


class NoFeaturesCollectedError(BalletRayError):
    """No Feature objects could be collected from the contrib package."""


class SkippedValidationTest(BalletRayError):
    """A validation stage was skipped (not a failure)."""
