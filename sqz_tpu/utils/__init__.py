"""Shared utilities: corpus access, synthetic data, telemetry."""
