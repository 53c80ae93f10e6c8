"""Offline tooling: dataset generation, filters, baselines, converters."""
