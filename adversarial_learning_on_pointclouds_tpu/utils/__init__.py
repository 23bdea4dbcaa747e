"""Utilities: metrics, checkpointing, logging, profiling."""
