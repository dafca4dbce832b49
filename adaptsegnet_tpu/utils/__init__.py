"""Checkpointing, torch interop, config, logging, profiling utilities."""
