"""Shared runtime utilities: checkpointing, logging, RNG threading."""
