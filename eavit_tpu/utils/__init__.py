"""Utilities: checkpointing, logging, profiling, seeding."""
