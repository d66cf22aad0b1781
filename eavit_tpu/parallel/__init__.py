"""Parallelism: device mesh construction and data-parallel SPMD wrappers."""
