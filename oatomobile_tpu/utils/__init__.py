"""Utilities: spaces, loggers, checkpointing, graphics, profiling."""
