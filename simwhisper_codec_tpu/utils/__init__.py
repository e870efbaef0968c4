"""Utilities: checkpoint import/export, audio I/O, logging, profiling."""
