"""Config system, logging, checkpoint conversion utilities."""
