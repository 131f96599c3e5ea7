"""Structured Streaming variant of the medallion pipeline."""
