"""Batch-incremental machinery: watermarks, checkpoints, bounded work."""
