"""Scalar function surface + training-data-pipeline function families."""
