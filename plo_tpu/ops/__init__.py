"""Compute kernels for the five-stage pipeline (TPU-native, batched, masked)."""
