"""Pallas TPU kernels for the hot path (fused Douglas ADI time loop)."""
