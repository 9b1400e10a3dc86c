"""Quantitative evaluation harness (4-stage, mirroring /root/reference/eval)."""
