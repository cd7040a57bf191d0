"""Structured Streaming surface (optional — the reference is batch-only,
SURVEY §2.9; checkpoint/resume is handled by SnapTable commits)."""
