"""Batch pipelines — the reference's driver-side "stored procedures"
re-expressed as set-at-a-time DataFrame jobs."""
