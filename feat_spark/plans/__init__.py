"""Planning/ops concerns: leakage audit, lineage, checkpoint/resume, skew."""
