"""Pipeline plans: orchestration, checkpoint/resume, lineage."""
