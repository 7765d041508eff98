"""Plans: index build orchestration, lineage, checkpoint/resume."""
