"""Plans: end-to-end job assembly, lineage/metrics, checkpoint/resume."""
