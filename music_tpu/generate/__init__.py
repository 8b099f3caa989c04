"""Per-workload generation / inference entry points."""
