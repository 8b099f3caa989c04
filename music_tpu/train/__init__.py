"""Per-workload training entry points (the reference's train.py surfaces)."""
