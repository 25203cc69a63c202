"""End-to-end Ray Data pipelines (read → stages → write)."""
