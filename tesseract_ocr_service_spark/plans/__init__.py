"""Execution plans: checkpointed/idempotent output commit, resume, and
persisted per-partition lineage."""
