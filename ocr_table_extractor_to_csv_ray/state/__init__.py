"""Per-partition lineage records and resumable-output bookkeeping."""
