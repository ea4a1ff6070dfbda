"""Control plane: job-state table with instance fencing, backfill service."""
