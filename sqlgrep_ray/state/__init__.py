"""Checkpoint manifests (per-partition lineage + resume) and job metrics."""
