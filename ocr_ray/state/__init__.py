"""Persistent pipeline state: per-partition lineage manifests."""
