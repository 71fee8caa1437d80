"""Run state: partitioned checkpoint manifests and resume logic."""
