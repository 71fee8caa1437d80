"""Reusable Ray-Data building blocks: joins, pre-aggregation, hashing."""
