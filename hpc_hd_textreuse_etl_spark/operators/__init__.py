"""Composite relational/graph operators."""
