"""Operator library: scalar transforms, relational surface, stateful
batch-shadows. Each module exposes ``QUERIES: list[QuerySpec]``."""
