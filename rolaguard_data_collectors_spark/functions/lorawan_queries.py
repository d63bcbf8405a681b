from ..registry import QuerySpec

QUERIES: list[QuerySpec] = []
