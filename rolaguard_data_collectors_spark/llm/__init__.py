"""LLM-data-pipeline operators."""
