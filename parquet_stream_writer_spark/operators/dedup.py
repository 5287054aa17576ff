"""Placeholder — filled in a later milestone this round."""

QUERIES: dict = {}
ORACLE: dict = {}
