"""Placeholder — filled in a later milestone."""
