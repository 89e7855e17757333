"""Stateless scalar/vector functions (hashing, URL canonicalization, text)."""
