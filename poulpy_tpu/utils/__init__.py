"""Utilities: serialization, fingerprints, statistics."""
