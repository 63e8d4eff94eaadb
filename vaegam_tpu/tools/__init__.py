"""Validation / measurement tools (host-side, not part of the train path)."""
