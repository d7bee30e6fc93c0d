"""Structured Streaming operators over the events table. The reference is a
pure batch engine (SURVEY.md §1.1) — streaming here extends it with the
pipeline capabilities a training-data system needs. Populated incrementally.
"""

from __future__ import annotations
