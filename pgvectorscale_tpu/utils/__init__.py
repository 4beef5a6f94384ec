"""Utility surface: debug/stats/io re-exports.

The analog of the reference's util/ layer (SURVEY.md §2.8) collapsed to
its user-facing pieces — the page/tape/buffer machinery itself is replaced
by the flat tensor store (store.py).
"""

from .. import debug, stats
from ..io import datasets

__all__ = ["datasets", "debug", "stats"]
