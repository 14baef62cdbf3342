"""Command-line tools: ``trpx``, plus reference-compatible ``terse``/``prolix``."""

from .main import main, prolix_main, terse_main

__all__ = ["main", "terse_main", "prolix_main"]
