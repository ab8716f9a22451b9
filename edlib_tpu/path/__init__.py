"""Alignment-path reconstruction: traceback, Hirschberg, dispatch."""
