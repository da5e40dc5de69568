"""Constraint-satisfying chain initialisation routines."""
