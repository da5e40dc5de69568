"""Hamiltonian system definitions (Euclidean and constrained)."""
