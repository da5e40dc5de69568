"""Integrators, HMC transitions, adapters and the multi-chain driver."""
