"""Attic: measured-negative kernels kept for the record, not capability.

Each module here was built, parity-tested, and benchmarked on the real
v5e, and LOST (or tied) against the production path it tried to replace.
They are quarantined out of ops/ so the live kernel surface reflects what
actually runs; tests still cover them so the negative results stay
reproducible."""
