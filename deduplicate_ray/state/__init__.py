"""Shared mutable / iterative state: union-find, checkpoints."""
