"""Shared runtime core: config, checkpoint, metrics, optimizers, PRNG, mesh."""
