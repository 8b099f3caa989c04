"""The five model families of the reference suite, rebuilt TPU-first."""
