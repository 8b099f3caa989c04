"""Jitted compute primitives shared across model families."""

from music_tpu.ops.mulaw import mu_law_encode, mu_law_decode, one_hot  # noqa: F401
from music_tpu.ops.conv import causal_conv, dilated_causal_conv  # noqa: F401
