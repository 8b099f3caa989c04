"""PRNG-key plumbing.

The reference relies on torch's implicit global RNG (`torch.multinomial`,
`Categorical.sample` — e.g. SeqGan_Pytorch/generator.py:80,
leak_gan/model.py:233).  JAX is explicit: every stochastic op takes a key.
This module gives the rest of the framework one tiny, consistent vocabulary.

Parity note (SURVEY.md §7 hard-part 5): torch and JAX PRNGs cannot match
sample-for-sample; parity with the reference is distributional (oracle NLL,
reconstruction loss), not token-exact.
"""

from __future__ import annotations

import jax


class KeySeq:
    """A mutable stream of PRNG keys for host-side orchestration code.

    Inside jitted functions, split keys explicitly; this helper is for train
    loops and tests where threading a key through every call is noise.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def __next__(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def next(self):
        return next(self)

    def take(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs

    @property
    def key(self):
        return self._key
