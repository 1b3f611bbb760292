"""Generic Metropolis-Hastings chain (reference: Utilities/metropolis.py:7-41).

Used by element-balanced sampling to draw atomic numbers from an inverse
element-correlation distribution.
"""
from __future__ import annotations

import random


class MarkovChain:
    """Independence-sampler Metropolis chain: proposals from ``generator``,
    accepted with min(1, p(y)/p(x))."""

    def __init__(self, distribution, generator, start=None, *args, **kwargs):
        self.distribution = distribution
        self.generator = generator
        self.args = args
        self.kwargs = kwargs
        self.chain = []
        if start is None:
            x = generator(*args, **kwargs)
            p = distribution(x)
            while p <= 0:
                x = generator(*args, **kwargs)
                p = distribution(x)
            self.chain.append(x)
        else:
            self.chain.append(start)

    def __getitem__(self, item):
        return self.chain[item]

    def __iter__(self):
        return iter(self.chain)

    def __len__(self):
        return len(self.chain)

    def step(self, n: int = 1):
        for _ in range(n):
            y = self.generator(*self.args, **self.kwargs)
            p = min(1.0, self.distribution(y) / self.distribution(self[-1]))
            if random.random() <= p:
                self.chain.append(y)
            else:
                self.chain.append(self[-1])
