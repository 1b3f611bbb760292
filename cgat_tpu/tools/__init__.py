from . import (additional_data, analysis, annotate, embeddings, ensemble,
               errors, loop, sample, shards)
from .metropolis import MarkovChain
from .periodic import MAX_Z, SYMBOL_TO_Z, symbol_to_z

__all__ = [
    "analysis",
    "ensemble",
    "annotate",
    "embeddings",
    "errors",
    "sample",
    "shards",
    "MarkovChain",
    "MAX_Z",
    "SYMBOL_TO_Z",
    "symbol_to_z",
]
