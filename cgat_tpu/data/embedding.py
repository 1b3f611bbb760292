"""Element-embedding featuriser (reference: CGAT/roost_message.py:33-84).

Loads an element -> vector table from JSON. The matscholar 200-d embedding
(public data from the matscholar project, shipped with the reference under
embeddings/matscholar-embedding.json) is bundled as the default.
"""
from __future__ import annotations

import json
import os
from importlib import resources

import numpy as np

DEFAULT_EMBEDDING = "matscholar-embedding.json"


class Featuriser:
    """Element -> feature-vector lookup (roost_message.py:33-55)."""

    def __init__(self, embedding: dict[str, np.ndarray]):
        self._embedding = {k: np.asarray(v, dtype=np.float32)
                           for k, v in embedding.items()}
        self.allowed_types = set(self._embedding)

    def get_fea(self, key: str) -> np.ndarray:
        if key not in self.allowed_types:
            raise KeyError(f"{key} is not an allowed atom type")
        return self._embedding[key]

    @property
    def embedding_size(self) -> int:
        return len(next(iter(self._embedding.values())))

    def state_dict(self):
        return self._embedding

    def matrix(self, symbols: list[str]) -> np.ndarray:
        return np.stack([self.get_fea(s) for s in symbols])


def load_featuriser(path: str | None = None) -> Featuriser:
    """Load a featuriser from ``path`` or fall back to the bundled matscholar
    embedding (LoadFeaturiser, roost_message.py:58-84)."""
    if path is not None and os.path.exists(path):
        with open(path) as f:
            return Featuriser(json.load(f))
    if path is not None and not os.path.exists(path):
        base = os.path.basename(path)
        bundled = resources.files("cgat_tpu.data") / "embeddings" / base
        if bundled.is_file():
            return Featuriser(json.loads(bundled.read_text()))
        raise FileNotFoundError(path)
    bundled = resources.files("cgat_tpu.data") / "embeddings" / DEFAULT_EMBEDDING
    return Featuriser(json.loads(bundled.read_text()))
