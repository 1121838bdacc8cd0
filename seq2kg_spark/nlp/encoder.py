"""F5 — wordpiece embedding (the bert-as-a-service seam).

The reference embeds wordpieces by calling a bert-as-a-service server over
ZeroMQ per batch (joint_model/data_utils.py:228-229; servers in
sourcecode/bert/run_server_*.sh).  In Spark that process hop disappears:
the encoder runs *inside* the inference UDF over each Arrow batch, with
weights loaded once per executor.

No BERT weights ship in this sandbox, so the default encoder is a
deterministic hash-projection: each wordpiece maps to a unit-norm
pseudo-random vector (splitmix64-seeded), mixed with its neighbors for a
cheap context effect.  It has BERT's exact interface and tensor shapes
((batch, max_len, dim), pooling=NONE), so swapping in a real
torch/transformers encoder is a one-class change.
"""

from __future__ import annotations

import numpy as np

_MASK = (1 << 64) - 1


def _splitmix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    z = x
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _hash64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode("utf-8"):
        h = ((h ^ ch) * 0x100000001B3) & _MASK
    return h


class HashEncoder:
    """Deterministic stand-in encoder; interface mirrors pooling=NONE BERT."""

    def __init__(self, dim: int = 64, seed: int = 42, context: bool = True):
        self.dim = dim
        self.seed = seed
        self.context = context
        self._cache: dict[str, np.ndarray] = {}

    def _vec(self, wp: str) -> np.ndarray:
        v = self._cache.get(wp)
        if v is None:
            state = _splitmix(_hash64(wp) ^ self.seed)
            vals = np.empty(self.dim, dtype=np.float32)
            for i in range(self.dim):
                state = _splitmix(state)
                vals[i] = ((state >> 11) / float(1 << 53)) * 2.0 - 1.0
            v = vals / (np.linalg.norm(vals) + 1e-9)
            self._cache[wp] = v
        return v

    def encode(
        self, batch_wordpieces: list[list[str]], max_len: int
    ) -> np.ndarray:
        """(B, max_len, dim) float32; [PAD] rows are zero."""
        out = np.zeros((len(batch_wordpieces), max_len, self.dim),
                       dtype=np.float32)
        for b, wps in enumerate(batch_wordpieces):
            n = min(len(wps), max_len)
            for i in range(n):
                out[b, i] = self._vec(wps[i])
            if self.context and n > 1:
                ctx = out[b, :n].copy()
                out[b, 1:n] += 0.25 * ctx[: n - 1]
                out[b, : n - 1] += 0.25 * ctx[1:n]
        return out
