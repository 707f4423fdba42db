"""Offline text KV stores (pair/triplet descriptions + embeddings).

Reference (SURVEY.md §2.12): dbm files keyed ``"sub#obj"`` /
``"sub#obj#rel"`` holding GPT-3.5 description strings and ada-002 1536-d
embeddings, opened read-only at detector init
(mask2former_relation_v2.py:101-105) and ``pickle.loads``-ed per lookup;
missing keys fall back to empty string / zero embedding
(openseed_relation.py:346-354).

TPU redesign: lookups happen ONCE per image on the host (N ≤ 30 names →
≤900 pair keys) and are packed into a dense [N, N, T] array fed to the
jitted head — no per-forward dbm reads.  An in-memory dict backend makes
tests hermetic; a builder utility writes stores from a json of
{key: vector} for users generating their own descriptions.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np


class TextKVStore:
    """Read-only KV of numpy vectors with zero-fallback."""

    def __init__(
        self,
        path: Optional[str] = None,
        embedding_size: int = 1536,
        table: Optional[Dict[str, np.ndarray]] = None,
    ):
        self.embedding_size = embedding_size
        self._db = None
        self._table = table
        if path is not None and os.path.exists(path):
            import dbm

            self._db = dbm.open(path, "r")

    def get(self, key: str) -> np.ndarray:
        if self._table is not None and key in self._table:
            return np.asarray(self._table[key], np.float32)
        if self._db is not None:
            raw = self._db.get(key.encode("utf-8"))
            if raw is not None:
                val = pickle.loads(raw)
                return np.asarray(val, np.float32)
        return np.zeros(self.embedding_size, np.float32)

    def pair_matrix(self, names: Sequence[str]) -> np.ndarray:
        """[N, N, T] embeddings for all ordered name pairs ('sub#obj')."""
        N = len(names)
        out = np.zeros((N, N, self.embedding_size), np.float32)
        for i, a in enumerate(names):
            for j, b in enumerate(names):
                out[i, j] = self.get(f"{a}#{b}")
        return out

    def triplet_matrix(
        self, names: Sequence[str], relations: Sequence[str]
    ) -> np.ndarray:
        """[N, N, R, T] embeddings for 'sub#obj#rel' keys."""
        N, R = len(names), len(relations)
        out = np.zeros((N, N, R, self.embedding_size), np.float32)
        for i, a in enumerate(names):
            for j, b in enumerate(names):
                for r, rel in enumerate(relations):
                    out[i, j, r] = self.get(f"{a}#{b}#{rel}")
        return out

    def close(self):
        if self._db is not None:
            self._db.close()


def build_store(path: str, table: Dict[str, np.ndarray]) -> None:
    """Write a dbm store from {key: vector} (generation-script stand-in;
    the reference's generators are not in its repo)."""
    import dbm

    with dbm.open(path, "c") as db:
        for k, v in table.items():
            db[k.encode("utf-8")] = pickle.dumps(np.asarray(v, np.float32))
