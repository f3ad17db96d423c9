"""Flat .npz persistence for flax variable trees.

Checkpoints are stored as numpy .npz archives keyed by "/"-joined tree paths
(e.g. ``params/LSTM1/fwd/wi``).  This keeps model files dependency-free and
mmap-friendly; orbax remains available for training checkpoints.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            flat.update(flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_variables(path: str, variables: Dict) -> None:
    np.savez(path, **flatten_tree(variables))


def load_variables(path: str) -> Dict:
    with np.load(path) as data:
        return unflatten_tree({k: data[k] for k in data.files})
