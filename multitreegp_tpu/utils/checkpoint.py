"""Checkpoint / resume for evolution runs.

The reference has no serialization at all (SURVEY.md §5.4); here the complete
run state — populations, PRNG key, generation counter, best-so-far history —
round-trips through a single compressed npz file. Cheap by design: the state
is a handful of arrays.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.trees import TreeTensors


def save_checkpoint(
    path: str,
    populations: TreeTensors,
    key,
    generation: int,
    best_fitnesses=None,
    best_solutions: Optional[TreeTensors] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    arrays = {
        "ops": np.asarray(populations.ops),
        "c1": np.asarray(populations.c1),
        "c2": np.asarray(populations.c2),
        "const": np.asarray(populations.const),
        "key": np.asarray(key),
        "generation": np.asarray(generation),
    }
    if best_fitnesses is not None:
        arrays["best_fitnesses"] = np.asarray(best_fitnesses)
    if best_solutions is not None:
        arrays["best_ops"] = np.asarray(best_solutions.ops)
        arrays["best_c1"] = np.asarray(best_solutions.c1)
        arrays["best_c2"] = np.asarray(best_solutions.c2)
        arrays["best_const"] = np.asarray(best_solutions.const)
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)  # atomic, never leaves a torn checkpoint


def load_checkpoint(path: str) -> Dict[str, Any]:
    with np.load(path) as z:
        out: Dict[str, Any] = {
            "populations": TreeTensors(
                jnp.asarray(z["ops"]),
                jnp.asarray(z["c1"]),
                jnp.asarray(z["c2"]),
                jnp.asarray(z["const"]),
            ),
            "key": jnp.asarray(z["key"]),
            "generation": int(z["generation"]),
        }
        if "best_fitnesses" in z:
            out["best_fitnesses"] = jnp.asarray(z["best_fitnesses"])
        if "best_ops" in z:
            out["best_solutions"] = TreeTensors(
                jnp.asarray(z["best_ops"]),
                jnp.asarray(z["best_c1"]),
                jnp.asarray(z["best_c2"]),
                jnp.asarray(z["best_const"]),
            )
        out["extra"] = {
            k[len("extra_") :]: np.asarray(z[k]) for k in z.files if k.startswith("extra_")
        }
    return out
