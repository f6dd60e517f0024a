"""Finite-difference gradient validation harness (BASELINE config 3).

Central differences of the *same fixed-seed estimator* the AD path
differentiates: because every random decision is a deterministic function of
the uint32 seed lattice, f(θ+h) and f(θ-h) share their sample paths, so the
FD quotient converges to the AD derivative of the estimator everywhere except
at the measure-zero set of paths whose discrete decisions flip inside
[θ-h, θ+h] (SURVEY.md §4: finite-difference gradient tests).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def finite_difference(
    f: Callable,
    theta,
    h: float = 1e-3,
    indices: list[tuple] | None = None,
):
    """Central-difference gradient of scalar ``f`` w.r.t. pytree ``theta``.

    ``indices``: optional list of (leaf_path, flat_index) pairs to probe a
    subset; default probes every element (use only for tiny pytrees).
    Returns a pytree of float64 FD gradients matching theta's structure.
    """
    leaves, treedef = jax.tree.flatten(theta)
    grads = []
    for li, leaf in enumerate(leaves):
        leaf = np.asarray(leaf, np.float64)
        g = np.zeros_like(leaf)
        it = np.ndindex(leaf.shape) if leaf.shape else [()]
        for idx in it:
            if indices is not None and (li, idx) not in indices:
                continue
            lp = leaf.copy()
            lm = leaf.copy()
            lp[idx] += h
            lm[idx] -= h
            fp = float(f(treedef.unflatten(_sub(leaves, li, lp))))
            fm = float(f(treedef.unflatten(_sub(leaves, li, lm))))
            g[idx] = (fp - fm) / (2 * h)
        grads.append(g)
    return treedef.unflatten(grads)


def _sub(leaves, i, new):
    import jax.numpy as jnp

    out = list(leaves)
    out[i] = jnp.asarray(new.astype(np.float32))
    return out
