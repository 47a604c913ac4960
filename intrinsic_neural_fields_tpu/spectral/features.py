"""Eigenfunction feature loading & post-processing (reference mesh.py:53-108).

Pure numpy on the host (the arrays are then shipped to the device once by the
data layer). Behavioral parity notes:
  - `k` may be an int (first-k columns) or an explicit index list.
  - eigenvalue loading fixes the sign of a numerically-negative lambda_0
    (reference mesh.py:76-81).
  - "gps" embeds phi_i / sqrt(lambda_i / lambda_0) and — like the reference
    (mesh.py:84-89 returns early) — skips the rescale step.
  - "hks" computes sum_i phi_i^2 exp(-lambda_i t) over `ts` log-spaced
    timesteps in [1e-2, 1e0] (reference mesh.py:91-95).
  - rescale "standard" divides each eigenfunction by its range (max - min),
    "one-norm" L2-normalizes each VERTEX row, "unscaled" leaves as-is
    (reference mesh.py:99-106).
"""
from __future__ import annotations

import numpy as np


def postprocess_eigenfunctions(
    eigenfunctions,
    eigenvalues=None,
    rescale_strategy="standard",
    embed_strategy=None,
    ts=128,
):
    eigenfunctions = np.asarray(eigenfunctions)

    if embed_strategy is not None:
        if embed_strategy == "gps":
            assert eigenvalues is not None
            weights = np.sqrt(eigenvalues)
            weights = weights / weights[0]
            return (eigenfunctions / weights).astype(np.float32)
        elif embed_strategy == "hks":
            assert eigenvalues is not None
            timesteps = np.logspace(-2, 0, num=ts)
            eigenfunctions = (eigenfunctions * eigenfunctions) @ np.exp(
                -eigenvalues[..., None] @ timesteps[None, ...]
            )
        else:
            raise ValueError(f"Unknown embedding strategy {embed_strategy}")

    if rescale_strategy == "standard":
        rng = (
            np.max(eigenfunctions, axis=0, keepdims=True)
            - np.min(eigenfunctions, axis=0, keepdims=True)
        )
        # ≈ deviation from the reference (mesh.py:99-102 divides unguarded):
        # a constant column has range 0 and would turn into NaN/inf, which
        # poisons the whole MLP. Eigenfunction columns are never constant,
        # but descriptor matrices loaded through the same path are — SHOT
        # leaves structurally-empty histogram bins (e.g. 288/352 columns on
        # a smooth blob) identically zero. Leave zero-range columns as-is
        # (dividing by 1 is a bit-exact no-op).
        eigenfunctions = eigenfunctions / np.where(rng > 0, rng, 1.0)
    elif rescale_strategy == "one-norm":
        eigenfunctions = eigenfunctions / np.linalg.norm(
            eigenfunctions, ord=2, axis=-1, keepdims=True
        )
    elif rescale_strategy != "unscaled":
        raise RuntimeError(f"Unknown rescaling strategy: {rescale_strategy}")

    return eigenfunctions.astype(np.float32)


def load_first_k_eigenfunctions(
    eigenfunctions_path,
    k,
    rescale_strategy="standard",
    embed_strategy=None,
    eigenvalues_path=None,
    ts=128,
):
    """Load a stored eigenbasis and select/embed/rescale features.

    Returns float32 [V, k'] (k' = k, len(k) or ts depending on strategy).
    """
    all_eigenfunctions = np.load(eigenfunctions_path)
    if isinstance(k, list):
        eigenfunctions = all_eigenfunctions[:, np.array(k)]
    else:
        stored_k = all_eigenfunctions.shape[1]
        assert k <= stored_k, f"requested k={k} > stored {stored_k}"
        eigenfunctions = all_eigenfunctions[:, :k]

    eigenvalues = None
    if eigenvalues_path is not None:
        all_eigenvalues = np.load(eigenvalues_path)
        if isinstance(k, list):
            eigenvalues = all_eigenvalues[np.array(k)]
        else:
            assert k <= all_eigenvalues.shape[0]
            eigenvalues = all_eigenvalues[:k].copy()

        if np.abs(eigenvalues[0]) < 1e-10 and eigenvalues[0] < 0:
            # lambda_0 can come out as -epsilon numerically; flip its sign
            # (reference mesh.py:76-79).
            eigenvalues[0] *= -1
        assert np.all(eigenvalues > 0), f"Min eigenvalue: {eigenvalues.min()}"

    return postprocess_eigenfunctions(
        eigenfunctions,
        eigenvalues=eigenvalues,
        rescale_strategy=rescale_strategy,
        embed_strategy=embed_strategy,
        ts=ts,
    )
