"""Functional-map texture transfer: render a field trained on shape A directly
on shape B by expressing A's eigenbasis in B's.

Library equivalent of the reference's four texture_transfer/*.ipynb notebooks
(P2P variant, e.g. texture_transfer_cat_tosca2.ipynb cells 6-7) and of
mesh.py:590-605 (ground-truth variant). Flow: given a point-to-point
correspondence P (target vertex i corresponds to source vertex P[i]), the
functional map over FULL bases (constant eigenfunction included) is

    C = E_tgt^T  M_tgt  Q  E_src,    Q[i, P[i]] = 1

and the transferred features are the first k non-constant columns of
E_tgt @ C, range-rescaled. A trained TextureField consumes them unchanged —
no retraining, just `Renderer(model, target_mesh, mapped_efuncs)`.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sparse


def p2p_matrix(correspondence, n_src, n_tgt):
    """Sparse permutation-like matrix Q [n_tgt, n_src] from a point-to-point
    correspondence array (target vertex i -> source vertex correspondence[i])."""
    correspondence = np.asarray(correspondence).reshape(-1)
    assert correspondence.shape[0] == n_tgt
    rows = np.arange(n_tgt)
    data = np.ones(n_tgt, dtype=np.float32)
    return sparse.csr_matrix((data, (rows, correspondence)), shape=(n_tgt, n_src))


def functional_map_from_p2p(E_tgt_full, M_tgt, Q, E_src_full):
    """C = E_tgt^T M_tgt Q E_src over FULL (constant-including) bases."""
    return E_tgt_full.T @ (M_tgt @ (Q @ E_src_full))


def map_eigenfunctions_p2p(
    E_src_full,
    E_tgt_full,
    M_tgt,
    correspondence,
    k,
    rescale=True,
):
    """Transferred eigenfeatures on the target mesh.

    Args:
      E_src_full / E_tgt_full: [V,*] UNRESCALED bases including the constant
        first eigenfunction (use keep_first_efunc preprocessing).
      M_tgt: target mass matrix (diagonal csr).
      correspondence: [V_tgt] int, target -> source vertex ids.
      k: int (first-k) or index list into the source's non-constant functions.
    Returns float32 [V_tgt, k'] features, range-rescaled like the notebooks.
    """
    Q = p2p_matrix(correspondence, E_src_full.shape[0], E_tgt_full.shape[0])
    C = functional_map_from_p2p(E_tgt_full, M_tgt, Q, E_src_full)
    mapped = E_tgt_full @ C  # V_tgt x k_src_full

    if isinstance(k, list):
        mapped = mapped[:, np.asarray(k) + 1]  # +1: skip the constant column
    else:
        mapped = mapped[:, 1 : k + 1]

    if rescale:
        mapped = mapped / (
            np.max(mapped, axis=0, keepdims=True) - np.min(mapped, axis=0, keepdims=True)
        )
    return mapped.astype(np.float32)


def get_remapped_efuncs_with_fm_gt(E_source, M_source, E_target, rescale=True):
    """Ground-truth functional map variant (reference mesh.py:590-605):
    C = E_src^T M_src E_tgt; mapped = E_src @ C, range-rescaled. Both inputs
    unrescaled, without the constant eigenfunction."""
    C = E_source.T @ (M_source @ E_target)
    mapped = E_source @ C
    if rescale:
        mapped = mapped / (
            np.max(mapped, axis=0, keepdims=True) - np.min(mapped, axis=0, keepdims=True)
        )
    return mapped.astype(np.float32)
