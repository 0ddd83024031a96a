"""Sweep-and-prune broadphase over per-element AABBs.

Reference pipeline (`lib_src/collision/HydroelasticBroadphase.cu`): AABB
kernel -> CUB radix sort on min-x -> two-pass count/scan/emit pair
generation with early exit when the next box starts past the current box's
max-x, plus topological-neighbor and same-mesh filters.

TPU redesign (SURVEY P9 + hard part #2): `jnp.argsort` on min-x, then a
fixed-width candidate window of K successors per sorted element with masked
AABB overlap tests — shapes stay static regardless of contact count. The
window bound K plays the role of the reference's dynamically-counted pair
buffer; overflow is detectable (`window_overflow`) rather than silent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "BroadphaseSetup",
    "setup_broadphase",
    "setup_dense_cross",
    "find_pairs",
    "find_pairs_dense",
    "compact_pairs",
]


@struct.dataclass
class BroadphaseSetup:
    """Static element/topology data for broadphase filtering."""

    corners: jnp.ndarray  # (E, 4) corner node ids
    all_nodes: jnp.ndarray  # (E, n_nodes_per_elem) for AABB extent
    mesh_ids: jnp.ndarray  # (E,) int32
    neighbor_hashes: jnp.ndarray  # (H,) sorted uint64 of neighbor elem pairs
    window: int = struct.field(pytree_node=False)
    margin: float = struct.field(pytree_node=False)


def setup_broadphase(
    conn: np.ndarray,
    mesh_ids: np.ndarray,
    window: int = 32,
    margin: float = 0.0,
) -> BroadphaseSetup:
    """Host-side precompute: topological-neighbor pair hash set.

    Two elements are neighbors iff they share any node (the reference's
    `BuildNeighborMap`, `HydroelasticBroadphase.cu:503-567`); such pairs are
    filtered from self-collision candidates.
    """
    conn = np.asarray(conn)
    E = conn.shape[0]
    node_to_elems: dict[int, list[int]] = {}
    for e in range(E):
        for n in conn[e]:
            node_to_elems.setdefault(int(n), []).append(e)
    pairs = set()
    for elems in node_to_elems.values():
        for i_ in range(len(elems)):
            for j_ in range(i_ + 1, len(elems)):
                a, b = elems[i_], elems[j_]
                if a > b:
                    a, b = b, a
                pairs.add((a << 32) | b)
    hashes = np.sort(np.fromiter(pairs, dtype=np.uint64, count=len(pairs)))
    if hashes.size == 0:
        hashes = np.array([np.uint64(0xFFFFFFFFFFFFFFFF)], dtype=np.uint64)
    return BroadphaseSetup(
        corners=jnp.asarray(conn[:, :4].astype(np.int32)),
        all_nodes=jnp.asarray(conn.astype(np.int32)),
        mesh_ids=jnp.asarray(np.asarray(mesh_ids, dtype=np.int32)),
        neighbor_hashes=jnp.asarray(hashes),
        window=int(window),
        margin=float(margin),
    )


def _is_neighbor(bp: BroadphaseSetup, a, b):
    lo = jnp.minimum(a, b).astype(jnp.uint64)
    hi = jnp.maximum(a, b).astype(jnp.uint64)
    key = (lo << np.uint64(32)) | hi
    pos = jnp.searchsorted(bp.neighbor_hashes, key)
    pos = jnp.minimum(pos, bp.neighbor_hashes.shape[0] - 1)
    return bp.neighbor_hashes[pos] == key


def find_pairs(bp: BroadphaseSetup, x: jnp.ndarray, enable_self_collision: bool = False):
    """Candidate pairs from the current node positions.

    Returns (pairs (E*K, 2) int32, valid (E*K,) bool, window_overflow bool).
    window_overflow means some element had more than K x-overlapping
    successors — increase `window` if it fires.
    """
    pts = x[bp.all_nodes]  # (E, S, 3)
    lo = jnp.min(pts, axis=1) - bp.margin  # (E, 3)
    hi = jnp.max(pts, axis=1) + bp.margin

    # Sweep along the axis with the largest spread of box centers — the
    # reference always sorts min-x (`HydroelasticBroadphase.cu:387-420`),
    # which degenerates for scenes stacked along another axis; the adaptive
    # axis keeps the per-element candidate window small.
    centers = 0.5 * (lo + hi)
    axis = jnp.argmax(jnp.max(centers, axis=0) - jnp.min(centers, axis=0))
    lo_key = jnp.take_along_axis(lo, jnp.full((lo.shape[0], 1), axis), axis=1)[:, 0]
    hi_key = jnp.take_along_axis(hi, jnp.full((hi.shape[0], 1), axis), axis=1)[:, 0]

    order = jnp.argsort(lo_key)
    lo_s = lo[order]
    hi_s = hi[order]
    lo_key_s = lo_key[order]
    hi_key_s = hi_key[order]
    E = lo.shape[0]
    K = bp.window

    i_idx = jnp.arange(E)[:, None]  # (E, 1)
    j_off = jnp.arange(1, K + 1)[None, :]  # (1, K)
    j_idx = i_idx + j_off  # (E, K)
    in_range = j_idx < E
    j_safe = jnp.minimum(j_idx, E - 1)

    # Sweep condition: next box starts before this box ends (sweep axis).
    x_overlap = lo_key_s[j_safe] <= hi_key_s[:, None]
    # Full AABB overlap on all 3 axes (the sweep axis test is redundant but
    # cheap).
    box_overlap = jnp.all(
        (lo_s[j_safe] <= hi_s[:, None, :]) & (hi_s[j_safe] >= lo_s[:, None, :]),
        axis=-1,
    )
    valid = in_range & x_overlap & box_overlap

    # Detect window overflow: x-sweep still open at the last window slot.
    window_overflow = jnp.any(in_range[:, -1] & x_overlap[:, -1])

    ea = order[i_idx + jnp.zeros_like(j_idx)]  # (E, K)
    eb = order[j_safe]

    # Filters (reference `isNeighborPair` + same-mesh,
    # HydroelasticBroadphaseFunc.cuh:105-165).
    same_mesh = bp.mesh_ids[ea] == bp.mesh_ids[eb]
    if enable_self_collision:
        valid = valid & jnp.logical_not(
            same_mesh & jax.vmap(jax.vmap(lambda a, b: _is_neighbor(bp, a, b)))(ea, eb)
        )
    else:
        valid = valid & jnp.logical_not(same_mesh)

    pairs = jnp.stack([ea.reshape(-1), eb.reshape(-1)], axis=1).astype(jnp.int32)
    return pairs, valid.reshape(-1), window_overflow


def setup_dense_cross(conn: np.ndarray, mesh_ids: np.ndarray) -> jnp.ndarray | None:
    """Host-side enumeration of all cross-mesh element pairs -> (P, 2) int32.

    The sweep-and-prune window fails for mixed element sizes (one large floor
    element x-overlaps thousands of small item elements — measured window
    requirement 8.9k on the dragon+floor scene). For inter-mesh collision
    (self-collision off) the exact alternative is a dense cross-mesh AABB
    test: P = sum over mesh pairs of E_a * E_b candidates, each tested with
    two gathers and 6 compares — bandwidth-trivial on TPU and exact. Returns
    None when there are no cross pairs.
    """
    mesh_ids = np.asarray(mesh_ids)
    ids = np.unique(mesh_ids)
    blocks = []
    for i_ in range(len(ids)):
        for j_ in range(i_ + 1, len(ids)):
            ea = np.nonzero(mesh_ids == ids[i_])[0]
            eb = np.nonzero(mesh_ids == ids[j_])[0]
            A, B = np.meshgrid(ea, eb, indexing="ij")
            blocks.append(np.stack([A.reshape(-1), B.reshape(-1)], axis=1))
    if not blocks:
        return None
    return jnp.asarray(np.concatenate(blocks, axis=0).astype(np.int32))


def find_pairs_dense(bp: BroadphaseSetup, x: jnp.ndarray, cross_pairs: jnp.ndarray):
    """Exact AABB overlap test over a precomputed cross-mesh pair list.

    Returns (pairs (P, 2), valid (P,), overflow=False) — same contract as
    `find_pairs` but with no window to overflow.
    """
    pts = x[bp.all_nodes]  # (E, S, 3)
    lo = jnp.min(pts, axis=1) - bp.margin
    hi = jnp.max(pts, axis=1) + bp.margin
    a = cross_pairs[:, 0]
    b = cross_pairs[:, 1]
    valid = jnp.all((lo[a] <= hi[b]) & (hi[a] >= lo[b]), axis=-1)
    return cross_pairs, valid, jnp.asarray(False)


def compact_pairs(pairs: jnp.ndarray, valid: jnp.ndarray, capacity: int):
    """Compact valid pairs to a fixed capacity (stable order).

    The narrowphase then costs O(capacity) regardless of broadphase window
    size — the static-shape equivalent of the reference's count -> scan ->
    emit pass (`HydroelasticBroadphase.cu:568-660`). Returns
    (pairs (capacity, 2), valid (capacity,), overflow: bool).
    """
    n_valid = jnp.sum(valid)
    order = jnp.argsort(jnp.logical_not(valid), stable=True)[:capacity]
    out_pairs = pairs[order]
    out_valid = valid[order]
    return out_pairs, out_valid, n_valid > capacity
