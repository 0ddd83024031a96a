"""Graph coloring and incidence structures for Vertex Block Descent.

Host-side (NumPy) equivalents of the reference's CPU utilities
(`lib_utils/cpu_utils.h:18-57`: BuildVertexAdjacency / GreedyVertexColoring /
ValidateColoring / BuildNodeIncidence / BuildColorToNodes), plus the padding
step that turns ragged per-color node lists and per-node incidence lists into
the static-shape arrays XLA needs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "build_adjacency",
    "greedy_coloring",
    "validate_coloring",
    "build_incidence",
    "pad_colors",
    "colors_and_incidence",
]


def colors_and_incidence(conn: np.ndarray, n_coef: int):
    """Coloring + padded incidence, using the native C++ core when available
    (`tlfea.native`; ~100x faster at 100k-element scale) with this module's
    NumPy implementation as fallback. Both produce identical first-fit
    colorings.

    Returns (colors (n_coef,), inc (n_coef, max_inc, 2), inc_mask).
    """
    from tlfea import native

    colors = native.greedy_color(conn, n_coef)
    if colors is None:
        colors = greedy_coloring(build_adjacency(conn, n_coef))
        inc, mask = build_incidence(conn, n_coef)
        return colors, inc, mask
    res = native.build_incidence(conn, n_coef)
    if res is None:
        inc, mask = build_incidence(conn, n_coef)
    else:
        inc, mask = res
    return colors, inc, mask


def build_adjacency(conn: np.ndarray, n_coef: int) -> list[set[int]]:
    """Adjacency sets: coefficients are adjacent iff they share an element."""
    adj: list[set[int]] = [set() for _ in range(n_coef)]
    for row in np.asarray(conn):
        for a in row:
            adj[a].update(int(b) for b in row if b != a)
    return adj


def greedy_coloring(adj: list[set[int]]) -> np.ndarray:
    """First-fit greedy coloring in natural node order -> (n_coef,) colors."""
    n = len(adj)
    colors = np.full(n, -1, dtype=np.int64)
    for v in range(n):
        used = {colors[u] for u in adj[v] if colors[u] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[v] = c
    return colors


def validate_coloring(adj: list[set[int]], colors: np.ndarray) -> bool:
    return all(colors[v] != colors[u] for v in range(len(adj)) for u in adj[v])


def build_incidence(conn: np.ndarray, n_coef: int):
    """Per-coefficient (element, local_index) incidence lists.

    Returns (inc (n_coef, max_inc, 2) int32, inc_mask (n_coef, max_inc) bool)
    padded with (0, 0) entries where the mask is False.
    """
    conn = np.asarray(conn)
    lists: list[list[tuple[int, int]]] = [[] for _ in range(n_coef)]
    for e, row in enumerate(conn):
        for a, node in enumerate(row):
            lists[node].append((e, a))
    max_inc = max((len(l) for l in lists), default=1) or 1
    inc = np.zeros((n_coef, max_inc, 2), dtype=np.int32)
    mask = np.zeros((n_coef, max_inc), dtype=bool)
    for i, l in enumerate(lists):
        for k, (e, a) in enumerate(l):
            inc[i, k] = (e, a)
            mask[i, k] = True
    return inc, mask


def pad_colors(colors: np.ndarray, group_size: int):
    """Pack colors into (n_groups, group_size, max_nodes_per_color) arrays.

    Mirrors the reference's conflict-free color grouping
    (`SyncedVBD.cu:950-996`). Returns (nodes (G, gs, M) int32 padded with 0,
    mask (G, gs, M) bool).
    """
    n_colors = int(colors.max()) + 1
    per_color = [np.nonzero(colors == c)[0] for c in range(n_colors)]
    max_nc = max(len(p) for p in per_color)
    n_groups = -(-n_colors // group_size)
    nodes = np.zeros((n_groups, group_size, max_nc), dtype=np.int32)
    mask = np.zeros((n_groups, group_size, max_nc), dtype=bool)
    for c, p in enumerate(per_color):
        g, s = divmod(c, group_size)
        nodes[g, s, : len(p)] = p
        mask[g, s, : len(p)] = True
    return nodes, mask
