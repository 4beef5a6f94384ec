"""Graph debugging helpers.

Analog of the reference's debug utilities
(reference: pgvectorscale/src/access_method/graph/debugging.rs:12-50 and
``debug_count_reachable_nodes`` / ``debug_print_graph``,
graph/mod.rs:537-567).
"""

from __future__ import annotations

import numpy as np

from . import native
from .store import INVALID_ID


def count_reachable_nodes(index) -> int:
    """Nodes reachable from the default start (reachability gate used by the
    reference's connectivity tests)."""
    n = index.count
    if n == 0:
        return 0
    adj = np.ascontiguousarray(
        np.asarray(index.arrays.adjacency[:n]), dtype=np.int32
    )
    start = int(index.arrays.default_start)
    return int(native.bfs_reachable(adj, start).sum())


def degree_histogram(index) -> dict:
    n = index.count
    if n == 0:
        return {"out_min": 0, "out_mean": 0.0, "out_max": 0, "orphans": 0}
    adj = np.ascontiguousarray(
        np.asarray(index.arrays.adjacency[:n]), dtype=np.int32
    )
    deg = native.degrees(adj)
    indeg = native.in_degrees(adj)
    return {
        "out_min": int(deg.min()),
        "out_mean": float(deg.mean()),
        "out_max": int(deg.max()),
        "in_min": int(indeg.min()),
        "in_mean": float(indeg.mean()),
        "in_max": int(indeg.max()),
        "orphans": int((indeg == 0).sum()),
    }


def to_graphviz(index, max_nodes: int = 200) -> str:
    """DOT dump of the graph (debug_print_graph analog,
    graph/debugging.rs)."""
    n = min(index.count, max_nodes)
    adj = np.asarray(index.arrays.adjacency[:n])
    deleted = np.asarray(index.arrays.deleted[:n])
    lines = ["digraph diskann {"]
    start = int(index.arrays.default_start)
    for i in range(n):
        attrs = [f'label="{i}"']
        if i == start:
            attrs.append("shape=doublecircle")
        if deleted[i]:
            attrs.append("style=dashed")
        lines.append(f"  n{i} [{', '.join(attrs)}];")
        for v in adj[i]:
            if v != INVALID_ID and v < n:
                lines.append(f"  n{i} -> n{int(v)};")
    lines.append("}")
    return "\n".join(lines)
