"""Oracle connected components via networkx (SURVEY.md §2.7).

Labels every node with the minimum (signed int64 compare) node id of
its component — the pinned cluster-id semantics.
"""

from __future__ import annotations

import networkx as nx


def cc_labels(edges, nodes=None) -> dict[int, int]:
    """edges: iterable of (src, dst); nodes: optional extra isolated
    nodes (become singleton clusters labeled by themselves)."""
    g = nx.Graph()
    if nodes is not None:
        g.add_nodes_from(nodes)
    g.add_edges_from(edges)
    labels: dict[int, int] = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for n in comp:
            labels[n] = m
    return labels
