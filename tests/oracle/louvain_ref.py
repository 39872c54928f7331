"""Sequential Louvain oracle — python-louvain 0.16 semantics, pinned.

The reference delegates clustering to python-louvain's best_partition
(resolution=3.0, random_state=42; /root/reference/tool/Neo4jLouvainProcessor.py:22,285).
That library is not installed in this sandbox, so this module reimplements
its semantics from the public algorithm spec (Blondel et al. 2008 + the
python-louvain 0.16 gain/termination conventions), with two orderings
*pinned* so distributed and sequential runs can agree exactly
(SURVEY.md §2.8, §7):

  1. node visit order per pass: ascending node ids shuffled by
     np.random.RandomState((seed + 1000003*level) % 2**32), the stream
     continuing across passes within a level (pure function of
     (seed, level) — never wall-clock);
  2. candidate-community iteration: ascending community id, strict '>'
     improvement (first max encountered wins).

Everything else matches python-louvain 0.16: gain
Δ = remove_cost + dnc - resolution·Σ_tot·k_i/(2m); pass loop ends when no
node moved or pass modularity gain < 1e-7 (__MIN); dendrogram level loop
ends when level gain < 1e-7; communities renumbered 0..k-1 by first
appearance over ascending node order; induced graph sums edge weights with
self-loops kept; zero-edge graph → each node its own community.
"""

from __future__ import annotations

import numpy as np

MIN_GAIN = 1e-7


def _level_rng(seed: int, level: int) -> np.random.RandomState:
    return np.random.RandomState((seed + 1000003 * level) % (2**32))


def _build(nodes, edges):
    """adjacency dict, strengths (self-loops twice), total weight m."""
    adj = {u: {} for u in nodes}
    m = 0.0
    for u, v, w in edges:
        w = float(w)
        m += w
        adj[u][v] = adj[u].get(v, 0.0) + w
        if u != v:
            adj[v][u] = adj[v].get(u, 0.0) + w
    k = {u: sum(ws.values()) + ws.get(u, 0.0) for u, ws in adj.items()}
    return adj, k, m


def _modularity(internals, tot, m, resolution):
    q = 0.0
    for c, d in tot.items():
        q += internals.get(c, 0.0) * resolution / m - (d / (2.0 * m)) ** 2
    return q


def one_level(nodes, edges, resolution, seed, level, min_gain=MIN_GAIN):
    """One local-move phase. Returns (node2com, modularity_after)."""
    nodes = sorted(nodes)
    adj, k, m = _build(nodes, edges)
    node2com = {u: i for i, u in enumerate(nodes)}
    tot = {node2com[u]: k[u] for u in nodes}
    internals = {node2com[u]: adj[u].get(u, 0.0) for u in nodes}
    selfw = {u: adj[u].get(u, 0.0) for u in nodes}
    rng = _level_rng(seed, level)

    modified = True
    cur_mod = _modularity(internals, tot, m, resolution)
    new_mod = cur_mod
    while modified:
        cur_mod = new_mod
        modified = False
        order = list(nodes)
        rng.shuffle(order)
        for u in order:
            com_u = node2com[u]
            degc_totw = k[u] / (2.0 * m)
            neigh = {}
            for v, w in adj[u].items():
                if v != u:
                    cv = node2com[v]
                    neigh[cv] = neigh.get(cv, 0.0) + w
            remove_cost = -neigh.get(com_u, 0.0) + resolution * (
                tot[com_u] - k[u]
            ) * degc_totw
            # remove u from its community
            tot[com_u] -= k[u]
            internals[com_u] -= neigh.get(com_u, 0.0) + selfw[u]
            best_com, best_incr = com_u, 0.0
            for c in sorted(neigh):
                incr = remove_cost + neigh[c] - resolution * tot[c] * degc_totw
                if incr > best_incr:
                    best_incr, best_com = incr, c
            tot[best_com] = tot.get(best_com, 0.0) + k[u]
            internals[best_com] = (
                internals.get(best_com, 0.0) + neigh.get(best_com, 0.0) + selfw[u]
            )
            node2com[u] = best_com
            if best_com != com_u:
                modified = True
        new_mod = _modularity(internals, tot, m, resolution)
        if new_mod - cur_mod < min_gain:
            break
    return node2com, new_mod


def _renumber(node2com, nodes):
    """0..k-1 by first appearance over ascending node order."""
    mapping = {}
    out = {}
    for u in sorted(nodes):
        c = node2com[u]
        if c not in mapping:
            mapping[c] = len(mapping)
        out[u] = mapping[c]
    return out


def _induced(edges, partition):
    agg = {}
    for u, v, w in edges:
        a, b = partition[u], partition[v]
        key = (min(a, b), max(a, b))
        agg[key] = agg.get(key, 0.0) + float(w)
    return [(a, b, w) for (a, b), w in sorted(agg.items())]


def best_partition(nodes, edges, resolution=1.0, seed=42, weighted=True):
    """Full dendrogram → final partition {node: community 0..k-1}."""
    nodes = sorted(nodes)
    if weighted:
        edges = [(u, v, float(w)) for u, v, w in edges]
    else:
        edges = [(u, v, 1.0) for u, v, _ in edges]
    if not edges or sum(w for _, _, w in edges) == 0:
        return {u: i for i, u in enumerate(nodes)}

    part0, mod = one_level(nodes, edges, resolution, seed, level=0)
    levels = [_renumber(part0, nodes)]
    cur_edges = _induced(edges, levels[-1])
    cur_nodes = sorted(set(levels[-1].values()))
    level = 1
    while True:
        part, new_mod = one_level(cur_nodes, cur_edges, resolution, seed, level)
        if new_mod - mod < MIN_GAIN:
            break
        levels.append(_renumber(part, cur_nodes))
        mod = new_mod
        cur_edges = _induced(cur_edges, levels[-1])
        cur_nodes = sorted(set(levels[-1].values()))
        level += 1

    final = dict(levels[0])
    for lvl in levels[1:]:
        final = {u: lvl[c] for u, c in final.items()}
    return final


def partition_modularity(nodes, edges, partition, resolution=1.0, weighted=True):
    """Modularity of an arbitrary partition (python-louvain conventions)."""
    m = 0.0
    internals = {}
    tot = {}
    for u, v, w in edges:
        w = float(w) if weighted else 1.0
        m += w
        cu, cv = partition[u], partition[v]
        if cu == cv:
            internals[cu] = internals.get(cu, 0.0) + w
        tot[cu] = tot.get(cu, 0.0) + w
        tot[cv] = tot.get(cv, 0.0) + w
    if m == 0:
        return 0.0
    return _modularity(internals, tot, m, resolution)
