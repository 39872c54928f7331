"""louvain_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities mirror the reference pipeline (dawnai/Louvain, see SURVEY.md):
co-occurrence graph construction from transcript-style tables, weighted
Louvain community detection, plus the standard link-graph operator family
(PageRank, connected components, label propagation, triangle counting),
a deterministic semantic-similarity stage, and large-scale training-data
operators (dedup, ANN similarity, text stats).

Everything is expressed DataFrame-first (Catalyst-optimizable); Python only
appears as vectorized pandas/Arrow UDFs — never per-row Python.
"""

__version__ = "0.1.0"

from louvain_spark.session import get_spark  # noqa: F401
