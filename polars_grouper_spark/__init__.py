"""polars_grouper_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``Edwardvaneechoud/polars_grouper``.

The reference (read-only at ``/root/reference``) is a Polars expression-plugin
library of graph operators over edge-list DataFrames
(``polars_grouper/__init__.py:1-550``).  This package re-expresses every
public operator Spark-first: declarative DataFrame programs optimized by
Catalyst, driver-side bounded iteration for the iterative algorithms, and
Arrow-batched ``applyInPandas`` only where per-source kernels genuinely need
imperative logic (Brandes betweenness).

Public surface (reference parity — ``polars_grouper/__init__.py``):

- :func:`graph_solver` / :func:`super_merger` / :func:`super_merger_weighted`
  — connected components with first-appearance group numbering.
- :func:`page_rank` / :func:`page_rank_nodes` — power iteration with the
  reference's dangling-mass leak.
- :func:`calculate_shortest_path` — all-pairs weighted shortest paths with
  x1000 integer weight quantization.
- :func:`betweenness_centrality` — Brandes, parallel over sources
  (broadcast adjacency, ``max_broadcast_edges``-guarded);
  :func:`betweenness_centrality_distributed` — both Brandes passes as
  key-partitioned joins, no broadcast adjacency, for graphs past the
  broadcast regime.
- :func:`graph_association_rules` — pairwise co-occurrence rule mining.

Beyond the reference surface (100 TB training-data pipeline ops):
``functions.dedup`` (exact / MinHash-LSH / SimHash / n-gram Jaccard),
``functions.similarity`` (cosine top-k, LSH buckets), ``functions.text``
(token stats, language id, quality, fingerprints), ``functions.multimodal``
(binary-column plumbing), ``streaming`` (windowed aggs, streaming dedup,
sessionization), :func:`asof_join` (point-in-time join via union+window),
:func:`range_join` (interval join, broadcast or bucketed).
"""

from polars_grouper_spark.operators.connected_components import (
    components,
    connected_components,
    graph_solver,
    super_merger,
    super_merger_weighted,
)
from polars_grouper_spark.operators.pagerank import (
    page_rank,
    page_rank_nodes,
    page_rank_nodes_bucketed,
)
from polars_grouper_spark.operators.shortest_path import calculate_shortest_path
from polars_grouper_spark.operators.betweenness import (
    betweenness_centrality,
    betweenness_centrality_distributed,
)
from polars_grouper_spark.operators.association_rules import graph_association_rules
from polars_grouper_spark.operators.asof_join import asof_join
from polars_grouper_spark.operators.range_join import range_join
from polars_grouper_spark.session import get_spark

__all__ = [
    "asof_join",
    "betweenness_centrality",
    "betweenness_centrality_distributed",
    "calculate_shortest_path",
    "components",
    "connected_components",
    "get_spark",
    "graph_association_rules",
    "graph_solver",
    "page_rank",
    "page_rank_nodes",
    "page_rank_nodes_bucketed",
    "range_join",
    "super_merger",
    "super_merger_weighted",
]

__version__ = "0.1.0"
