"""em_connected_components_spark — a PySpark-native link-graph analytics engine.

A brand-new engine with the query/data-processing capabilities of the
external-memory connected-components reference (hthetran/em-connected-components,
at /root/reference), re-expressed Spark-first:

* the reference's sorted-stream operator algebra (sort / merge / merge-join /
  dedup / sample / group-scan) becomes DataFrame joins, groupBy aggregations,
  window functions, dropDuplicates, and deterministic hash-based sampling;
* its contraction algorithms (Boruvka, Sibeyn hooking, star contraction, KKT
  recursion) collapse into one iterative driver loop of min-hooking +
  pointer-jumping supersteps with a semi-external small-graph finish
  (reference: cpp/streaming/algorithms/Boruvka.h, cpp/contraction.hpp);
* its EM machinery (STXXL vectors / sorters / priority queues) evaporates into
  Spark's shuffle/spill engine.

On top of the reference surface the engine adds PageRank, label propagation,
triangle counting, a web-page link-extraction layer (vectorized Arrow UDFs),
document dedup / text analysis / similarity search, and structured-streaming
event analytics.
"""

__version__ = "0.1.0"
