"""graph_loom_spark — a PySpark-native property-graph analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the Graph-Loom reference (jackpots28/Graph-Loom): a property-graph data
model (nodes/edges as DataFrames), an OpenCypher-subset compiler that
targets DataFrame/Catalyst logical plans, graph analytics (degrees,
weighted label propagation, connected components), JSON/CSV export, and
a large-scale data-pipeline operator library (dedup, similarity search,
text analysis, streaming) designed for 100 TB-class Spark clusters.

Nothing in this package is a port of the reference's Rust execution
engine; plans are declared with the DataFrame API and optimized by
Catalyst/Tungsten.
"""

from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.interface import CypherSession, QueryOutcome
from graph_loom_spark.session import get_spark

__all__ = ["PropertyGraph", "CypherSession", "QueryOutcome", "get_spark"]

__version__ = "0.1.0"
