"""Cypher-subset front end: parser → ClauseList IR → DataFrame compiler."""

from graph_loom_spark.cypher.parser import parse
from graph_loom_spark.cypher.compiler import CypherExecutor

__all__ = ["parse", "CypherExecutor"]
