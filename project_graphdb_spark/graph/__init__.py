from project_graphdb_spark.graph.property_graph import EdgeFrame, PropertyGraph  # noqa: F401
from project_graphdb_spark.graph.builder import build_graph, tpch_graph  # noqa: F401
