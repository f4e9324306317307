from project_graphdb_spark.cypher.parser import parse  # noqa: F401
from project_graphdb_spark.cypher.compiler import (  # noqa: F401
    CypherAnalysisError,
    compile_cypher,
)
from project_graphdb_spark.cypher.corrector import correct_directions  # noqa: F401
