from project_graphdb_spark.schema.relational import (  # noqa: F401
    ForeignKey,
    RelationalSchema,
    TableInfo,
    erd_text,
)
from project_graphdb_spark.schema.graph_schema import (  # noqa: F401
    GraphSchema,
    NodeDef,
    RelationshipDef,
)
from project_graphdb_spark.schema.inference import infer_graph_schema  # noqa: F401
