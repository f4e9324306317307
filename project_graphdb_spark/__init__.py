"""project_graphdb_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system ``adishah9038/Project_graphDB`` (a relational → property
graph ETL + NL->Cypher query layer on Neo4j; see SURVEY.md):

* relational ingestion + type normalization (``io``),
* deterministic relational -> property-graph schema inference and graph
  construction as DataFrames (``schema``, ``graph``),
* the analytical query surface the reference's NL->Cypher layer emits,
  expressed as DataFrame/SQL plans Catalyst can optimize (``operators``),
* a Cypher-subset parser/compiler lowering MATCH/WHERE/WITH/RETURN onto
  DataFrames (``cypher``),
* the generate->validate->correct->execute->answer agent lifecycle and
  RCA loop as a deterministic state machine with a pluggable LLM
  (``agent``),
* Structured Streaming operators over event streams (``streaming``),
* large-scale training-data-pipeline operators: dedup (exact/minhash/
  simhash), similarity search, text analysis, multimodal column
  plumbing (``operators``).

Everything executes on Spark DataFrames — there is no custom row-level
execution engine; Catalyst/Tungsten own physical planning.
"""

__version__ = "0.1.0"

from project_graphdb_spark.session import get_spark  # noqa: F401
