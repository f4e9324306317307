from project_graphdb_spark.io.tables import TABLE_NAMES, load_table, load_tables  # noqa: F401
