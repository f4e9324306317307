"""Relational schema IR + ERD text rendering.

Parity with the reference's ``schema_info`` dict built from SQLite
``PRAGMA table_info`` / ``PRAGMA foreign_key_list``
(reference: final/erd_text.py:43-47) and its human/LLM-readable ERD text
rendering (reference: final/erd_text.py:52-66). Ours is engine-agnostic:
the same IR can be filled from SQLite PRAGMAs, JDBC metadata, or a
hand-declared catalog (used for the TPC-H-ish test tables).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ForeignKey:
    from_col: str
    table: str  # referenced table
    to_col: str  # referenced column


@dataclass
class TableInfo:
    name: str
    columns: list[tuple[str, str]]  # (name, declared type)
    primary_keys: list[str] = field(default_factory=list)
    foreign_keys: list[ForeignKey] = field(default_factory=list)

    @property
    def column_names(self) -> list[str]:
        return [c for c, _ in self.columns]

    @property
    def fk_columns(self) -> set[str]:
        return {fk.from_col for fk in self.foreign_keys}


@dataclass
class RelationalSchema:
    tables: dict[str, TableInfo]

    def __iter__(self):
        return iter(self.tables.values())


def erd_text(schema: RelationalSchema) -> str:
    """Render the schema as ERD text (the LLM prompt input in the
    reference, final/erd_text.py:52-66)."""
    lines: list[str] = []
    for t in schema:
        lines.append(f"Table: {t.name}")
        for col, typ in t.columns:
            tags = []
            if col in t.primary_keys:
                tags.append("PK")
            for fk in t.foreign_keys:
                if fk.from_col == col:
                    tags.append(f"FK -> {fk.table}.{fk.to_col}")
            suffix = f" [{', '.join(tags)}]" if tags else ""
            lines.append(f"  - {col}: {typ}{suffix}")
        lines.append("")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# Hand-declared catalog for the driver's TPC-H-ish test tables. This plays
# the role of SQLite PRAGMA introspection for the synthetic parquet data.
# ---------------------------------------------------------------------------

TPCH_SCHEMA = RelationalSchema(
    tables={
        "region": TableInfo(
            "region",
            [("r_regionkey", "BIGINT"), ("r_name", "TEXT")],
            primary_keys=["r_regionkey"],
        ),
        "nation": TableInfo(
            "nation",
            [("n_nationkey", "BIGINT"), ("n_name", "TEXT"), ("n_regionkey", "BIGINT")],
            primary_keys=["n_nationkey"],
            foreign_keys=[ForeignKey("n_regionkey", "region", "r_regionkey")],
        ),
        "customer": TableInfo(
            "customer",
            [
                ("c_custkey", "BIGINT"),
                ("c_name", "TEXT"),
                ("c_nationkey", "BIGINT"),
                ("c_acctbal", "DOUBLE"),
                ("c_mktsegment", "TEXT"),
            ],
            primary_keys=["c_custkey"],
            foreign_keys=[ForeignKey("c_nationkey", "nation", "n_nationkey")],
        ),
        "supplier": TableInfo(
            "supplier",
            [
                ("s_suppkey", "BIGINT"),
                ("s_name", "TEXT"),
                ("s_nationkey", "BIGINT"),
                ("s_acctbal", "DOUBLE"),
            ],
            primary_keys=["s_suppkey"],
            foreign_keys=[ForeignKey("s_nationkey", "nation", "n_nationkey")],
        ),
        "part": TableInfo(
            "part",
            [
                ("p_partkey", "BIGINT"),
                ("p_name", "TEXT"),
                ("p_brand", "TEXT"),
                ("p_type", "TEXT"),
                ("p_size", "BIGINT"),
                ("p_retailprice", "DOUBLE"),
            ],
            primary_keys=["p_partkey"],
        ),
        "orders": TableInfo(
            "orders",
            [
                ("o_orderkey", "BIGINT"),
                ("o_custkey", "BIGINT"),
                ("o_orderstatus", "TEXT"),
                ("o_totalprice", "DOUBLE"),
                ("o_orderdate", "TIMESTAMP"),
                ("o_orderpriority", "TEXT"),
            ],
            primary_keys=["o_orderkey"],
            foreign_keys=[ForeignKey("o_custkey", "customer", "c_custkey")],
        ),
        "lineitem": TableInfo(
            "lineitem",
            [
                ("l_orderkey", "BIGINT"),
                ("l_partkey", "BIGINT"),
                ("l_suppkey", "BIGINT"),
                ("l_linenumber", "BIGINT"),
                ("l_quantity", "DOUBLE"),
                ("l_extendedprice", "DOUBLE"),
                ("l_discount", "DOUBLE"),
                ("l_tax", "DOUBLE"),
                ("l_returnflag", "TEXT"),
                ("l_linestatus", "TEXT"),
                ("l_shipdate", "TIMESTAMP"),
            ],
            primary_keys=["l_orderkey", "l_linenumber"],
            foreign_keys=[
                ForeignKey("l_orderkey", "orders", "o_orderkey"),
                ForeignKey("l_partkey", "part", "p_partkey"),
                ForeignKey("l_suppkey", "supplier", "s_suppkey"),
            ],
        ),
    }
)
