"""Cross-engine result-type discipline (the driver-hash contract).

The driver's correctness hash is TYPED: it fetches the DuckDB oracle
result through Arrow/pandas and hashes the fetched representation, so an
oracle column that comes back HUGEINT (int128) or DECIMAL(precision>18)
silently changes representation (it collapses to float64 in a pandas
fetch) even when every VALUE equals the Spark side — the exact bug class
behind CORRECTNESS_r04's three red rows (uncast ``SUM(int)`` → HUGEINT;
``DECIMAL(38,0)`` checksum).  Python-level value comparison can never
catch this (``1 == 1.0`` and ``Decimal(1) == 1`` are both true), so the
tripwire has to be at the TYPE level.

These helpers classify both engines' result column types into comparable
"kinds" and flag oracle types that cannot round-trip a pandas fetch
losslessly.  Used by ``tools/check_queries.py``, ``tools/drive_entry.py``
and the permanent ``tests/test_oracle_parity.py`` audit.

House discipline for every registered query (docs/DRIVER_CONTRACT.md):
- integer aggregates: ``CAST(SUM(...) AS BIGINT)`` in the oracle (DuckDB
  SUM over integers returns HUGEINT otherwise);
- doubles: ``ROUND(x, 6)`` on both sides before emission;
- values that may exceed int64 (checksums): emit VARCHAR on both sides;
- arrays: emit comma-joined strings on both sides (the driver compare
  cannot hash list cells);
- window ranks / bucket indexes: cast to INT on whichever side differs.
"""

from __future__ import annotations


def spark_kind(simple: str) -> str:
    """Kind class of a Spark result column from its ``simpleString`` type."""
    s = simple.lower()
    if s in ("tinyint", "smallint", "int", "bigint", "long", "integer", "short", "byte"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("string", "varchar"):
        return "string"
    if s == "boolean":
        return "bool"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "binary":
        return "binary"
    for prefix in ("array", "map", "struct"):
        if s.startswith(prefix):
            return prefix
    return s


def arrow_kind(t) -> str:
    """Kind class of a DuckDB result column from its Arrow type."""
    import pyarrow as pa

    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "array"
    if pa.types.is_map(t):
        return "map"
    if pa.types.is_struct(t):
        return "struct"
    return str(t)


def audit_arrow_schema(schema) -> list:
    """Names+types of oracle result columns that cannot round-trip a
    pandas fetch losslessly: >64-bit integers (DuckDB HUGEINT arrives as
    Arrow decimal128(38,0) or int128) and decimals with precision > 18
    (collapse to float64 in DuckDB's pandas conversion)."""
    import pyarrow as pa

    bad = []
    for f in schema:
        t = f.type
        if pa.types.is_decimal(t) and t.precision > 18:
            bad.append(f"{f.name}: {t}")
        elif pa.types.is_integer(t) and t.bit_width > 64:
            bad.append(f"{f.name}: {t}")
    return bad


def kind_mismatches(spark_schema, arrow_schema) -> list:
    """Per-column kind disagreements between a Spark result schema and the
    oracle's Arrow result schema (matched by column name)."""
    sk = {f.name: spark_kind(f.dataType.simpleString()) for f in spark_schema.fields}
    out = []
    for f in arrow_schema:
        if f.name not in sk:
            continue
        dk = arrow_kind(f.type)
        if dk != sk[f.name]:
            out.append(f"{f.name}: spark={sk[f.name]} duck={dk} ({f.type})")
    return out
