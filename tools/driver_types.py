"""Single source of the driver-safe oracle output-type equivalence.

Shared by check_oracle.py (the local stand-in for the driver's typed-hash
compare) and audit_oracle_types.py (the pre-code audit of a new gate's
oracle SQL): the two tools MUST agree on which DuckDB output types are
Spark-exact, or the audit would accept/reject SQL the gate treats
oppositely. Evidence base (r6): signed ints <= 64-bit collapse to one
class driver-side (INTEGER-vs-BIGINT hash-passes), while HUGEINT —
DuckDB's sum(BIGINT) — degrades to float64 in the driver's pandas and
hash-diverges on equal values. Extend ONLY here, with driver evidence.
"""

SIGNED_INTS = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT")

# every type any current oracle emits, driver-proven hash-equal to the
# Spark parquet dump
WHITELIST = set(SIGNED_INTS) | {"DOUBLE", "VARCHAR", "DECIMAL(18,2)"}


def type_class(t):
    """Collapse a DuckDB type name to its driver-hash equivalence class."""
    return "INT<=64" if t in SIGNED_INTS else t
