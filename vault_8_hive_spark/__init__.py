"""vault_8_hive_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first analytics engine exposing the query capability
surface declared in SURVEY.md §2B: batch relational operators (scan, filter,
project, joins incl. semi/anti/range/as-of, aggregation incl. grouping sets,
windows, set-ops, dedup), scalar function families (string/date/math/
conditional/array/map/json/net), Structured Streaming operators, and
LLM-data-pipeline operators (dedup via MinHash/SimHash, embedding similarity,
text analysis) over the reference's domain vocabulary (beacon telemetry
record formats, see SURVEY.md §1; reference: /root/reference, read-only).

Everything is built on public Apache Spark APIs. The execution strategy is
declarative: DataFrame/SQL plans optimized by Catalyst + Tungsten; Python
only at Arrow-batched Pandas-UDF boundaries where built-ins cannot express
the semantics.
"""

__version__ = "0.1.0"
