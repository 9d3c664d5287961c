"""Column-level building blocks (pure pyspark.sql.functions expressions —
JVM-side, codegen-friendly; no Python row UDFs)."""
