import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nsdb_spark.session import tuned_builder  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "4")
    # tuned_builder: the shared library defaults (session.py) — codegen
    # fallback at the JIT ceiling, the py4j reflection caches, and
    # dataFrameDebugging off (measured round 9: the per-Column-op
    # call-site capture alone made expression building ~13x slower,
    # dominating the suite's wall time on tiny test frames)
    s = (
        tuned_builder(f"local[{cpus}]", "nsdb-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def engine(spark, tmp_path):
    from nsdb_spark.engine import NsdbEngine

    return NsdbEngine(spark, str(tmp_path / "warehouse"))
