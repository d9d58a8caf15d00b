import pytest

from graph_loom_spark.graph import PropertyGraph
from graph_loom_spark.interface import CypherSession
from graph_loom_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session: tiny fixtures want few partitions, not 32
    s = get_spark(
        app_name="graph-loom-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture()
def session(spark):
    """Fresh empty graph per test (the reference tests start from an empty
    GraphDatabase)."""
    return CypherSession(PropertyGraph.empty(spark))
