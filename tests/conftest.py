import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from cypher_guard_spark.guard import DbSchema  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    """Shared local session for Spark-facing tests (modules may override).

    MODULE scope, not session: several test modules build their own
    session and `.stop()` it at module teardown — with `getOrCreate`
    they all share ONE SparkContext, so a session-scoped fixture here
    would cache a context some other module later kills (the r4
    mid-suite `'NoneType' has no attribute 'sc'` cascade). Per-module
    re-entry is self-healing: `getOrCreate` never returns a stopped
    context, and it's free when the previous module left one alive."""
    from cypher_guard_spark.spark import build_session

    s = build_session(
        "tests",
        cores=4,
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def schema():
    """Verbatim from the reference's test_validation.py:4-50 (FIXTURES.md F3)."""
    return DbSchema.from_dict(
        {
            "node_props": {
                "Person": [
                    {"name": "name", "neo4j_type": "STRING"},
                    {"name": "age", "neo4j_type": "INTEGER"},
                    {"name": "created", "neo4j_type": "BOOLEAN"},
                ],
                "Movie": [
                    {"name": "title", "neo4j_type": "STRING"},
                    {"name": "year", "neo4j_type": "INTEGER"},
                ],
                "Station": [
                    {"name": "name", "neo4j_type": "STRING"},
                    {"name": "location", "neo4j_type": "POINT"},
                ],
                "Stop": [
                    {"name": "departs", "neo4j_type": "STRING"},
                    {"name": "arrives", "neo4j_type": "STRING"},
                ],
            },
            "rel_props": {
                "KNOWS": [{"name": "since", "neo4j_type": "DATE_TIME"}],
                "ACTED_IN": [{"name": "role", "neo4j_type": "STRING"}],
                "CALLS_AT": [],
                "NEXT": [],
                "LINK": [{"name": "distance", "neo4j_type": "FLOAT"}],
            },
            "relationships": [
                {"start": "Person", "end": "Person", "rel_type": "KNOWS"},
                {"start": "Person", "end": "Movie", "rel_type": "ACTED_IN"},
                {"start": "Stop", "end": "Station", "rel_type": "CALLS_AT"},
                {"start": "Stop", "end": "Stop", "rel_type": "NEXT"},
                {"start": "Station", "end": "Station", "rel_type": "LINK"},
            ],
            "metadata": {"index": [], "constraint": []},
        }
    )
