import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from louvain_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "louvain_spark-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.default.parallelism": "8",
        },
    )
    yield s


def edges_df(spark, triples, weighted=True):
    """Build a canonical edge DataFrame from (u, v[, w]) tuples."""
    rows = []
    for t in triples:
        u, v = int(t[0]), int(t[1])
        w = float(t[2]) if weighted and len(t) > 2 else 1.0
        a, b = (u, v) if u <= v else (v, u)
        rows.append((a, b, w))
    return spark.createDataFrame(rows, "src long, dst long, weight double")
