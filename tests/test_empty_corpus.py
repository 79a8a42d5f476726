"""Empty-input robustness sweep over the whole query registry.

The round-5 review found one query (srp_lsh_candidates) that raised
TypeError instead of returning an empty frame when its input table was
empty — ``emb.select("embedding").first()`` returns None on zero rows.
That is a CLASS of bug, not an instance: any query that pulls a
driver-side scalar (a query vector, a corpus total, a trained model)
via ``.head()`` / ``.first()[0]`` has the same failure mode, and at
100 TB an empty slice is an everyday event (a new partition, a
filtered-out day, a cold-start table).

This sweep runs EVERY registered query against a corpus of ten
schema-identical but zero-row tables and asserts it returns a
DataFrame that executes cleanly (zero rows is the expected answer —
the assertion is "no crash, a real plan"). Guards added for the sweep
live next to the scalar pulls in queries.py.
"""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
import pytest

from newscrawl import queries as Q

SF_SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory) -> str:
    """Ten tables with the driver corpus's exact schemas and 0 rows."""
    out = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_SRC}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_survives_empty_corpus(spark, empty_sf_dir, name):
    fn, _sql = Q.QUERIES[name]
    df = fn(spark, empty_sf_dir)
    # executing the plan is the real test: driver-side scalar pulls fire
    # during fn() above, distributed failures fire here
    rows = df.limit(5).collect()
    assert isinstance(rows, list)


def test_empty_fixture_is_actually_empty(spark, empty_sf_dir):
    for t in TABLES:
        assert spark.read.parquet(f"{empty_sf_dir}/{t}.parquet").count() == 0
