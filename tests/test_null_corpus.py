"""All-NULL-row robustness sweep over the whole query registry.

The empty-corpus sweep (test_empty_corpus.py) covers zero-row inputs;
this one covers the other degenerate shape a 100 TB lake serves daily:
rows that EXIST but whose nullable fields are all NULL (a half-written
partition, a schema-evolved file where new columns backfill as NULL, a
source that emits keys before payloads).  JVM-side null semantics
mostly propagate harmlessly — the crashes live where a query pulls a
driver-side scalar out of a row it assumed was populated, or does
Python arithmetic on a value that came back None.

Every registered query runs against ten single-row tables whose every
field is NULL and must return an executable DataFrame (content is
unspecified — the assertion is "no crash, a real plan").
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from newscrawl import queries as Q

SF_SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory) -> str:
    """Ten tables with the driver corpus's exact schemas and ONE row
    per table, every field NULL."""
    out = tmp_path_factory.mktemp("null_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_SRC}/{t}.parquet")
        cols = [pa.array([None], type=f.type) for f in schema]
        pq.write_table(
            pa.table(cols, schema=pa.schema([(f.name, f.type) for f in schema])),
            str(out / f"{t}.parquet"),
        )
    return str(out)


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_survives_null_rows(spark, null_sf_dir, name):
    fn, _sql = Q.QUERIES[name]
    df = fn(spark, null_sf_dir)
    rows = df.limit(5).collect()
    assert isinstance(rows, list)


def test_null_fixture_shape(spark, null_sf_dir):
    for t in TABLES:
        df = spark.read.parquet(f"{null_sf_dir}/{t}.parquet")
        assert df.count() == 1
        row = df.head()
        assert all(v is None for v in row.asDict().values())
