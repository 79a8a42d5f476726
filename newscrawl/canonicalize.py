"""URL canonicalization + hash keying — native column expressions only.

The reference's seen-set membership is EXACT raw-string equality (no
canonicalization anywhere in the tree: `https://x/a` and `https://x/a/`
are distinct members — ingest/utils.py:7-13). Our engine therefore uses
canonical form ONLY for hashing/sharding (bloom shards, bucket keys,
skew salts), never for membership equality, so fixture parity is
unaffected while equivalent spellings of a url still co-locate.

Canonical form: lowercase scheme+authority, default port stripped,
fragment stripped. Path/query untouched (case-significant per RFC 3986).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_AUTHORITY_RE = r"^((?i)https?://[^/?#]*)"


def canonical_url(col) -> Column:
    """Canonical spelling of a url column (pure JVM expressions)."""
    u = F.col(col) if isinstance(col, str) else col
    no_frag = F.regexp_replace(u, r"#.*$", "")
    auth = F.lower(F.regexp_extract(no_frag, _AUTHORITY_RE, 1))
    auth = F.regexp_replace(auth, r":(80|443)$", "")
    rest = F.regexp_replace(no_frag, _AUTHORITY_RE, "")
    return F.concat(auth, rest)


def canonical_hash(col) -> Column:
    """64-bit shard/bloom key: xxhash64 of the canonical form."""
    return F.xxhash64(canonical_url(col))


def with_url_keys(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append canonical_url + url_hash columns (raw url retained —
    membership joins stay exact on the raw string)."""
    return df.withColumn("canonical_url", canonical_url(url_col)).withColumn(
        "url_hash", canonical_hash(url_col)
    )
