#!/usr/bin/env python
"""(Re)generate the committed golden fixtures under tests/golden/.

Currently one fixture: the articles table of the driver-contract
end-to-end crawl (__spark_entry__._crawl_wave_articles runs the engine
with the SAME SynthConfig; the driver's DuckDB oracle reads this file).
Re-run after any change to newscrawl/synth.py or newscrawl/extract.py;
tests/test_entry.py fails if the committed file is stale.
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

sys.path.insert(0, ".")

from newscrawl import reference_oracle as ro, synth  # noqa: E402

ENTRY_CFG = dict(n_seed=2, n_total=12, n_waves=2)
OUT = "tests/golden/crawl_wave_articles.parquet"


def main() -> None:
    table = ro.golden_wave_articles_table(synth.SynthConfig(**ENTRY_CFG))
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {table.num_rows} rows x {table.num_columns} cols")


if __name__ == "__main__":
    main()
