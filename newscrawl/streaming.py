"""Structured Streaming wrapper around the wave runner.

The reference's "streaming" is an external 15-minute systemd timer
driving a batch pipeline (SURVEY.md §2.9 — no watermarks, no event-time
windows; state lives in tables). The batch wave loop (wave.run_crawl)
is therefore the primary execution mode. This module adds the idiomatic
Spark continuous-ingestion variant: watch a directory where page
captures (WARC-extract drops) keep arriving, and run one crawl wave per
micro-batch of newly arrived pages via foreachBatch +
Trigger.AvailableNow.

Exactly-once: foreachBatch may retry a batch after a failure; the wave
commit is atomic and ``run_wave`` is keyed by the catalog's
last-committed wave index, so a retried batch re-runs the SAME wave
index against unchanged state — idempotent by the same argument as
batch resume (tests/test_storage.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from . import extract as ex
from .schema import PAGES
from .storage import ManifestParquetCatalog
from .wave import run_wave


def stream_crawl(
    spark: SparkSession,
    catalog: ManifestParquetCatalog,
    pages_dir: str,
    checkpoint_dir: str,
    min_text_chars: int = ex.MIN_TEXT_CHARS,
    budget: int | None = None,
    max_files_per_trigger: int | None = None,
) -> int:
    """Process all currently-available page files as a sequence of crawl
    waves (one per micro-batch), then stop. Returns waves executed.

    The seed frontier must already be committed (wave.init_crawl).
    """
    reader = spark.readStream.schema(PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(pages_dir)

    n_waves = {"n": 0}

    def handle(batch_df, _epoch_id: int) -> None:
        if not batch_df.head(1):
            return
        wave_index = catalog.last_wave_index() + 1
        run_wave(
            spark,
            catalog,
            batch_df,
            wave_index,
            min_text_chars=min_text_chars,
            budget=budget,
        )
        n_waves["n"] += 1

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", os.path.join(checkpoint_dir, "stream"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_waves["n"]
