"""Atomic commit, resume-from-checkpoint, idempotent replay, lineage."""

from __future__ import annotations

import json
import os

from newscrawl import reference_oracle as ro
from newscrawl import synth, wave
from newscrawl.schema import SEEN
from newscrawl.storage import ManifestParquetCatalog

CFG = synth.SynthConfig()


def test_resume_from_checkpoint_is_byte_identical(spark, tmp_path):
    """Run 3 waves straight vs run 2, 'crash', resume -> identical state."""
    cat_a = ManifestParquetCatalog(str(tmp_path / "a"))
    wave.run_crawl(spark, cat_a, CFG, n_waves=3)

    cat_b = ManifestParquetCatalog(str(tmp_path / "b"))
    wave.run_crawl(spark, cat_b, CFG, n_waves=2)
    # simulate process death + restart: a fresh catalog object over the same root
    cat_b2 = ManifestParquetCatalog(str(tmp_path / "b"))
    assert cat_b2.last_wave_index() == 1
    wave.run_crawl(spark, cat_b2, CFG, n_waves=3)

    assert wave.crawl_order(spark, cat_a) == wave.crawl_order(spark, cat_b2)
    arts = lambda c: sorted(
        (r.url, r.wave_id, r.text) for r in wave.read_articles(spark, c).collect()
    )
    assert arts(cat_a) == arts(cat_b2)


def test_replay_committed_wave_is_noop(spark, tmp_path):
    cat = ManifestParquetCatalog(str(tmp_path / "c"))
    wave.run_crawl(spark, cat, CFG, n_waves=2)
    before = wave.crawl_order(spark, cat)
    snap_before = cat.current_snapshot()["snapshot_id"]
    # asking for the same horizon again must do nothing
    out = wave.run_crawl(spark, cat, CFG, n_waves=2)
    assert out == []
    assert cat.current_snapshot()["snapshot_id"] == snap_before
    assert wave.crawl_order(spark, cat) == before


def test_uncommitted_write_invisible(spark, tmp_path):
    cat = ManifestParquetCatalog(str(tmp_path / "d"))
    wave.run_crawl(spark, cat, CFG, n_waves=1)
    seen_before = wave.read_seen(spark, cat).count()
    # stage a write but never commit (the crash-mid-wave case)
    commit = cat.begin()
    extra = spark.createDataFrame([("https://x/y-1", 1, "w9", "w9", True, None)], schema=SEEN)
    commit.write("seen", extra, mode="append")
    # no commit() -> state unchanged
    assert wave.read_seen(spark, cat).count() == seen_before


def test_lineage_recorded(spark, tmp_path):
    cat = ManifestParquetCatalog(str(tmp_path / "e"))
    wave.run_crawl(spark, cat, CFG, n_waves=1)
    snap = cat.current_snapshot()
    assert snap["wave_id"] == "w0000" and snap["parent_snapshot_id"] == 0
    seen_files = snap["tables"]["seen"]["files"]
    assert seen_files
    for f in seen_files:
        assert os.path.exists(f["path"]) and f["bytes"] > 0
        if f["rows"]:
            assert f["min_url_hash"] <= f["max_url_hash"]
    # metrics embedded in the snapshot
    assert snap["metrics"]["n_yielded"] > 0
    # snapshot chain intact on disk
    snaps = sorted(os.listdir(os.path.join(str(tmp_path / "e"), "snapshots")))
    assert len(snaps) == 2  # init + wave 0
    with open(os.path.join(str(tmp_path / "e"), "snapshots", snaps[0])) as fh:
        assert json.load(fh)["wave_id"] == "init"


def test_oracle_parity_after_resume(spark, tmp_path):
    cat = ManifestParquetCatalog(str(tmp_path / "f"))
    wave.run_crawl(spark, cat, CFG, n_waves=1)
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    oracle = ro.run_oracle(CFG, n_waves=3)
    assert wave.crawl_order(spark, cat) == [
        (w.wave_id, u) for w in oracle.waves for u in w.crawl_order
    ]


def test_time_travel_read(spark, tmp_path):
    """Reading at a historical snapshot returns exactly that wave's
    state (data files immutable, manifests keep every version)."""
    cat = ManifestParquetCatalog(str(tmp_path / "tt"))
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    ids = cat.snapshot_ids()
    assert len(ids) == 4  # init + 3 waves
    # per-snapshot article sets grow monotonically and match wave ids
    prev: set = set()
    for sid in ids:
        snap = cat.snapshot(sid)
        arts = {
            (r.url, r.wave_id)
            for r in cat.read(
                spark, "articles", wave.ARTICLES, snapshot_id=sid
            ).collect()
        }
        assert prev <= arts
        max_wave = max((w for _u, w in arts), default="w0000")
        assert max_wave <= wave.wave_id_for(max(snap["wave_index"], 0))
        prev = arts
    # the wave-1 snapshot must contain NO wave-2 articles
    mid = cat.snapshot(ids[-2])
    mid_arts = cat.read(spark, "articles", wave.ARTICLES, snapshot_id=ids[-2])
    assert mid_arts.filter(mid_arts.wave_id == "w0002").count() == 0


def test_rollback_then_rerun_is_identical(spark, tmp_path):
    """Iceberg rollback semantics: roll back to the post-wave-0 snapshot,
    re-run the remaining waves, and land byte-identically where the
    original run did (determinism + snapshot isolation)."""
    cat = ManifestParquetCatalog(str(tmp_path / "rb"))
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    want_order = wave.crawl_order(spark, cat)
    want_arts = sorted(
        (r.url, r.wave_id, r.fingerprint, r.topic)
        for r in wave.read_articles(spark, cat).collect()
    )
    post_w0 = cat.snapshot_ids()[1]  # init is [0], wave 0 is [1]
    snap = cat.rollback(post_w0)
    assert snap["wave_index"] == 0
    assert cat.last_wave_index() == 0
    # state is exactly wave-0's
    assert wave.read_articles(spark, cat).filter("wave_id > 'w0000'").count() == 0
    # resume re-runs waves 1..2 deterministically
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    assert wave.crawl_order(spark, cat) == want_order
    got_arts = sorted(
        (r.url, r.wave_id, r.fingerprint, r.topic)
        for r in wave.read_articles(spark, cat).collect()
    )
    assert got_arts == want_arts


def test_expire_snapshots(spark, tmp_path):
    """Maintenance: expiry drops old snapshots and their orphan files,
    never anything a retained snapshot references."""
    cat = ManifestParquetCatalog(str(tmp_path / "exp"))
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    before = wave.crawl_order(spark, cat)
    all_ids = cat.snapshot_ids()
    res = cat.expire_snapshots(keep_last=2)
    assert res["snapshots_removed"] == len(all_ids) - 2
    assert res["files_removed"] > 0
    assert cat.snapshot_ids() == all_ids[-2:]
    # live state untouched, byte-identical
    assert wave.crawl_order(spark, cat) == before
    # retained time travel still works
    old = cat.read(
        spark, "articles", wave.ARTICLES, snapshot_id=all_ids[-2]
    )
    assert old.count() > 0
    # idempotent
    assert cat.expire_snapshots(keep_last=2)["snapshots_removed"] == 0


def test_schema_evolution_reads_old_tables(spark, tmp_path):
    """A catalog written under an OLDER articles schema (round-1: no
    classify columns) must stay readable under the current schema —
    added columns surface as nulls (parquet + explicit read schema)."""
    from pyspark.sql import types as T

    old_fields = [f for f in wave.ARTICLES.fields if f.name not in (
        "summary", "topic", "sentiment_label", "sentiment_score",
        "locations", "organizations", "persons", "sample", "is_cleaned",
    )]
    old_schema = T.StructType(old_fields)
    cat = ManifestParquetCatalog(str(tmp_path / "evo"))
    commit = cat.begin()
    row = tuple(
        {"url": "https://x.example.com/a", "source": "bbc", "wave_id": "w0000",
         "n_chars": 5}.get(f.name)
        for f in old_fields
    )
    commit.write("articles", spark.createDataFrame([row], schema=old_schema))
    commit.commit(wave_id="w0000", wave_index=0)
    got = cat.read(spark, "articles", wave.ARTICLES).collect()
    assert len(got) == 1
    assert got[0].url == "https://x.example.com/a"
    assert got[0].topic is None and got[0].locations is None


def test_files_added_by_wave_lineage(spark, tmp_path):
    """Lineage diff: each wave's added seen files, resolved on the LIVE
    ancestry (a rolled-back wave index must resolve to the new branch)."""
    cat = ManifestParquetCatalog(str(tmp_path / "lin"))
    wave.run_crawl(spark, cat, CFG, n_waves=2)
    f0 = cat.files_added_by_wave("seen", 0)
    f1 = cat.files_added_by_wave("seen", 1)
    assert f0 and f1 and not (set(f0) & set(f1))
    rows0 = spark.read.parquet(*f0).count()
    rows1 = spark.read.parquet(*f1).count()
    per_wave = {
        r.processed_wave: r.cnt
        for r in wave.read_seen(spark, cat)
        .groupBy("processed_wave")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert rows0 == per_wave["w0000"] and rows1 == per_wave["w0001"]
    post_w0 = cat.snapshot_ids()[1]
    cat.rollback(post_w0)
    wave.run_crawl(spark, cat, CFG, n_waves=2)
    f1b = cat.files_added_by_wave("seen", 1)
    assert f1b and spark.read.parquet(*f1b).count() == per_wave["w0001"]


def test_compact_rewrites_small_files(spark, tmp_path):
    """Compaction (RewriteDataFiles analog): rows byte-identical, file
    count collapses, wave index preserved, time travel to the
    pre-compaction layout still works, and resume after compaction is
    a no-op (maintenance is not state change)."""
    cat = ManifestParquetCatalog(str(tmp_path / "cp"))
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    want = sorted(
        (r.url, r.wave_id, r.fingerprint)
        for r in wave.read_articles(spark, cat).collect()
    )
    pre_ids = cat.snapshot_ids()
    pre_files = cat.table_files("articles")
    assert len(pre_files) > 1  # append-per-wave accreted several files
    # lineage BEFORE compaction: each wave's own delta
    pre_lineage = {i: cat.files_added_by_wave("articles", i) for i in range(3)}
    res = cat.compact(spark, "articles", wave.ARTICLES)
    assert res["files_rewritten"] == len(pre_files)
    assert res["files_written"] < len(pre_files)
    # ADVICE r3: the maintenance snapshot reuses wave_index=2, but the
    # lineage query must skip it and still resolve wave 2 to its own
    # delta, not the compaction's rewritten multi-wave file set
    assert cat.files_added_by_wave("articles", 2) == pre_lineage[2]
    for i in range(3):
        assert cat.files_added_by_wave("articles", i) == pre_lineage[i]
    # live rows identical, layout collapsed
    got = sorted(
        (r.url, r.wave_id, r.fingerprint)
        for r in wave.read_articles(spark, cat).collect()
    )
    assert got == want
    assert len(cat.table_files("articles")) == res["files_written"]
    # maintenance snapshot: wave index unchanged -> resume is a no-op
    snap = cat.current_snapshot()
    assert snap["wave_index"] == 2
    assert snap["metrics"]["maintenance"] == "compact"
    assert wave.run_crawl(spark, cat, CFG, n_waves=3) == []
    # time travel to the pre-compaction snapshot reads the OLD files
    assert cat.table_files("articles", snapshot_id=pre_ids[-1]) == pre_files
    old = cat.read(spark, "articles", wave.ARTICLES, snapshot_id=pre_ids[-1])
    assert sorted(
        (r.url, r.wave_id, r.fingerprint) for r in old.collect()
    ) == want
    # a second compaction finds nothing to do at a huge small-file bound?
    # no — everything is still "small" at the default threshold, but a
    # single already-compacted file is left alone
    if len(cat.table_files("articles")) == 1:
        res2 = cat.compact(spark, "articles", wave.ARTICLES)
        assert res2["files_rewritten"] == 0
    # expiry then reclaims the rewritten-away originals
    res3 = cat.expire_snapshots(keep_last=1)
    assert res3["files_removed"] > 0
    assert wave.crawl_order(spark, cat) is not None
    got2 = sorted(
        (r.url, r.wave_id, r.fingerprint)
        for r in wave.read_articles(spark, cat).collect()
    )
    assert got2 == want


def test_tags_pin_snapshots_and_survive_expiry(spark, tmp_path):
    """Iceberg tag semantics: a tag is a durable named ref — tagged
    snapshots survive expire_snapshots, reads resolve by tag, and
    dropping the tag releases the snapshot for expiry."""
    cat = ManifestParquetCatalog(str(tmp_path / "tags"))
    wave.run_crawl(spark, cat, CFG, n_waves=3)
    ids = cat.snapshot_ids()
    first_commit = ids[1]  # ids[0] is the init snapshot
    want = sorted(
        (r.url, r.wave_id)
        for r in cat.read(
            spark, "articles", wave.ARTICLES, snapshot_id=first_commit
        ).collect()
    )
    assert cat.tag("after-wave-0", first_commit) == first_commit
    assert cat.resolve_tag("after-wave-0") == first_commit
    # expiry keeps the tagged snapshot even though keep_last=1
    res = cat.expire_snapshots(keep_last=1)
    assert res["snapshots_removed"] > 0
    assert first_commit in cat.snapshot_ids()
    got = sorted(
        (r.url, r.wave_id)
        for r in cat.read(
            spark, "articles", wave.ARTICLES, tag="after-wave-0"
        ).collect()
    )
    assert got == want
    # drop the tag -> the snapshot becomes expirable
    cat.drop_tag("after-wave-0")
    cat.expire_snapshots(keep_last=1)
    assert first_commit not in cat.snapshot_ids()
