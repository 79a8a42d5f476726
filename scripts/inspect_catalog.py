#!/usr/bin/env python
"""Operator tool: inspect a crawl catalog's snapshots, lineage, metrics.

    python scripts/inspect_catalog.py --catalog /data/crawl_state [--snapshot N]

Prints one JSON line per snapshot: wave id/index, per-table file counts,
rows, bytes, url_hash ranges (the per-partition lineage), and the wave's
metrics — everything needed to audit or resume a crawl without touching
Spark. Pure stdlib; reads only manifest JSON.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

from newscrawl.storage import ManifestParquetCatalog  # noqa: E402


def describe(snap: dict, verbose: bool) -> dict:
    tables = {}
    for name, t in snap["tables"].items():
        files = t.get("files", [])
        entry = {
            "files": len(files),
            "rows": t.get("rows", 0),
            "bytes": sum(f.get("bytes", 0) for f in files),
        }
        hash_lo = [f["min_url_hash"] for f in files if "min_url_hash" in f]
        hash_hi = [f["max_url_hash"] for f in files if "max_url_hash" in f]
        if hash_lo:
            entry["url_hash_range"] = [min(hash_lo), max(hash_hi)]
        if verbose:
            entry["file_manifest"] = files
        tables[name] = entry
    return {
        "snapshot_id": snap["snapshot_id"],
        "parent": snap.get("parent_snapshot_id"),
        "wave_id": snap.get("wave_id"),
        "wave_index": snap.get("wave_index"),
        "committed_at": snap.get("committed_at"),
        "metrics": snap.get("metrics", {}),
        "tables": tables,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--snapshot", type=int, default=None, help="one snapshot id")
    ap.add_argument("--verbose", action="store_true", help="include per-file manifests")
    args = ap.parse_args()

    cat = ManifestParquetCatalog(args.catalog)
    ids = [args.snapshot] if args.snapshot is not None else cat.snapshot_ids()
    cur = cat.current_snapshot()
    cur_id = None if cur is None else cur["snapshot_id"]
    for sid in ids:
        d = describe(cat.snapshot(sid), args.verbose)
        d["is_current"] = sid == cur_id
        print(json.dumps(d))


if __name__ == "__main__":
    main()
