#!/usr/bin/env python3
"""Skewed-key overlay for the trace/session + text-stats scale probes.

Copies every table of a source scale dir and plants the two skew shapes a
balanced synthesis (make_scale10.py rotates user ids, splices docs) can
never produce, so the per-key paths get probed where they would actually
hurt at 100 TB:

- events: ONE hot user (id 10_000_000) with `--spans` events (default
  100_000) at a 20 s cadence from the observed min ts — gap < 1800 s
  throughout, so sessionize folds them into a single ~23-day session and
  every per-user path (window sort, funnel array scan) sees one key
  carrying 1e5 rows. The event_type cycles view/click/purchase/error so
  the funnel and SLO paths both traverse the hot key.
- documents: ONE pathological doc (doc_id 10_000_000) of `--tokens`
  words (default 200_000, ~40x the p99) — the per-doc explode paths
  (tf-idf, BM25 dl, perplexity grams, DSIR) get a single fat row.

Usage: python3 scripts/make_skew.py <srcDir> <outDir> [spans] [tokens]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

COPIED = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings"]

HOT_ID = 10_000_000


def skew_events(src, out, spans):
    import datetime

    import pyarrow.compute as pc

    t = pq.read_table(src / "events.parquet")
    t0 = pc.min(t.column("ts")).as_py()
    ncols = t.schema.names
    base_id = pc.max(t.column("event_id")).as_py() + 1
    etypes = ["view", "click", "purchase", "error"]
    rows = {
        "event_id": pa.array([base_id + i for i in range(spans)],
                             t.schema.field("event_id").type),
        "ts": pa.array(
            [t0 + datetime.timedelta(seconds=20 * i)
             for i in range(spans)]).cast(t.schema.field("ts").type),
        "user_id": pa.array([HOT_ID] * spans,
                            t.schema.field("user_id").type),
        "event_type": pa.array([etypes[i % 4] for i in range(spans)],
                               t.schema.field("event_type").type),
    }
    arrays = []
    for name in ncols:
        if name in rows:
            arrays.append(rows[name])
        else:
            col = t.column(name)
            # repeat the first value — the skew shape is keys, not values
            arrays.append(pa.array([col[0].as_py()] * spans,
                                   t.schema.field(name).type))
    hot = pa.table(dict(zip(ncols, arrays)))
    pq.write_table(pa.concat_tables([t, hot]), out / "events.parquet")
    print(f"events: {t.num_rows} + hot {spans}")


def skew_documents(src, out, tokens):
    t = pq.read_table(src / "documents.parquet")
    ncols = t.schema.names
    text = " ".join(f"tok{i % 5000}" for i in range(tokens))
    arrays = []
    for name in ncols:
        if name == "doc_id":
            arrays.append(pa.array([HOT_ID],
                                   t.schema.field("doc_id").type))
        elif name == "text":
            arrays.append(pa.array([text], t.schema.field("text").type))
        else:
            arrays.append(pa.array([t.column(name)[0].as_py()],
                                   t.schema.field(name).type))
    hot = pa.table(dict(zip(ncols, arrays)))
    pq.write_table(pa.concat_tables([t, hot]), out / "documents.parquet")
    print(f"documents: {t.num_rows} + 1 doc of {tokens} tokens")


def main():
    src = Path(sys.argv[1])
    out = Path(sys.argv[2])
    spans = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    tokens = int(sys.argv[4]) if len(sys.argv) > 4 else 200_000
    out.mkdir(parents=True, exist_ok=True)
    for name in COPIED:
        p = src / f"{name}.parquet"
        if p.exists():
            shutil.copy(p, out / f"{name}.parquet")
    skew_events(src, out, spans)
    skew_documents(src, out, tokens)


if __name__ == "__main__":
    main()
