#!/usr/bin/env python3
"""Deterministic 10x synthesis of the sf0.1 testdata for the scale probe.

Writes <out>/{events,documents}.parquet at 10x rows (copy 0 = the
original data) and copies every other table unchanged, so Catalog.forDir
reads the directory like a normal sf dir. Design choices:

- events: copy k shifts event_id by k*N, ts by k*37 seconds (stays within
  the 30-day range; grows the distinct-second count ~linearly), rotates
  user_id by k*7 within the observed id space, keeps event_type/value —
  per-type series get ~10x the samples, like a 10x-traffic deployment.
- documents: copy k>0 splices the word-level first half of doc i with the
  second half of doc i+1 (same copy), so synthetic rows share ~half their
  shingles with each parent — below near-dup thresholds. The planted
  near-dup pairs of the original corpus survive exactly once; the corpus
  grows 10x while the pair set stays ~constant, which measures the
  corpus-side scans/shuffles without a quadratic duplicate blowup.
- ts stays timestamp[ns] (pyarrow), matching the driver's parquet
  TIMESTAMP(NANOS) that Catalog.forDir reads via nanosAsLong.

Usage: python3 scripts/make_scale10.py [srcDir] [outDir] [factor]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIED = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]


def scale_events(src, out, factor):
    t = pq.read_table(src / "events.parquet")
    n = t.num_rows
    uid = t.column("user_id").to_pylist()
    umin, umax = min(uid), max(uid)
    uspan = umax - umin + 1
    parts = []
    for k in range(factor):
        c = t
        c = c.set_column(c.schema.get_field_index("event_id"), "event_id",
                         pc.add(c.column("event_id"), k * n))
        shifted = pc.add(c.column("ts"),
                         pa.scalar(k * 37_000_000_000, pa.duration("ns")))
        c = c.set_column(c.schema.get_field_index("ts"), "ts",
                         shifted.cast(pa.timestamp("ns")))
        rotated = pa.array(
            [(u - umin + k * 7) % uspan + umin for u in uid], pa.int64())
        c = c.set_column(c.schema.get_field_index("user_id"), "user_id",
                         rotated)
        parts.append(c)
    merged = pa.concat_tables(parts)
    pq.write_table(merged, out / "events.parquet")
    print(f"events: {n} -> {merged.num_rows}")


def scale_documents(src, out, factor):
    t = pq.read_table(src / "documents.parquet")
    n = t.num_rows
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    rows_id, rows_text, rows_lang, rows_src, rows_nc = [], [], [], [], []
    for k in range(factor):
        for i in range(n):
            if k == 0:
                txt = texts[i]
            else:
                a = texts[i].split(" ")
                b = texts[(i + 1) % n].split(" ")
                txt = " ".join(a[: len(a) // 2] + b[len(b) // 2:])
            rows_id.append(k * n + i)
            rows_text.append(txt)
            rows_lang.append(langs[i])
            rows_src.append(sources[i])
            rows_nc.append(len(txt))
    merged = pa.table({
        "doc_id": pa.array(rows_id, pa.int64()),
        "text": pa.array(rows_text, pa.string()),
        "lang": pa.array(rows_lang, pa.string()),
        "source": pa.array(rows_src, pa.string()),
        "n_chars": pa.array(rows_nc, pa.int64()),
    })
    pq.write_table(merged, out / "documents.parquet")
    print(f"documents: {n} -> {merged.num_rows}")


def scale_embeddings(src, out, factor):
    """Mirror of the documents synthesis for vectors: copy k > 0 of
    vec i concatenates the first half of vec i with the second half of
    vec i+1 — INDEPENDENT of k, so every copy is byte-identical and the
    corpus carries n cliques of (factor-1) identical vectors each (the
    duplicated-embedding shape a re-crawled page's encoder emits —
    IVF cell skew's analogue of the exact-dup text cliques). The child
    shares ~half its mass with each parent (cosine ~0.5 on these
    vectors), safely below near-dup thresholds."""
    t = pq.read_table(src / "embeddings.parquet")
    n = t.num_rows
    vecs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    dim = len(vecs[0])
    rows_id, rows_vec, rows_lab = [], [], []
    for k in range(factor):
        for i in range(n):
            if k == 0:
                v = vecs[i]
            else:
                v = vecs[i][: dim // 2] + vecs[(i + 1) % n][dim // 2:]
            rows_id.append(k * n + i)
            rows_vec.append(v)
            rows_lab.append(labels[i])
    merged = pa.table({
        "vec_id": pa.array(rows_id, pa.int64()),
        "embedding": pa.array(rows_vec, pa.list_(pa.float32())),
        "label": pa.array(rows_lab, pa.int32()),
    })
    pq.write_table(merged, out / "embeddings.parquet")
    print(f"embeddings: {n} -> {merged.num_rows}")


def main():
    src = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_scale10")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out.mkdir(parents=True, exist_ok=True)
    for name in COPIED:
        shutil.copyfile(src / f"{name}.parquet", out / f"{name}.parquet")
    scale_events(src, out, factor)
    scale_documents(src, out, factor)
    scale_embeddings(src, out, factor)


if __name__ == "__main__":
    main()
