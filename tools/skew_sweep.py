#!/usr/bin/env python3
"""Hot-key / skew sweep: copy a testdata SF dir with a Zipf-style key
skew injected — one WHALE user owns ~30% of all events and one WHALE
source owns ~30% of all documents — so the full gate suite re-runs
against the key distribution a real corpus has (one template source,
one bot user) instead of the fixture's near-uniform keys:

    python3 tools/skew_sweep.py /root/testdata/sf0.01 /tmp/sfskew
    sbt "runMain graft.Verify /tmp/sfskew /tmp/verify_skew"
    python3 tools/oracle_check.py /tmp/sfskew /tmp/verify_skew

Injection (deterministic, id-driven — reruns agree):
  - events with event_id % 10 in {0,1,2} get user_id = the smallest
    existing user_id (the whale): ~30% of the stream lands on ONE
    sessionize/window/interval-join/as-of key, so every keyed state
    operator carries a partition-sized hot key.
  - documents with doc_id % 10 in {0,1,2} get source = the
    lexicographically smallest existing source (the whale source):
    ~30% of docs in one stratum for packing, stratified sampling,
    shard manifests, per-source stats, and source-KL.

Exists because the battery's other axes inject VALUE shapes (nulls,
unicode, ties, duplicates) but never KEY skew: the salted-window gates
prove a remedy exists, not that every keyed gate is correct AND
deterministic when one key owns a third of the data. The oracle reads
the SAME skewed fixture, so a divergence is a real tie-break or
order-dependence surfaced by the hot key, not fixture noise. (Wall
time under skew is the salting family's concern — SCALE.md; this
sweep gates CORRECTNESS under skew.)
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    te = pq.read_table(f"{src}/events.parquet")
    eid = te.column("event_id").to_numpy()
    uid_col = te.column("user_id")
    # null-safe (the composed chain runs this AFTER the null sweep) and
    # EXACT: to_pylist keeps ints/None as-is — no float64 round-trip
    # that would corrupt ids above 2^53
    uids = uid_col.to_pylist()
    nonnull = [v for v in uids if v is not None]
    if not nonnull:
        raise SystemExit("skew_sweep: user_id is entirely null — "
                         "no whale key to assign")
    whale_uid = min(nonnull)
    hot = (eid % 10) < 3
    vals = [whale_uid if h else v for h, v in zip(hot, uids)]
    te = te.set_column(te.schema.get_field_index("user_id"), "user_id",
                       pa.array(vals, type=uid_col.type))
    pq.write_table(te, f"{dst}/events.parquet")

    td = pq.read_table(f"{src}/documents.parquet")
    did = td.column("doc_id").to_numpy()
    srccol = td.column("source")
    srcs = srccol.to_pylist()
    nonnull_srcs = [s for s in srcs if s is not None]
    if not nonnull_srcs:
        raise SystemExit("documents.source is entirely null — "
                         "no whale source to pick")
    whale_src = min(nonnull_srcs)
    hot_d = (did % 10) < 3
    srcs = [whale_src if h else s for h, s in zip(hot_d, srcs)]
    td = td.set_column(td.schema.get_field_index("source"), "source",
                       pa.array(srcs, type=srccol.type))
    pq.write_table(td, f"{dst}/documents.parquet")
    print(f"wrote {dst}: whale_user={whale_uid} owns {int(hot.sum())}/"
          f"{len(eid)} events, whale_source='{whale_src}' owns "
          f"{int(hot_d.sum())}/{len(did)} docs")

if __name__ == "__main__":
    main()
