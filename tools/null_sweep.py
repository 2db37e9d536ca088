#!/usr/bin/env python3
"""Null-robustness sweep: copy a testdata SF dir with nulls injected
(documents.text, documents.source, events.user_id), so the full gate
suite can be re-run against it:

    python3 tools/null_sweep.py /root/testdata/sf0.001 /tmp/sfnull
    sbt "runMain graft.Verify /tmp/sfnull /tmp/verify_null"
    python3 tools/oracle_check.py /tmp/sfnull /tmp/verify_null

Exists because fixture columns are never null in the driver's data, so
an oracle can silently encode a null convention Spark doesn't share (a
USING join dropping a null stratum, a CASE turning null into 0) and
stay green until the day a fixture gains one. Round 13 ran this and
fixed 18 such divergences; the suite passes 142/142 on the injected
copy. Masks are deterministic (id mod primes) so reruns agree.
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

def nullify(tbl, col, ids, mod, res):
    mask = pa.array((np.asarray(ids) % mod) == res)
    arr = tbl.column(col).combine_chunks()
    new = pc.if_else(mask, pa.nulls(len(tbl), arr.type), arr)
    return tbl.set_column(tbl.schema.get_field_index(col), col, new)

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    td = pq.read_table(f"{src}/documents.parquet")
    ids = td.column("doc_id").to_numpy()
    td = nullify(td, "text", ids, 37, 3)
    td = nullify(td, "source", ids, 41, 5)
    pq.write_table(td, f"{dst}/documents.parquet")
    te = pq.read_table(f"{src}/events.parquet")
    eids = te.column("event_id").to_numpy()
    te = nullify(te, "user_id", eids, 37, 3)
    pq.write_table(te, f"{dst}/events.parquet")
    print(f"wrote {dst}: null text={td.column('text').null_count}, "
          f"null source={td.column('source').null_count}, "
          f"null user_id={te.column('user_id').null_count}")

if __name__ == "__main__":
    main()
