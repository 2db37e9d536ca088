#!/usr/bin/env python3
"""Event-stream robustness sweep: copy a testdata SF dir with (1) tied
timestamps (whole users' ts floored to 10-minute boundaries), (2)
negative and zero values, and (3) the PHYSICAL ROW ORDER of events
shuffled by a fixed permutation, so the full gate suite can be re-run
against it:

    python3 tools/events_sweep.py /root/testdata/sf0.01 /tmp/sfev
    sbt "runMain graft.Verify /tmp/sfev /tmp/verify_ev"
    python3 tools/oracle_check.py /tmp/sfev /tmp/verify_ev

Exists because the driver fixture has strictly increasing, distinct
per-user timestamps in insertion order, so a window/sessionize/as-of
gate can silently depend on (a) ts uniqueness for a deterministic
ORDER BY (a tie with no id tie-break is nondeterminism that flips
per-run at cluster scale), (b) all-positive values, or (c) the
accidental physical ordering of the parquet file (never guaranteed
across recomputes/compactions at 100 TB). The oracle reads the SAME
shuffled file, so any divergence is real order-dependence or a tie
convention gap, not fixture noise. Masks/permutation are
deterministic so reruns agree.
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    te = pq.read_table(f"{src}/events.parquet")
    ts_type = te.schema.field("ts").type
    uid = te.column("user_id").to_numpy(zero_copy_only=False)
    eid = te.column("event_id").to_numpy()
    # (1) tie timestamps: users (id mod 11 == 4) get ts floored to
    # 10-minute boundaries -> many exact intra-user ties
    ts_int = pc.cast(te.column("ts"), pa.int64()).to_numpy().copy()
    unit = {"us": 1_000_000, "ns": 1_000_000_000, "ms": 1_000}[ts_type.unit]
    tie_mask = (np.nan_to_num(uid, nan=-1).astype(np.int64) % 11) == 4
    floor_to = 600 * unit
    ts_int[tie_mask] = (ts_int[tie_mask] // floor_to) * floor_to
    n_tied = int(tie_mask.sum())
    # (2) negative / zero values
    val = te.column("value").to_numpy().copy()
    neg_mask = (eid % 41) == 5
    zero_mask = (eid % 43) == 7
    val[neg_mask] = -val[neg_mask]
    val[zero_mask] = 0.0
    te = te.set_column(te.schema.get_field_index("ts"), "ts",
                       pc.cast(pa.array(ts_int), ts_type))
    te = te.set_column(te.schema.get_field_index("value"), "value",
                       pa.array(val, type=pa.float64()))
    # (3) fixed-permutation physical shuffle of the whole file
    rng = np.random.default_rng(20260814)
    perm = rng.permutation(len(eid))
    te = te.take(pa.array(perm))
    pq.write_table(te, f"{dst}/events.parquet")
    print(f"wrote {dst}: tied_ts={n_tied} neg={int(neg_mask.sum())} "
          f"zero={int(zero_mask.sum())} shuffled={len(perm)} rows")

if __name__ == "__main__":
    main()
