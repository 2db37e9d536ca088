#!/usr/bin/env python3
"""Embedding-robustness sweep: copy a testdata SF dir with degenerate
vectors injected into embeddings.embedding (zero vector, 5x and 1e-3x
scaled norms, exact duplicates of a neighbor), so the full gate suite
can be re-run against it:

    python3 tools/embedding_sweep.py /root/testdata/sf0.01 /tmp/sfemb
    sbt "runMain graft.Verify /tmp/sfemb /tmp/verify_emb"
    python3 tools/oracle_check.py /tmp/sfemb /tmp/verify_emb

Exists because the driver fixture is perfectly unit-normalized, so a
kernel OR an oracle can silently assume dot == cosine, divide by a
zero norm (NaN/Inf convention divergence between engines), or break
top-k ties on a score that is no longer distinct — and stay green
until a real corpus (which always contains zero/degenerate vectors
and exact duplicates) hits it. All mutations stay float32 so both
engines read bit-identical parquet values. Masks are deterministic
(vec_id mod primes) so reruns agree.
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    te = pq.read_table(f"{src}/embeddings.parquet")
    ids = te.column("vec_id").to_numpy()
    emb = te.column("embedding").to_pylist()
    n_zero = n_big = n_tiny = n_dup = 0
    for i in range(len(emb)):
        if emb[i] is None:
            continue
        v = np.asarray(emb[i], dtype=np.float32)
        if ids[i] % 37 == 3:
            v = np.zeros_like(v); n_zero += 1
        elif ids[i] % 41 == 5:
            v = (v * np.float32(5.0)).astype(np.float32); n_big += 1
        elif ids[i] % 43 == 7:
            v = (v * np.float32(1e-3)).astype(np.float32); n_tiny += 1
        elif ids[i] % 29 == 11 and i > 0 and emb[i - 1] is not None:
            v = np.asarray(emb[i - 1], dtype=np.float32); n_dup += 1
        else:
            continue
        emb[i] = v.tolist()
    arr = pa.array(emb, type=pa.list_(pa.float32()))
    te = te.set_column(te.schema.get_field_index("embedding"),
                       "embedding", arr)
    pq.write_table(te, f"{dst}/embeddings.parquet")
    print(f"wrote {dst}: zero={n_zero} big={n_big} tiny={n_tiny} "
          f"dup={n_dup} (of {len(emb)} vectors)")

if __name__ == "__main__":
    main()
