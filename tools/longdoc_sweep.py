#!/usr/bin/env python3
"""Long-document robustness sweep: copy a testdata SF dir with a few
documents' text replaced by pathologically LONG synthetic documents
(50k/150k/300k chars vs the fixture's ~550 max), n_chars recomputed,
so the full gate suite can be re-run against it:

    python3 tools/longdoc_sweep.py /root/testdata/sf0.01 /tmp/sflong
    sbt "runMain graft.Verify /tmp/sflong /tmp/verify_long"
    python3 tools/oracle_check.py /tmp/sflong /tmp/verify_long

Exists because every fixture document is tiny, so a per-row text
kernel that is accidentally O(n^2) in document length (the CDC
higher-order-function regression of round 13 was exactly this class),
a per-doc buffer that assumes "documents fit in a line", or an oracle
replay whose SQL explodes quadratically stays green until the first
real-world 1 MB document hits it. The synthetic text is deterministic
(fixed numpy seed), drawn from a small word vocabulary (so
distinct-word-frame operators keep their Zipf shape — word LENGTH
paths are bounded by construction and stressed elsewhere), with
newlines every ~12 words and every 7th line an exact repeat (feeding
the duplicate-line and boilerplate paths).
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB = ("the quick brown fox jumps over lazy dog and then runs far "
         "away with some other words like stream spark engine corpus "
         "token window chunk dedup quality entropy sample").split()

def long_text(rng, n_chars):
    # bulk-draw word indices (scalar rng calls dominate at 10M chars)
    avg = sum(len(w) + 1 for w in VOCAB) / len(VOCAB)
    idx = rng.integers(0, len(VOCAB), size=int(n_chars / avg * 1.2) + 16)
    lines, line = [], []
    total, li, k = 0, 0, 0
    while total < n_chars:
        if k >= len(idx):
            idx = rng.integers(0, len(VOCAB), size=len(idx))
            k = 0
        line.append(VOCAB[idx[k]])
        k += 1
        total += len(line[-1]) + 1
        if len(line) == 12:
            li += 1
            if li % 7 == 0 and lines:
                lines.append(lines[0])  # exact repeated line
            else:
                lines.append(" ".join(line))
            line = []
    if line:
        lines.append(" ".join(line))
    return "\n".join(lines)

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    td = pq.read_table(f"{src}/documents.parquet")
    ids = td.column("doc_id").to_numpy()
    text = td.column("text").to_pylist()
    rng = np.random.default_rng(42)
    # optional CSV of char sizes as argv[3]; default stresses up to 10 MB
    # (real web corpora have multi-MB documents — VERDICT r14 item 1)
    sizes = ([int(x) for x in sys.argv[3].split(",")] if len(sys.argv) > 3
             else [50_000, 150_000, 1_000_000, 3_000_000, 10_000_000])
    # deterministic victims spread across the id range, never doc 0
    victims = [int(ids[(i + 1) * len(ids) // (len(sizes) + 1)])
               for i in range(len(sizes))]
    n_done = 0
    for vid, size in zip(victims, sizes):
        i = int(np.where(ids == vid)[0][0])
        if text[i] is None:
            continue
        text[i] = long_text(rng, size)
        n_done += 1
    arr = pa.array(text, type=pa.string())
    td = td.set_column(td.schema.get_field_index("text"), "text", arr)
    td = td.set_column(td.schema.get_field_index("n_chars"), "n_chars",
                       pc.cast(pc.utf8_length(arr), pa.int64()))
    pq.write_table(td, f"{dst}/documents.parquet")
    tot = sum(len(t) for t in text if t)
    print(f"wrote {dst}: {n_done} long docs at {sizes} chars "
          f"(corpus chars now {tot})")

if __name__ == "__main__":
    main()
