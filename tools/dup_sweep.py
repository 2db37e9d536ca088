#!/usr/bin/env python3
"""Duplicate-heavy sweep: copy a testdata SF dir with heavy EXACT and
NEAR duplication injected into documents.text (and exact duplicates
into embeddings.embedding), so the full gate suite re-runs against a
corpus where dedup actually has work to do and tie-breaks on equal
values actually fire:

    python3 tools/dup_sweep.py /root/testdata/sf0.01 /tmp/sfdup
    sbt "runMain graft.Verify /tmp/sfdup /tmp/verify_dup"
    python3 tools/oracle_check.py /tmp/sfdup /tmp/verify_dup

Injection (deterministic, id-driven — reruns agree):
  - docs with doc_id % 5 == 1 become EXACT copies of their 20-block
    master (doc_id - doc_id % 20): multi-member exact-dup clusters of
    varying size, md5/fingerprint ties, keep-min-id paths exercised.
  - docs with doc_id % 7 == 2 (and not already exact copies) become
    NEAR copies: the master's text plus one unique trailing token —
    high-Jaccard/minhash/simhash pairs and shingle-tie surfaces.
  - embeddings with vec_id % 6 == 3 become exact copies of their
    6-block master vector: cosine == 1 ties in kNN rankings, coincident
    points in IVF cells, zero-distance pairs in embedding dedup.
  - n_chars is recomputed (code points) so length-derived gates stay
    consistent with the rewritten text.

Exists because the base fixture is duplicate-LIGHT (every doc distinct),
so the dedup/kNN family's tie-break and cluster-resolution conventions
are mostly untested against value collisions: two engines can disagree
on "which of two equal candidates wins" and stay green until a real
corpus (which is duplicate-HEAVY — that is the whole point of dedup)
hits the tie. This sweep makes the ties the common case.
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    td = pq.read_table(f"{src}/documents.parquet")
    ids = td.column("doc_id").to_pylist()
    texts = td.column("text").to_pylist()
    idx = {d: i for i, d in enumerate(ids)}
    new_texts = list(texts)
    n_exact = n_near = 0
    # long documents are excluded both as copy TARGETS (a composed
    # chain's 10 MB longdoc victim must not be overwritten by a small
    # master — that would silently erase the longdoc axis) and as copy
    # SOURCES (duplicating a 10 MB master 4x would balloon the corpus
    # and the sweep budget)
    LONG = 100_000
    for i, did in enumerate(ids):
        m = did - (did % 20)
        if m == did or m not in idx or texts[idx[m]] is None:
            continue
        if len(texts[idx[m]]) > LONG or (
                texts[i] is not None and len(texts[i]) > LONG):
            continue
        if did % 5 == 1:
            new_texts[i] = texts[idx[m]]
            n_exact += 1
        elif did % 7 == 2:
            new_texts[i] = texts[idx[m]] + " zq" + str(did)
            n_near += 1
    n_chars = [len(t) if t is not None else None for t in new_texts]
    td = td.set_column(td.schema.get_field_index("text"), "text",
                       pa.array(new_texts, pa.string()))
    td = td.set_column(td.schema.get_field_index("n_chars"), "n_chars",
                       pa.array(n_chars, pa.int64()))
    pq.write_table(td, f"{dst}/documents.parquet")

    te = pq.read_table(f"{src}/embeddings.parquet")
    vids = te.column("vec_id").to_pylist()
    vecs = te.column("embedding").to_pylist()
    vidx = {v: i for i, v in enumerate(vids)}
    n_vdup = 0
    new_vecs = list(vecs)
    for i, vid in enumerate(vids):
        m = vid - (vid % 6)
        if vid % 6 == 3 and m in vidx and m != vid:
            new_vecs[i] = vecs[vidx[m]]
            n_vdup += 1
    te = te.set_column(te.schema.get_field_index("embedding"), "embedding",
                       pa.array(new_vecs, te.column("embedding").type))
    pq.write_table(te, f"{dst}/embeddings.parquet")
    print(f"wrote {dst}: exact_dups={n_exact} near_dups={n_near} "
          f"vec_dups={n_vdup} of {len(ids)} docs / {len(vids)} vecs")


if __name__ == "__main__":
    main()
