#!/usr/bin/env python3
"""Unicode/multibyte robustness sweep: copy a testdata SF dir with
multibyte text injected into documents.text (accented Latin, CJK,
astral-plane emoji, NBSP, ideographic space, combining marks), so the
full gate suite can be re-run against it:

    python3 tools/unicode_sweep.py /root/testdata/sf0.01 /tmp/sfuni
    sbt "runMain graft.Verify /tmp/sfuni /tmp/verify_uni"
    python3 tools/oracle_check.py /tmp/sfuni /tmp/verify_uni

Exists because the driver fixtures are pure ASCII, so a text kernel
can silently encode an ASCII-only convention (UTF-16 code-unit
indexing that splits surrogate pairs, Java-vs-RE2 regex class
differences, Unicode-vs-ASCII whitespace tokenization) and stay green
until the corpus gains real multilingual text — which a 100 TB
training corpus certainly has. The injected shapes cover the
divergence surfaces: 2-byte (é/ü), 3-byte (CJK, U+3000 ideographic
space), 4-byte/astral (emoji — UTF-16 surrogate pairs in the JVM),
U+00A0 NBSP (NOT whitespace to java.lang.Character or POSIX [:space:],
a classic tokenizer trap), and a combining mark (e + U+0301, two code
points that render as one grapheme).

documents.n_chars is recomputed as utf8_length(text) (code points) so
the fixture invariant n_chars == length(text) holds — both Spark's
length() and DuckDB's length() count code points.

Masks are deterministic (doc_id mod primes) so reruns agree.
"""
import sys, os, shutil
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# appended: multibyte words incl. 4-byte emoji and a combining mark
SUFFIX = " café naïve 中文テスト \U0001f680\U0001f9ea ёж été"
# prepended: NBSP inside a "word" and an em dash
PREFIX = "Ünïcode prefix — "

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    td = pq.read_table(f"{src}/documents.parquet")
    ids = td.column("doc_id").to_numpy()
    text = td.column("text").to_pylist()
    n_suf = n_pre = n_ideo = 0
    for i in range(len(text)):
        if text[i] is None:
            continue
        if ids[i] % 23 == 7:
            text[i] = text[i] + SUFFIX; n_suf += 1
        if ids[i] % 29 == 11:
            text[i] = PREFIX + text[i]; n_pre += 1
        if ids[i] % 31 == 13:
            # U+3000 IDEOGRAPHIC SPACE replaces the first ASCII space:
            # IS whitespace to Character.isWhitespace, NOT to ASCII \s
            text[i] = text[i].replace(" ", "　", 1); n_ideo += 1
    arr = pa.array(text, type=pa.string())
    td = td.set_column(td.schema.get_field_index("text"), "text", arr)
    td = td.set_column(td.schema.get_field_index("n_chars"), "n_chars",
                       pc.cast(pc.utf8_length(arr), pa.int64()))
    pq.write_table(td, f"{dst}/documents.parquet")
    print(f"wrote {dst}: suffix={n_suf} prefix={n_pre} ideo_space={n_ideo} "
          f"(of {len(text)} docs)")

if __name__ == "__main__":
    main()
