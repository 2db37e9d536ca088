#!/usr/bin/env python3
"""Whitespace/control-character robustness sweep: copy a testdata SF
dir with exotic-but-legal whitespace injected into documents.text
(CRLF line endings, tabs, vertical tab, form feed, multi-newline
blank lines, bullet/ellipsis line shapes), so the full gate suite can
be re-run against it:

    python3 tools/whitespace_sweep.py /root/testdata/sf0.01 /tmp/sfws
    sbt "runMain graft.Verify /tmp/sfws /tmp/verify_ws"
    python3 tools/oracle_check.py /tmp/sfws /tmp/verify_ws

Exists because the driver fixtures are single-line space-separated
text, so every line-metric oracle (bullet_frac / ellipsis_frac split
on chr(10)), every tokenizer (\\s classes differ subtly between Java
regex, RE2, and hand-rolled kernels), and every \\s+-collapsing
fingerprint can encode a convention that never fires. Real corpora
are full of CRLF and tabs. Masks are deterministic (doc_id mod
primes) so reruns agree.
"""
import sys, os, shutil
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    td = pq.read_table(f"{src}/documents.parquet")
    ids = td.column("doc_id").to_numpy()
    text = td.column("text").to_pylist()
    n_crlf = n_tab = n_lines = 0
    for i in range(len(text)):
        if text[i] is None:
            continue
        if ids[i] % 23 == 5:
            # CRLF every ~5 words + a trailing \r\n
            ws = text[i].split(" ")
            text[i] = "".join(
                w + ("\r\n" if (j + 1) % 5 == 0 else " ")
                for j, w in enumerate(ws)).rstrip() + "\r\n"
            n_crlf += 1
        if ids[i] % 29 == 17:
            # tab / vertical-tab / form-feed separators
            text[i] = text[i].replace(" ", "\t", 3) \
                             .replace(" ", "\x0b", 2).replace(" ", "\f", 1)
            n_tab += 1
        if ids[i] % 31 == 19:
            # line shapes the Gopher metrics look at: a bullet line, an
            # ellipsis line, a blank double-newline, trailing spaces
            text[i] = ("- bullet line\n• another   \n\n" + text[i] +
                       "\ntrailing thought...\n")
            n_lines += 1
    arr = pa.array(text, type=pa.string())
    td = td.set_column(td.schema.get_field_index("text"), "text", arr)
    td = td.set_column(td.schema.get_field_index("n_chars"), "n_chars",
                       pc.cast(pc.utf8_length(arr), pa.int64()))
    pq.write_table(td, f"{dst}/documents.parquet")
    print(f"wrote {dst}: crlf={n_crlf} tab={n_tab} lines={n_lines} "
          f"(of {len(text)} docs)")

if __name__ == "__main__":
    main()
