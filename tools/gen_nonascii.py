"""Build a NON-ASCII variant of a testdata scale-factor directory —
the cross-engine audit corpus the all-ASCII testdata can't provide.

    python tools/gen_nonascii.py [src_dir] [dst_dir]
    python tools/validate_oracle.py --vanilla .localdata/sfna

Every table copies through unchanged except ``documents``: two thirds
of the docs get text where characters != bytes (appended umlaut/CJK
words, or every 'e' replaced with 'é'), with ``n_chars`` recomputed to
match. Any oracle that silently keys on BYTE length (DuckDB strlen),
ASCII-only \\b word-bounding (RE2) vs Unicode \\b (Java), or other
encoding-dependent semantics hash-mismatches here while passing on the
ASCII corpus — the r14 sweep caught four such queries (the lang_id
stopword family) plus the audio closed-form strlen defect this way.
"""

from __future__ import annotations

import os
import shutil
import sys

TABLES = (
    "region nation customer supplier part orders lineitem events embeddings"
).split()


def main() -> int:
    import duckdb

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata/sfna",
    )
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.isdir(s):
            shutil.copytree(s, d, dirs_exist_ok=True)
        else:
            shutil.copyfile(s, d)
    con = duckdb.connect()
    mutated = (
        "CASE WHEN doc_id % 3 = 0 THEN text || ' ümlaut ßtraße 你好 café' "
        "WHEN doc_id % 3 = 1 THEN replace(text, 'e', 'é') "
        "ELSE text END"
    )
    con.execute(
        f"""
        COPY (
          SELECT doc_id, {mutated} AS text, lang, source,
                 length({mutated}) AS n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n, na = con.execute(
        f"SELECT count(*), sum(CASE WHEN strlen(text) != length(text) "
        f"THEN 1 ELSE 0 END) FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()
    print(f"{dst}: {n} docs, {na} with chars != bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
