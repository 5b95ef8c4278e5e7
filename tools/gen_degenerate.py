"""Build DEGENERATE variants of a testdata scale-factor directory —
the adversarial-input corpus for empty-aggregate / NULL-group /
div-by-zero semantics, where Spark and DuckDB silently disagree most
(r14 VERDICT item 1, the follow-up to the non-ASCII sweep that caught
four latent cross-engine bugs).

    python tools/gen_degenerate.py --variant mixed|empty|single \
        [--src /root/testdata/sf0.001] [--dst .localdata/sfdeg*]
    python tools/validate_oracle.py --vanilla --corpus degenerate

Variants (all schema-identical to the source, so every query loads):

* ``mixed``  — source rows PLUS injected degenerates: NULL / empty /
  whitespace-only / punctuation-only / 100k-char-outlier documents,
  NULL lang/source, zero-length + all-zero (norm 0) + NULL embeddings,
  NULL label, events with NULL ts/user/type/value/props and value 0 /
  negative, a lineitem row with all-zero measures and NULL group keys,
  an orders row with zero total and NULL priority.
* ``empty``  — every table with ZERO rows (schema-preserving LIMIT 0):
  empty global aggregates, empty quantiles, empty joins, `.first()`
  driver-side guards.
* ``single`` — every table with exactly ONE row (ORDER BY first column
  LIMIT 1): stddev_samp/corr-of-one (Spark NaN vs DuckDB NULL class),
  ntile/percentile on a singleton, joins that match nothing.
"""

from __future__ import annotations

import argparse
import os

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# one deterministic ~100k-char outlier made of real words so tokenizers,
# shingles, and quality gates all engage with it (not just length cuts)
_OUTLIER = ("the quick brown fox jumps over the lazy dog near the river bank " * 1600).strip()


def _copy_table(con, src: str, dst: str, t: str, suffix: str) -> None:
    s = f"{src}/{t}.parquet"
    if os.path.isdir(s):
        s = f"{s}/*.parquet"
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{s}') {suffix}) "
        f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
    )


def _first_col(con, src: str, t: str) -> str:
    s = f"{src}/{t}.parquet"
    if os.path.isdir(s):
        s = f"{s}/*.parquet"
    return con.execute(f"DESCRIBE SELECT * FROM read_parquet('{s}')").fetchall()[0][0]


def build(variant: str, src: str, dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    if variant == "empty":
        for t in TABLES:
            _copy_table(con, src, dst, t, "LIMIT 0")
        return
    if variant == "single":
        for t in TABLES:
            _copy_table(con, src, dst, t, f"ORDER BY {_first_col(con, src, t)} LIMIT 1")
        return

    # mixed: passthrough dims, degenerate-augmented facts
    for t in ("region", "nation", "customer", "supplier", "part"):
        _copy_table(con, src, dst, t, "")

    def _src(t: str) -> str:
        s = f"{src}/{t}.parquet"
        return f"{s}/*.parquet" if os.path.isdir(s) else s

    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{_src('embeddings')}') LIMIT 1"
    ).fetchone()[0]

    # documents: NULL text (+NULL n_chars), empty string, whitespace-only,
    # single char, punctuation-only, digits-only, tab/newline soup, NULL
    # lang, NULL source, and the 100k-char real-word outlier
    doc_rows = [
        (9001, None, "en", "web", None),
        (9002, "", "en", "web", 0),
        (9003, "   \t   ", "en", "books", None),
        (9004, "a", "de", "web", 1),
        (9005, "!!! ??? ... ;;; ---", "en", "code", None),
        (9006, "1234567890 007 3.14159", "en", "wiki", None),
        (9007, "line one\n\nline two\ttabbed\nline one", "en", "web", None),
        (9008, "ordinary text with a null language marker", None, "web", None),
        (9009, "ordinary text with a null source marker", "fr", None, None),
        (9010, _OUTLIER, "en", "books", None),
    ]
    vals = ", ".join(
        "(%d, %s, %s, %s, %s)"
        % (
            i,
            "NULL" if txt is None else "'" + txt.replace("'", "''").replace("\\", "\\\\") + "'",
            "NULL" if lang is None else f"'{lang}'",
            "NULL" if srcv is None else f"'{srcv}'",
            "NULL" if n is None else str(n),
        )
        for i, txt, lang, srcv, n in doc_rows
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{_src('documents')}')
          UNION ALL
          SELECT doc_id::BIGINT, text, lang, source,
                 coalesce(n_chars, length(text))::BIGINT AS n_chars
          FROM (VALUES {vals}) t(doc_id, text, lang, source, n_chars)
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
        """
    )

    # embeddings: empty list, NULL vector, all-zero vector (norm 0 →
    # cosine division guard), NULL label on a normal-looking vector
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{_src('embeddings')}')
          UNION ALL
          SELECT * FROM (VALUES
            (9001::BIGINT, []::FLOAT[], 0::INTEGER),
            (9002::BIGINT, NULL::FLOAT[], 1::INTEGER),
            (9003::BIGINT, (SELECT list_transform(range(1, {dim} + 1), x -> 0.0::FLOAT)), 2::INTEGER),
            (9004::BIGINT, (SELECT list_transform(range(1, {dim} + 1), x -> (0.01 * x)::FLOAT)), NULL::INTEGER)
          ) t(vec_id, embedding, label)
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
        """
    )

    # events: NULL ts / user / type / value / props, zero and negative value
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{_src('events')}')
          UNION ALL
          SELECT * FROM (VALUES
            (9001::BIGINT, NULL::TIMESTAMP, 7::BIGINT, 'purchase', 5.0::DOUBLE, '{{}}'),
            (9002::BIGINT, TIMESTAMP '2024-01-15 12:00:00', NULL::BIGINT, 'view', 1.0::DOUBLE, NULL),
            (9003::BIGINT, TIMESTAMP '2024-01-15 12:00:01', 8::BIGINT, NULL, 2.5::DOUBLE, '{{}}'),
            (9004::BIGINT, TIMESTAMP '2024-01-15 12:00:02', 9::BIGINT, 'purchase', NULL::DOUBLE, '{{}}'),
            (9005::BIGINT, TIMESTAMP '2024-01-15 12:00:03', 9::BIGINT, 'refund', 0.0::DOUBLE, '{{}}'),
            (9006::BIGINT, TIMESTAMP '2024-01-15 12:00:04', 10::BIGINT, 'refund', -3.75::DOUBLE, '{{}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
        """
    )

    # lineitem: one all-zero-measures row with NULL group keys (NULL-group
    # semantics + zero-denominator ratios); orders: zero total, NULL priority
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{_src('lineitem')}')
          UNION ALL
          SELECT 999999::BIGINT, 1::BIGINT, 1::BIGINT, 1::INTEGER,
                 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE,
                 NULL::VARCHAR, NULL::VARCHAR, TIMESTAMP '2024-01-15 00:00:00'
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{_src('orders')}')
          UNION ALL
          SELECT 999999::BIGINT, 1::BIGINT, 'O', 0.0::DOUBLE,
                 TIMESTAMP '2024-01-15 00:00:00', NULL::VARCHAR
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
        """
    )


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--variant", choices=["mixed", "empty", "single"], default="mixed")
    p.add_argument("--src", default="/root/testdata/sf0.001")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p.add_argument("--dst", default=None)
    a = p.parse_args()
    dst = a.dst or os.path.join(
        repo, ".localdata", {"mixed": "sfdeg", "empty": "sfdeg_empty", "single": "sfdeg_single"}[a.variant]
    )
    build(a.variant, a.src, dst)
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{dst}/{t}.parquet: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
