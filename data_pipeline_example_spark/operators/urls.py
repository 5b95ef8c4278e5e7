"""URL canonicalization dedup — the provenance-level first stage of a
Common-Crawl-style curation funnel (CCNet / RefinedWeb both dedup by
normalized URL before any content pass: it is the only stage that needs
NO text at all, so it runs at metadata cost and removes re-crawls /
tracking-link variants before the expensive fingerprint stages).

The driver corpus carries no URL column, so the operator synthesizes a
deterministic raw URL per document from (doc_id, source) — scheme /
www / host-case / trailing-slash / tracking-query / fragment noise all
varied by doc_id arithmetic, exactly the variant axes the canonicalizer
must collapse. Both the synthesis and the canonicalization steps are
defined ONCE here as pattern tables (the ``text.PII_PATTERNS``
discipline) and replayed verbatim by the DuckDB oracle, so the whole
operator is hash-oracled end to end.

Canonicalization policy (public CCNet/RefinedWeb practice):

1. strip the scheme        (``(?i)^https?://``)
2. strip a leading ``www.``
3. strip the fragment      (``#.*$``)
4. strip the query string  (``\\?.*$`` — CCNet's normalization drops
   queries wholesale; per-param tracking strips are a policy refinement
   that would need multi-match replace, which Spark and DuckDB disagree
   on by default)
5. lowercase the HOST only (path case is significant per RFC 3986)
6. strip trailing slashes  (``/+$``)

Every regex is anchored or end-greedy so it matches AT MOST ONCE —
Spark's replace-all and DuckDB's replace-first semantics then agree
without the 'g' flag.

Scale shape: synthesis + canonicalization are scan-local column
expressions over (doc_id, source) — the text column is never read
(column pruning reaches the parquet scan). The keeper verdict is one
groupBy on the canonical key (min + count, map-side combinable, so a
viral-URL hot key partial-aggregates before the shuffle) and one join
back keyed on the same string — no other shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) — applied in order; each matches at most once.
# The lowercase-host step is positional (between 4 and 6), handled
# structurally in both engines, not by regex.
URL_CANON_PATTERNS: tuple[tuple[str, str], ...] = (
    # the + groups make the whole canonicalization IDEMPOTENT
    # (canonical(canonical(u)) == canonical(u), pinned by property
    # test): misconfigured hosts like www.www.example.com and nested
    # scheme prefixes collapse in ONE pass instead of leaving a
    # re-strippable remainder — still a single anchored match, so
    # Spark/DuckDB replace semantics stay aligned
    ("(?i)^(https?://)+", ""),
    # (?i): the www strip runs BEFORE host lowercasing, so an
    # upper-cased WWW. host must match too (property-test finding —
    # case-sensitive stripping left 'WWW.' to be lowered into a
    # re-strippable 'www.', breaking idempotence)
    (r"(?i)^(www\.)+", ""),
    ("#.*$", ""),
    (r"\?.*$", ""),
)
URL_TRAILING_SLASH = ("/+$", "")


def synthetic_url(doc_id: Column, source: Column) -> Column:
    """Deterministic raw URL for a document: the noise axes a crawler
    actually sees, each keyed on doc_id arithmetic so the same page
    (same source, same doc_id % 8 path) appears under several raw
    spellings."""
    scheme = (
        F.when(doc_id % 3 == 0, F.lit("http://"))
        .when(doc_id % 3 == 1, F.lit("https://"))
        .otherwise(F.lit("https://www."))
    )
    host = F.concat(
        F.when(doc_id % 2 == 0, F.upper(source)).otherwise(source),
        F.lit(".Example.COM"),
    )
    path = F.concat(F.lit("/doc/"), (doc_id % 8).cast("string"))
    slash = F.when(doc_id % 4 == 0, F.lit("/")).otherwise(F.lit(""))
    query = F.when(
        doc_id % 2 == 1,
        F.concat(F.lit("?utm_source=feed&fbclid="), doc_id.cast("string")),
    ).otherwise(F.lit(""))
    frag = F.when(doc_id % 5 == 0, F.lit("#ref")).otherwise(F.lit(""))
    return F.concat(scheme, host, path, slash, query, frag)


def canonical_url(url: Column) -> Column:
    """Apply the canonicalization table + lowercase-host + trailing
    slash strip. Pure scan-local expressions."""
    x = url
    for pat, rep in URL_CANON_PATTERNS:
        x = F.regexp_replace(x, pat, rep)
    host = F.substring_index(x, "/", 1)
    x = F.concat(F.lower(host), F.substring(x, F.length(host) + F.lit(1), F.length(x)))
    return F.regexp_replace(x, *URL_TRAILING_SLASH)


def url_canonical_dedup(documents: DataFrame) -> DataFrame:
    """Canonical key + keeper verdict per document.

    Output: doc_id, url, canonical_url, keep_doc_id (min doc_id of the
    canonical group — the survivor), n_dups (group size), is_keeper.
    Compose upstream of content dedup: filtering to is_keeper = 1
    removes re-crawls before any text is read or shuffled.
    """
    u = documents.select(
        "doc_id",
        synthetic_url(F.col("doc_id"), F.col("source")).alias("url"),
    ).withColumn("canonical_url", canonical_url(F.col("url")))
    groups = u.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )
    return u.join(groups, "canonical_url").select(
        "doc_id",
        "url",
        "canonical_url",
        "keep_doc_id",
        "n_dups",
        (F.col("doc_id") == F.col("keep_doc_id")).cast("int").alias("is_keeper"),
    )


def _canon_sql_expr(col: str) -> str:
    """DuckDB expression replaying :func:`canonical_url` step by step —
    built from the SAME pattern table so operator and oracle cannot
    drift."""
    x = col
    for pat, rep in URL_CANON_PATTERNS:
        x = f"regexp_replace({x}, '{pat}', '{rep}')"
    x = (
        f"lower(split_part({x}, '/', 1)) || "
        f"substr({x}, length(split_part({x}, '/', 1)) + 1)"
    )
    pat, rep = URL_TRAILING_SLASH
    return f"regexp_replace({x}, '{pat}', '{rep}')"


URL_SYNTH_SQL = (
    "(CASE doc_id % 3 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://' "
    "ELSE 'https://www.' END) "
    "|| (CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END) "
    "|| '.Example.COM' || '/doc/' || CAST(doc_id % 8 AS VARCHAR) "
    "|| (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) "
    "|| (CASE WHEN doc_id % 2 = 1 THEN '?utm_source=feed&fbclid=' "
    "|| CAST(doc_id AS VARCHAR) ELSE '' END) "
    "|| (CASE WHEN doc_id % 5 = 0 THEN '#ref' ELSE '' END)"
)

URL_CANON_ORACLE = f"""
WITH u AS (
  SELECT doc_id, {URL_SYNTH_SQL} AS url FROM documents
),
c AS (
  SELECT doc_id, url, {_canon_sql_expr("url")} AS canonical_url FROM u
),
k AS (
  SELECT canonical_url, min(doc_id) AS keep_doc_id,
         CAST(count(*) AS BIGINT) AS n_dups
  FROM c GROUP BY 1
)
SELECT c.doc_id, c.url, c.canonical_url, k.keep_doc_id, k.n_dups,
       CAST(CASE WHEN c.doc_id = k.keep_doc_id THEN 1 ELSE 0 END AS INT)
         AS is_keeper
FROM c JOIN k USING (canonical_url)
"""
