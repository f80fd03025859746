"""PII redaction for training corpora: scrub emails, international phone
numbers, and IPv4 addresses from document text, reporting per-doc hit
counts (the standard pre-training hygiene pass, e.g. Penedo et al. 2023
RefinedWeb §3.4, Soldaini et al. 2024 Dolma §4 — public methods).

Not in the reference — a training-data-pipeline addition required by the
brief. Fully oracle-checkable: the regexes below are deliberately written
in the common subset of Java regex (Spark) and RE2 (DuckDB) — character
classes, bounded repetition, ``\\b`` word boundaries; no lookaround, no
backreferences — so ``regexp_replace``/``regexp_count`` produce identical
output in both engines (`pii_oracle_sql`).

Scale shape (100 TB): pure per-row Catalyst `regexp_replace`/
`regexp_count` projections — no shuffle, no Python, whole-stage codegen
throughout; the pass pipelines into whatever scan feeds it.

Replacement order matters and is fixed: emails first (an email's host
part could otherwise be half-eaten by the IP rule), then phones, then
IPs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java-regex and RE2 read these identically (verified by the driver's
# value-hash check and the brute-force Python oracle in tests).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{7,14}\b"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, clean) — counts from the raw
    text, then ordered replacement email → phone → IPv4."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
            ),
            IPV4_RE,
            IP_TOKEN,
        ).alias("clean"),
    )


def pii_oracle_sql(corpus_cte: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror over ``WITH corpus AS ({corpus_cte})`` — same regexes,
    same replacement order, global flag on every replace."""
    return f"""
        WITH corpus AS ({corpus_cte})
        SELECT {id_col} AS doc_id,
               len(regexp_extract_all({text_col}, '{EMAIL_RE}'))::INT AS n_emails,
               len(regexp_extract_all({text_col}, '{PHONE_RE}'))::INT AS n_phones,
               len(regexp_extract_all({text_col}, '{IPV4_RE}'))::INT AS n_ips,
               regexp_replace(
                   regexp_replace(
                       regexp_replace({text_col}, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
                       '{PHONE_RE}', '{PHONE_TOKEN}', 'g'),
                   '{IPV4_RE}', '{IP_TOKEN}', 'g') AS clean
        FROM corpus
        ORDER BY doc_id
    """
