"""PII detection / redaction over a text column — a first-class
training-data-prep stage (emails, IPv4 addresses, phone numbers).

Scale contract: a pure vectorized ``map_batches`` transform — zero
shuffle, zero state, zero Python-per-row. Every kernel is a pyarrow
RE2 call (``count_substring_regex`` / ``replace_substring_regex``), so
a 100 TB corpus streams through at regex-engine speed and the operator
is embarrassingly parallel.

Oracle contract: DuckDB's ``regexp_replace(..., 'g')`` and
``regexp_extract_all`` are the SAME RE2 engine, so the driver's
hash-exact gate can check redacted text byte-for-byte (see
``pii_scrub`` in ``__ray_entry__.py``). Patterns deliberately avoid
constructs with engine-divergent semantics (no lookaround — RE2 has
none — no backreferences).

Counts are measured on the ORIGINAL text; redactions are applied
sequentially email → IPv4 → phone (an address inside an already
redacted token can no longer match — both sides apply the same order).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2 syntax, identical in pyarrow and DuckDB.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{1,3}[ -]\d{3}[ -]\d{3}[ -]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"

# (pattern, replacement) in application order — the public contract.
PII_RULES = (
    (EMAIL_RE, EMAIL_TOKEN),
    (IPV4_RE, IPV4_TOKEN),
    (PHONE_RE, PHONE_TOKEN),
)


def pii_scrub_batch(batch: pa.Table, column: str = "text",
                    id_column: str = "doc_id") -> pa.Table:
    """One batch: per-pattern match counts (on the original text) +
    fully redacted ``text_clean``. Null text counts null / redacts to
    null (same as SQL: regexp on NULL is NULL). All OTHER input columns
    pass through untouched, so the stage composes mid-pipeline
    (``id_column`` is only documentation of the row key here)."""
    text = batch[column]
    counts = [pc.cast(pc.count_substring_regex(text, pat), pa.int64())
              for pat, _ in PII_RULES]
    clean = text
    for pat, token in PII_RULES:
        clean = pc.replace_substring_regex(clean, pat, token)
    out = batch.drop_columns([column])
    for name, arr in zip(("n_emails", "n_ipv4", "n_phones"), counts):
        out = out.append_column(name, arr)
    return out.append_column("text_clean", clean)


def scrub_pii(ds, column: str = "text", id_column: str = "doc_id"):
    """Dataset-level PII scrub: ``map_batches`` over Arrow batches."""
    import functools
    return ds.map_batches(
        functools.partial(pii_scrub_batch, column=column, id_column=id_column),
        batch_format="pyarrow")
