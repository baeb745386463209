"""PII scrubbing — detect and redact contact-info spans in text columns.

A first-class training-data op (C4-style blocklist filtering, privacy
redaction before training). Not in the reference (its closest surface is
``regexp_matches``, ``expression_execution.rs:305-317``). One stateless
vectorized ``map_batches`` stage: counts via ``pc.count_substring_regex``,
redaction via ``pc.replace_substring_regex`` — both RE2, the same engine
DuckDB's ``regexp_replace`` uses, so the redacted text is byte-identical to
the SQL oracle (hash-exact contract, not rows-only).

Patterns are deliberately RE2-safe (no backrefs, no lookaround) and applied
in a fixed order — URL, then email, then IPv4 — with each later count taken
on the previous stage's output, so a URL containing an email-shaped path
segment is redacted exactly once (and the oracle mirrors the same
sequence). Order matters; keep both sides in sync.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

URL_TOKEN = "<URL>"
EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def scrub_pii(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    redacted_col: str = "redacted",
    keep_text: bool = False,
) -> "ray.data.Dataset":
    """Append ``n_urls`` / ``n_emails`` / ``n_ips`` (int64) and
    ``redacted_col`` (text with each span replaced by its token). With
    ``keep_text=False`` the original text column is dropped on the way out
    — at 100 TB the scrubbed copy replaces the raw one, not rides beside
    it."""

    def scrub(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        n_urls = pc.count_substring_regex(filled, URL_RE).cast(pa.int64())
        s1 = pc.replace_substring_regex(filled, URL_RE, URL_TOKEN)
        n_emails = pc.count_substring_regex(s1, EMAIL_RE).cast(pa.int64())
        s2 = pc.replace_substring_regex(s1, EMAIL_RE, EMAIL_TOKEN)
        n_ips = pc.count_substring_regex(s2, IPV4_RE).cast(pa.int64())
        s3 = pc.replace_substring_regex(s2, IPV4_RE, IP_TOKEN)
        if not keep_text:
            t = t.drop_columns([text_col])
        t = t.append_column("n_urls", n_urls)
        t = t.append_column("n_emails", n_emails)
        t = t.append_column("n_ips", n_ips)
        return t.append_column(redacted_col, s3)

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
