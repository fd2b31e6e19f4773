"""PII detection and redaction over a document corpus.

The standard pre-training scrub pass: detect emails / IPv4s / phone
numbers / SSNs / credit-card numbers with portable regexes, count them
per document, and rewrite the text with typed placeholder tokens.

Everything is a pure Column expression (JVM-side, codegen'd) running in
the projection of a single scan — zero shuffle at any corpus size. The
regex subset used (character classes, \\b, \\d, {m,n}, (?:...)) behaves
identically under Java regex (Spark) and RE2 (DuckDB), so every detector
has an exact SQL oracle.

The credit-card detector includes a Luhn checksum validator built from
higher-order array functions (transform + aggregate), not a UDF — the
checksum stays inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns. Order matters for redaction: SSN and CC shapes are
# redacted before phone numbers so a phone-shaped suffix of a longer
# digit group can never fire first. All patterns are RE2-compatible.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
SSN_PATTERN = r"\b\d{3}-\d{2}-\d{4}\b"
CC_PATTERN = r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b|\b\d{16}\b"
PHONE_PATTERN = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

_REDACTIONS = (
    (EMAIL_PATTERN, "<EMAIL>"),
    (SSN_PATTERN, "<SSN>"),
    (CC_PATTERN, "<CC>"),
    (IPV4_PATTERN, "<IP>"),
    (PHONE_PATTERN, "<PHONE>"),
)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII hit counts for one text column."""
    return {
        "n_emails": _count(text, EMAIL_PATTERN),
        "n_ipv4": _count(text, IPV4_PATTERN),
        "n_ssns": _count(text, SSN_PATTERN),
        "n_ccs": _count(text, CC_PATTERN),
        "n_phones": _count(text, PHONE_PATTERN),
    }


def redact(text: Column) -> Column:
    """Replace every detected PII span with its typed placeholder.
    Fixed application order (email, ssn, cc, ip, phone) so overlapping
    shapes resolve deterministically in both engines."""
    out = text
    for pattern, token in _REDACTIONS:
        out = F.regexp_replace(out, pattern, token)
    return out


def luhn_valid(digits: Column) -> Column:
    """Luhn checksum over a digits-only string — expression-only (no
    UDF): reverse, double every second digit with the >9 fold, aggregate
    the sum, test mod 10. NULL and empty input both yield false."""
    rev = F.reverse(digits)
    idx = F.sequence(F.lit(1), F.greatest(F.length(rev), F.lit(1)))
    terms = F.transform(
        idx,
        lambda i: _luhn_term(F.ascii(F.substr(rev, i, F.lit(1))) - 48, i),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    # coalesce pins NULL input to false (null & ... would propagate NULL)
    return F.coalesce((F.length(digits) > 0) & (total % 10 == 0), F.lit(False))


def _luhn_fold(doubled: Column) -> Column:
    return F.when(doubled > 9, doubled - 9).otherwise(doubled)


def _luhn_term(d: Column, i: Column) -> Column:
    return F.when(i % 2 == 0, _luhn_fold(d * 2)).otherwise(d)


def cc_digits(cc_match: Column) -> Column:
    """Digits-only form of a credit-card match (separators stripped)."""
    return F.regexp_replace(cc_match, r"[- ]", "")


def scan(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full PII sweep: per-doc category counts, count of Luhn-VALID card
    numbers among CC-shaped matches, and the redacted text. One
    projection, zero shuffle."""
    text = F.col(text_col)
    counts = pii_counts(text)
    cc_matches = F.regexp_extract_all(text, F.lit(CC_PATTERN), 0)
    n_luhn = F.size(
        F.filter(cc_matches, lambda m: luhn_valid(cc_digits(m)))
    ).cast("bigint")
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in counts.items()],
        n_luhn.alias("n_ccs_luhn_valid"),
        redact(text).alias("redacted_text"),
    )


def pseudonymize(key_col: Column, salt: str) -> Column:
    """Keyed, deterministic pseudonym for an identifier column: md5 of
    salt || ':' || key. Same salt => same pseudonym everywhere, so joins
    between independently pseudonymized tables still line up
    (referential consistency); rotating the salt unlinks every release.
    A production deployment feeds the salt from a secret store and uses
    a keyed MAC (HMAC-SHA256) — md5-of-concat keeps the exact mapping
    reproducible in any SQL engine for the consistency audit."""
    return F.md5(F.concat(F.lit(salt), F.lit(":"), key_col.cast("string")))


# ---------------------------------------------------------------------------
# Prefix-preserving IP pseudonymization (CryptoPAn-style)
# ---------------------------------------------------------------------------
# Xu et al. "Prefix-Preserving IP Address Anonymization" (CryptoPAn): bit i
# of the pseudonym is the original bit XOR a keyed pseudorandom function of
# the PRECEDING i-1 bits, so two addresses sharing a k-bit prefix share
# exactly a k-bit pseudonym prefix — subnet structure survives, addresses
# don't. The PRF here is the parity of the first md5 hex digit of
# (key ':' prefix-bits); production swaps md5 for AES/HMAC, same shape.
# Both the Spark plan and the DuckDB oracle consume the SAME generated SQL
# expression text (dialect-neutral: substring/md5/CASE/%/+ only), so the
# derivation can never drift between engines.

IP_BITS = 32
_ODD_HEX = "('1','3','5','7','9','b','d','f')"
_KEY_RE = re.compile(r"[A-Za-z0-9_-]{1,64}")


def ip_bits_sql(ip_col: str) -> str:
    """SQL: the 32-char '0'/'1' string of an IPv4 address integer.

    Input contract: {ip_col} must be a valid IPv4 integer in [0, 2^32).
    A value outside that range would lpad-TRUNCATE to its first 32
    binary chars (silently anonymizing a DIFFERENT address), so
    out-of-range inputs map to NULL instead — dialect-neutral (the same
    text runs in Spark and DuckDB, neither of which shares an
    error-raising function), and a NULL pseudonym is auditable where a
    wrong one is not."""
    return (
        f"(CASE WHEN CAST({ip_col} AS BIGINT) BETWEEN 0 AND 4294967295 "
        f"THEN lpad(bin(CAST({ip_col} AS BIGINT)), {IP_BITS}, '0') "
        f"ELSE NULL END)"
    )


def prefix_preserving_anon_sql(bits_col: str, key: str = "pk") -> str:
    """SQL: the anonymized 32-bit integer from a bits-string column.
    flip_i = parity of md5(key ':' first i-1 bits); anon bit = bit XOR
    flip expressed as (bit + flip) % 2 (dialect-neutral XOR for 0/1).

    ``key`` is interpolated into SQL text, so it is restricted to
    [A-Za-z0-9_-] (no quotes/backslashes) — a free-form secret would
    otherwise break or alter the generated statement in both engines."""
    if not _KEY_RE.fullmatch(key):
        raise ValueError(
            "key must match [A-Za-z0-9_-]{1,64} (it is embedded in "
            "generated SQL text)")
    terms = []
    for i in range(1, IP_BITS + 1):
        b = f"CAST(substring({bits_col}, {i}, 1) AS INT)"
        prefix = f"substring({bits_col}, 1, {i - 1})"
        flip = (f"(CASE WHEN substring(md5('{key}:' || {prefix}), 1, 1) "
                f"IN {_ODD_HEX} THEN 1 ELSE 0 END)")
        terms.append(
            f"CAST((({b} + {flip}) % 2) AS BIGINT) * {1 << (IP_BITS - i)}")
    return "(" + "\n + ".join(terms) + ")"


def common_prefix_len_sql(x: str, y: str) -> str:
    """SQL: length of the common prefix of two same-length bit strings —
    the sum of prefix-equality indicators (once they differ at length k,
    every longer prefix differs too)."""
    terms = [
        f"(CASE WHEN substring({x}, 1, {i}) = substring({y}, 1, {i}) "
        f"THEN 1 ELSE 0 END)"
        for i in range(1, IP_BITS + 1)
    ]
    return "CAST((" + " + ".join(terms) + ") AS BIGINT)"


def prefix_preserving_anon(df: DataFrame, ip_col: str,
                           key: str = "pk") -> DataFrame:
    """Attach `anon_ip` (prefix-preserving pseudonym of the integer IPv4
    column) — a pure generated projection, zero shuffle at any scale."""
    return (
        df.withColumn("_bits", F.expr(ip_bits_sql(ip_col)))
        .withColumn("anon_ip",
                    F.expr(prefix_preserving_anon_sql("_bits", key)))
        .drop("_bits")
    )
