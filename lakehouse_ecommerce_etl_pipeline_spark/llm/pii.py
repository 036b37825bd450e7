"""PII detection / validation / redaction over document text — the
curation gate a training-data pipeline runs before anything ships.

The reference pipeline has no document corpus at all (its PII surface
is column masking over the customer entity — see plans/analytics14.py
q_mask_pii); this module extends the same governance concern to free
text, where PII is embedded mid-string and must be FOUND before it
can be masked:

- detection: regex families (email, phone, IPv4, 16-digit card
  candidates) counted per document with ``regexp_extract_all`` —
  JVM-side, codegen, zero UDFs;
- validation: card candidates are Luhn-checked (mod-10 double-every-
  second-digit) with pure integer arithmetic over the 16 digit
  positions — a regex can only propose, the checksum disposes;
- redaction: match → placeholder rewriting, with Luhn-INVALID digit
  runs deliberately left intact (they are not card numbers; a scrub
  that deletes every 16-digit integer destroys data).

Test corpus construction mirrors llm/multimodal.synthetic_images: the
``documents`` table's text is word soup with no PII, so deterministic
PII snippets are injected from doc_id arithmetic (closed-form, hence
SQL-derivable) and the REAL detection/validation/redaction kernels
run downstream. The kernels never see the generation formulas — they
scan text like production code would.

Regex portability: patterns stick to character classes + bounded
repetition (no lookaround, no backrefs), the subset Java's regex and
DuckDB's RE2 implement identically — which is what makes the whole
tier value-oracleable.

100 TB design
-------------
Everything here is a narrow per-row projection: no shuffle, no UDF,
no driver round-trip. Detection counts ride the same scan the quality
gates already pay; redaction is one ``regexp_replace`` chain whose
cost is linear in bytes scanned. The Luhn check expands to 16 fixed
substring/int terms — whole-stage codegen keeps it in one pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# portable regex subset (Java regex ∩ RE2): character classes only
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PHONE_RE = "555-[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]"
IPV4_RE = "10\\.[0-9]+\\.[0-9]+\\.[0-9]+"
CARD_RE = "[0-9]{16}"

PAN_LEN = 16


def inject_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Append deterministic PII snippets to each document's text:

    - every doc: an email ``user<id>@ex<id%7>.com``
    - id % 3 == 0: a phone ``555-<id%1000>-<id%10000>`` (zero-padded)
    - id % 4 == 1: an IPv4 ``10.<id%256>.<3id%256>.<7id%256>``
    - id % 5 == 2: a 16-digit card candidate whose digits come from
      ``(id² · 31 + 7 id + 11) mod 10^16`` — whether it Luhn-validates
      is decided by the checksum itself, not by construction, so the
      validation bit downstream is real work in both engines.

    Closed-form in doc_id ⇒ the oracle can regenerate the corpus in
    SQL; the detection kernels below never look at these formulas.
    """
    i = F.col(id_col)
    email = F.concat(
        F.lit(" user"), i.cast("string"), F.lit("@ex"),
        (i % 7).cast("string"), F.lit(".com"),
    )
    phone = F.when(
        i % 3 == 0,
        F.concat(
            F.lit(" 555-"), F.lpad((i % 1000).cast("string"), 3, "0"),
            F.lit("-"), F.lpad((i % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        i % 4 == 1,
        F.concat(
            F.lit(" 10."), (i % 256).cast("string"),
            F.lit("."), ((i * 3) % 256).cast("string"),
            F.lit("."), ((i * 7) % 256).cast("string"),
        ),
    ).otherwise(F.lit(""))
    pan = F.lpad(
        ((i * i * 31 + i * 7 + 11) % F.lit(10**PAN_LEN)).cast("string"),
        PAN_LEN,
        "0",
    )
    card = F.when(
        i % 5 == 2, F.concat(F.lit(" card "), pan)
    ).otherwise(F.lit(""))
    return df.withColumn(
        text_col, F.concat(F.col(text_col), email, phone, ip, card)
    )


def luhn_valid(pan: Column) -> Column:
    """Luhn mod-10 checksum over a 16-char digit string, expanded to
    16 fixed substring/int terms (codegen-friendly, engine-portable).
    Digits at odd 1-indexed positions (second-from-right and every
    other leftward) are doubled with 9-subtraction carry."""
    total = F.lit(0)
    for pos in range(1, PAN_LEN + 1):
        # try_cast: the expression must also be evaluable on non-card
        # rows (empty pan) when it appears in an eagerly-evaluated
        # WHEN condition — '' casts to NULL, and FALSE & NULL = FALSE
        d = F.substring(pan, pos, 1).try_cast("int")
        if pos % 2 == 1:  # doubled positions for even total length
            term = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        else:
            term = d
        total = total + term
    return total % 10 == 0


def luhn_valid_sql(pan_expr: str) -> str:
    """The DuckDB twin of ``luhn_valid``, generated from the same
    position loop so the formulas cannot drift."""
    terms = []
    for pos in range(1, PAN_LEN + 1):
        d = f"CAST(substr({pan_expr}, {pos}, 1) AS INTEGER)"
        if pos % 2 == 1:
            terms.append(
                f"(CASE WHEN {d} * 2 > 9 THEN {d} * 2 - 9 ELSE {d} * 2 END)"
            )
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ") % 10 = 0"


def detect_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document PII inventory: regex-family match counts plus the
    Luhn verdict on the (at most one, by construction) card
    candidate. Pure projections — detection rides the corpus scan."""
    t = F.col(text_col)
    pan = F.regexp_extract(t, CARD_RE, 0)
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))).alias(
            "n_ips"
        ),
        (pan != "").alias("has_card"),
        F.when(pan != "", luhn_valid(pan)).otherwise(F.lit(False)).alias(
            "card_luhn_valid"
        ),
    )


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact detected PII: emails → [EMAIL], phones → [PHONE], IPs →
    [IP]; a 16-digit run is replaced by [CARD] ONLY when it
    Luhn-validates (a failed checksum means it is not a card number —
    scrubbing it would destroy non-PII data). Returns the scrubbed
    text plus its fingerprint so redaction is value-pinned
    end-to-end."""
    t = F.col(text_col)
    pan = F.regexp_extract(t, CARD_RE, 0)
    scrubbed = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    scrubbed = F.regexp_replace(scrubbed, PHONE_RE, "[PHONE]")
    scrubbed = F.regexp_replace(scrubbed, IPV4_RE, "[IP]")
    scrubbed = F.when(
        (pan != "") & luhn_valid(pan),
        F.regexp_replace(scrubbed, CARD_RE, "[CARD]"),
    ).otherwise(scrubbed)
    return df.select(
        F.col(id_col),
        F.length(t).alias("len_raw"),
        F.length(scrubbed).alias("len_scrubbed"),
        F.md5(scrubbed).alias("scrub_fp"),
    )
