"""PII scrubber (pipelines/pii.py) unit pins.

The regex catalog itself is ast-pinned to the reference in
test_regex_catalog_parity.py; here we pin the REDACTION semantics:
specificity order (card numbers would otherwise be eaten by the
phone pattern), leftmost non-overlapping counts, replacement text,
null handling, case-insensitive matching, and the keep_text surface.
"""

from __future__ import annotations

import pandas as pd

from crawl4ai_ray.pipelines.pii import PII_LABELS, PiiScrubber


def scrub(texts, **kw):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return PiiScrubber(**kw)(df)


def test_card_claims_span_before_phone():
    out = scrub(["pay 4042111111111 now"])
    assert out.loc[0, "n_credit_card"] == 1
    assert out.loc[0, "n_phone_intl"] == 0
    assert out.loc[0, "scrubbed_tail"] == "pay [CREDIT_CARD] now"
    # and the order constant actually encodes that
    assert PII_LABELS.index("credit_card") < PII_LABELS.index("phone_intl")


def test_email_digits_never_match_phone():
    out = scrub(["mail 123456789012@example.com ok"])
    assert out.loc[0, "n_email"] == 1
    assert out.loc[0, "n_phone_intl"] == 0
    assert "[EMAIL]" in out.loc[0, "scrubbed_tail"]


def test_counts_and_replacements_per_label():
    out = scrub(
        [
            "a@b.co and c@d.org",  # two emails
            "+1 (555) 010-2304",  # intl phone
            "10.1.0.2 then 192.168.0.1",  # two ips
            "ID 00000000-0000-4000-8000-000000000000",
            None,  # null text
            "",  # empty
        ]
    )
    assert out["n_email"].tolist() == [2, 0, 0, 0, 0, 0]
    assert out["n_phone_intl"].tolist() == [0, 1, 0, 0, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 0, 2, 0, 0, 0]
    assert out["n_uuid"].tolist() == [0, 0, 0, 1, 0, 0]
    assert out.loc[0, "scrubbed_tail"] == "[EMAIL] and [EMAIL]"
    assert out.loc[2, "scrubbed_tail"] == "[IPV4] then [IPV4]"
    assert out.loc[3, "scrubbed_tail"] == "ID [UUID]"
    assert out.loc[4, "scrubbed_len"] == 0 and out.loc[5, "scrubbed_len"] == 0


def test_case_insensitive_uuid():
    out = scrub(["id 00000000-0000-4000-8000-0000000000AB end"])
    assert out.loc[0, "n_uuid"] == 1


def test_keep_text_and_tail_bound():
    long = "x" * 100 + " a@b.co"
    out = scrub([long], keep_text=True)
    assert out.loc[0, "scrubbed_text"] == "x" * 100 + " [EMAIL]"
    assert len(out.loc[0, "scrubbed_tail"]) == 48
    assert out.loc[0, "scrubbed_text"].endswith(out.loc[0, "scrubbed_tail"])
