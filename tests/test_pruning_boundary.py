"""PruningContentFilter float-parity spec fixtures.

The reference arithmetic (content_filter_strategy.py:615-621 composite
weights, :757-792 score, :732-748 dynamic threshold) is re-derived
HERE, independently of the implementation, and every generated
threshold-straddling fixture asserts that the filter's keep/prune
decision lands on the side the spec formula dictates — including
configurations whose score sits within ~1e-3 of the 0.48 threshold.
bs4 is unavailable, so this pins the ported arithmetic (order of
operations, weights, normalization, the max(0, class_id) clip) rather
than byte-comparing against the reference process.
"""

import math

from crawl4ai_ray.functions.htmlparse import parse_html
from crawl4ai_ray.stages.content_filters import PruningContentFilter

THRESHOLD = 0.48


def spec_composite(tag, text_len, tag_len, link_text_len, class_neg=False):
    """content_filter_strategy.py:757-792, verbatim formula."""
    score = 0.0
    total = 0.0
    score += 0.4 * (text_len / tag_len if tag_len > 0 else 0)
    total += 0.4
    score += 0.2 * (1 - (link_text_len / text_len if text_len > 0 else 0))
    total += 0.2
    tag_weights = {
        "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
        "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
        "h4": 0.9, "h5": 0.8, "h6": 0.7,
    }
    score += 0.2 * tag_weights.get(tag, 0.5)
    total += 0.2
    class_id = -0.5 if class_neg else 0.0
    score += 0.1 * max(0, class_id)
    total += 0.1
    score += 0.1 * math.log(text_len + 1)
    total += 0.1
    return score / total


def spec_dynamic_threshold(tag, text_len, tag_len, link_text_len):
    """content_filter_strategy.py:732-748."""
    importance = {
        "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
        "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
    }.get(tag, 0.7)
    text_ratio = text_len / tag_len if tag_len > 0 else 0
    link_ratio = link_text_len / text_len if text_len > 0 else 1
    t = THRESHOLD
    if importance > 1:
        t *= 0.8
    if text_ratio > 0.4:
        t *= 0.9
    if link_ratio > 0.6:
        t *= 1.2
    return t


KEEP_SIBLING = "<p>" + "anchor keeps ancestors alive " * 8 + "</p>"


def _run_filter(div_inner, threshold_type="fixed"):
    html = f"<body><section><div>{div_inner}</div>{KEEP_SIBLING}</section></body>"
    f = PruningContentFilter(threshold_type=threshold_type)
    blocks = f.filter_tree(parse_html(html))
    joined = "".join(blocks)
    return "<div>" in joined


class TestFixedThresholdBoundary:
    def test_link_heavy_div_sweep(self):
        """Sweep link lengths across the 0.48 crossing (the spec score
        passes through the threshold between lA=6 and lA=7)."""
        crossings = 0
        prev_side = None
        for lA in range(1, 40):
            text = "x" * lA
            text_len = lA
            tag_len = lA + 7  # <a>text</a>
            expect_keep = (
                spec_composite("div", text_len, tag_len, lA) >= THRESHOLD
            )
            got_keep = _run_filter(f"<a>{text}</a>")
            assert got_keep == expect_keep, (lA, expect_keep)
            if prev_side is not None and expect_keep != prev_side:
                crossings += 1
            prev_side = expect_keep
        assert crossings >= 1  # the sweep genuinely straddled 0.48

    def test_mixed_text_and_link_sweep(self):
        for lA in range(1, 20):
            for lB in (0, 1, 3, 8):
                a = "y" * lA
                b = "z" * lB
                text_len = lA + lB
                tag_len = lA + 7 + lB
                expect_keep = (
                    spec_composite("div", text_len, tag_len, lA) >= THRESHOLD
                )
                got_keep = _run_filter(f"<a>{a}</a>{b}")
                assert got_keep == expect_keep, (lA, lB)

    def test_negative_class_is_clipped_to_zero(self):
        """max(0, class_id_score) means negative class patterns can
        never lower the composite — a reference quirk worth pinning."""
        for lA in (6, 7):
            plain = _run_filter(f"<a>{'x' * lA}</a>")
            html = (
                f'<body><section><div class="sidebar ads"><a>{"x" * lA}</a></div>'
                f"{KEEP_SIBLING}</section></body>"
            )
            f = PruningContentFilter()
            with_neg = "<div" in "".join(f.filter_tree(parse_html(html)))
            assert with_neg == plain


class TestDynamicThresholdBoundary:
    def test_dynamic_flips_where_spec_says(self):
        flips = 0
        for lA in range(1, 40):
            text_len, tag_len = lA, lA + 7
            s = spec_composite("div", text_len, tag_len, lA)
            t = spec_dynamic_threshold("div", text_len, tag_len, lA)
            expect_keep = s >= t
            got_keep = _run_filter(f"<a>{'x' * lA}</a>", threshold_type="dynamic")
            assert got_keep == expect_keep, (lA, s, t)
            flips += 1 if lA > 1 and expect_keep != prev else 0
            prev = expect_keep

    def test_importance_discount_for_p(self):
        # a <p> with link-only content: importance 1.2 > 1 discounts the
        # threshold by 0.8; verify the decision matches the spec on both
        # sides of the discounted threshold
        for lA in range(1, 30):
            text_len, tag_len = lA, lA + 7
            s = spec_composite("p", text_len, tag_len, lA)
            t = spec_dynamic_threshold("p", text_len, tag_len, lA)
            html = (
                f"<body><section><p><a>{'x' * lA}</a></p>"
                f"{KEEP_SIBLING}</section></body>"
            )
            f = PruningContentFilter(threshold_type="dynamic")
            blocks = "".join(f.filter_tree(parse_html(html)))
            got_keep = f"<a>{'x' * lA}</a>" in blocks
            assert got_keep == (s >= t), (lA, s, t)


class TestRootPruned:
    def test_whole_fragment_below_threshold_yields_empty(self):
        # a body whose own composite score is below 0.48 is decomposed
        # by the reference — no blocks survive
        f = PruningContentFilter(threshold=5.0)  # force root removal
        assert f.filter_content("<body><p>tiny</p></body>") == []
