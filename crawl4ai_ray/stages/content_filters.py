"""Content filters — the fit-markdown path (SURVEY §2.4).

* ``PruningContentFilter`` models crawl4ai
  ``content_filter_strategy.py:541-805``: remove comments + excluded
  boilerplate tags {nav, footer, header, aside, script, style, form,
  iframe, noscript}; recursively score each element with the composite
  metric (text_density .4, link_density .2, tag_weight .2,
  class_id_weight .1, log-text_length .1 — :757-792), prune subtrees
  below the fixed threshold 0.48 (or the dynamic tag-importance
  variant :732-748); preserve_classes/preserve_tags whitelist; return
  the surviving body children as HTML strings. Arithmetic follows the
  reference's order of operations (same weights, same ``score /
  total_weight`` normalization, ``max(0, class_id)`` clip).

* ``BM25ContentFilter`` models :381-538: page query from
  title/h1/meta (fallback: first >150-char paragraph, :125-159);
  stack-based DFS text-chunk extraction preserving document order
  (:161-271); BM25-Okapi scoring (k1=1.5, b=0.75, eps=0.25 — the
  rank_bm25 defaults the reference relies on) x priority-tag weights
  (h1 5.0 ... th 1.5, :425-437); threshold filter; doc-order sort;
  keep-first text dedup; ``clean_element`` re-render (:322-380).
  Deviation: snowball stemming is unavailable in this environment, so
  ``use_stemming`` defaults to False (documented; the reference's
  no-stemming branch at :488-492 is what we replicate).

Both are **stateless** per-page kernels plugged into the extract
``map_batches`` stage (markdown.generate_markdown's content_filter
seam).
"""

from __future__ import annotations

import math
import re
from collections import deque
from typing import List, Optional

from ..functions.htmlparse import Node, parse_html

EXCLUDED_TAGS = frozenset(
    {"nav", "footer", "header", "aside", "script", "style", "form", "iframe", "noscript"}
)
_NEGATIVE_RE = re.compile(
    r"nav|footer|header|sidebar|ads|comment|promo|advert|social|share", re.I
)

# clean_tokens semantics (crawl4ai/utils.py:2565-2792): drop tokens of
# len<=2, arrow-prefixed tokens, and English function words (articles,
# pronouns, auxiliaries, prepositions, conjunctions, wh-words, modals).
_STOP = frozenset(
    """a an the and are as at be by for from has he in is it its of on that to was
were will with i you she we they me him her us them my your his our their mine
yours hers ours theirs myself yourself himself herself itself ourselves
themselves am been being have had having do does did doing about above across
after against along among around before behind below beneath beside between
beyond down during except inside into near off out outside over past through
toward under underneath until up upon within but or nor yet so although because
since unless this these those what which who whom whose when where why how all
any both each few more most other some such can cannot can't could couldn't may
might must mustn't shall should shouldn't won't would wouldn't not n't no none
ccp""".split()
)


def clean_tokens(tokens: List[str]) -> List[str]:
    return [
        t
        for t in tokens
        if len(t) > 2
        and t not in _STOP
        and not t.startswith(("↑", "▲", "⬆"))
    ]


def _stripped_text(node: Node) -> str:
    """BeautifulSoup get_text(strip=True) equivalent: each text node
    stripped, concatenated without separator."""
    parts: List[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                s = c.strip()
                if s:
                    parts.append(s)
            elif c.tag != "#comment":
                walk(c)

    walk(node)
    return "".join(parts)


def _inner_html_len(node: Node) -> int:
    return sum(
        len(c) if isinstance(c, str) else len(c.serialize()) for c in node.children
    )


class PruningContentFilter:
    """Composite-score tree pruning (fit-markdown)."""

    TAG_WEIGHTS = {
        "div": 0.5, "p": 1.0, "article": 1.5, "section": 1.0, "span": 0.3,
        "li": 0.5, "ul": 0.5, "ol": 0.5, "h1": 1.2, "h2": 1.1, "h3": 1.0,
        "h4": 0.9, "h5": 0.8, "h6": 0.7,
    }
    TAG_IMPORTANCE = {
        "article": 1.5, "main": 1.4, "section": 1.3, "p": 1.2, "h1": 1.4,
        "h2": 1.3, "h3": 1.2, "div": 0.7, "span": 0.6,
    }
    WEIGHTS = {
        "text_density": 0.4,
        "link_density": 0.2,
        "tag_weight": 0.2,
        "class_id_weight": 0.1,
        "text_length": 0.1,
    }

    def __init__(
        self,
        user_query: Optional[str] = None,
        min_word_threshold: Optional[int] = None,
        threshold_type: str = "fixed",
        threshold: float = 0.48,
        preserve_classes: Optional[list] = None,
        preserve_tags: Optional[list] = None,
    ):
        self.min_word_threshold = min_word_threshold
        self.threshold_type = threshold_type
        self.threshold = threshold
        self.preserve_classes = set(preserve_classes or [])
        self.preserve_tags = set(preserve_tags or [])

    # -- protocol: tree -> list of surviving HTML fragments ---------------
    def filter_tree(self, tree: Node) -> List[str]:
        body = tree.find("body") or tree
        body.remove_children(lambda n: n.tag == "#comment" or n.tag in EXCLUDED_TAGS)
        if self._prune(body):
            # the body/root itself scored below threshold — the
            # reference decomposes it, leaving no blocks
            return []
        out = []
        for c in body.children:
            if isinstance(c, Node) and _stripped_text(c):
                out.append(c.serialize())
        return out

    def filter_content(self, html: str) -> List[str]:
        if not html or not isinstance(html, str):
            return []
        return self.filter_tree(parse_html(html))

    __call__ = filter_tree

    def _is_preserved(self, node: Node) -> bool:
        if self.preserve_tags and node.tag in self.preserve_tags:
            return True
        if self.preserve_classes and node.get("class"):
            if set(node.classes()) & self.preserve_classes:
                return True
        return False

    def _prune(self, node: Node) -> bool:
        """Prune the subtree; returns True when ``node`` itself was
        removed (callers holding a detached root need to know)."""
        if self._is_preserved(node):
            return False
        text = _stripped_text(node)
        text_len = len(text)
        tag_len = _inner_html_len(node)
        link_text_len = 0
        for c in node.children:
            if isinstance(c, Node) and c.tag == "a":
                # reference uses a.string: the sole text child, if any
                strings = [x for x in c.children if isinstance(x, str)]
                if len(c.children) == 1 and strings:
                    link_text_len += len(strings[0].strip())

        score = self._composite_score(node, text, text_len, tag_len, link_text_len)

        if self.threshold_type == "fixed":
            should_remove = score < self.threshold
        else:
            importance = self.TAG_IMPORTANCE.get(node.tag, 0.7)
            text_ratio = text_len / tag_len if tag_len > 0 else 0
            link_ratio = link_text_len / text_len if text_len > 0 else 1
            threshold = self.threshold
            if importance > 1:
                threshold *= 0.8
            if text_ratio > 0.4:
                threshold *= 0.9
            if link_ratio > 0.6:
                threshold *= 1.2
            should_remove = score < threshold

        if should_remove:
            node.remove()
            return True
        for child in [c for c in node.children if isinstance(c, Node)]:
            self._prune(child)
        return False

    def _composite_score(
        self, node: Node, text: str, text_len: int, tag_len: int, link_text_len: int
    ) -> float:
        if self.min_word_threshold:
            word_count = text.count(" ") + 1
            if word_count < self.min_word_threshold:
                return -1.0
        score = 0.0
        total_weight = 0.0
        w = self.WEIGHTS
        score += w["text_density"] * (text_len / tag_len if tag_len > 0 else 0)
        total_weight += w["text_density"]
        score += w["link_density"] * (
            1 - (link_text_len / text_len if text_len > 0 else 0)
        )
        total_weight += w["link_density"]
        score += w["tag_weight"] * self.TAG_WEIGHTS.get(node.tag, 0.5)
        total_weight += w["tag_weight"]
        score += w["class_id_weight"] * max(0, self._class_id_weight(node))
        total_weight += w["class_id_weight"]
        score += w["text_length"] * math.log(text_len + 1)
        total_weight += w["text_length"]
        return score / total_weight if total_weight > 0 else 0

    def _class_id_weight(self, node: Node) -> float:
        s = 0.0
        cls = node.get("class")
        if cls and _NEGATIVE_RE.match(cls):
            s -= 0.5
        nid = node.get("id")
        if nid and _NEGATIVE_RE.match(nid):
            s -= 0.5
        return s


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


class BM25Okapi:
    """BM25-Okapi with rank_bm25's defaults and negative-idf epsilon
    flooring (the scoring the reference delegates to rank_bm25)."""

    def __init__(self, corpus: List[List[str]], k1: float = 1.5, b: float = 0.75, epsilon: float = 0.25):
        self.k1, self.b, self.epsilon = k1, b, epsilon
        self.corpus_size = len(corpus)
        self.doc_len = [len(d) for d in corpus]
        self.avgdl = sum(self.doc_len) / self.corpus_size if self.corpus_size else 0.0
        self.doc_freqs: List[dict] = []
        nd: dict = {}
        for doc in corpus:
            freqs: dict = {}
            for t in doc:
                freqs[t] = freqs.get(t, 0) + 1
            self.doc_freqs.append(freqs)
            for t in freqs:
                nd[t] = nd.get(t, 0) + 1
        self.idf: dict = {}
        negative = []
        idf_sum = 0.0
        for t, n in nd.items():
            idf = math.log(self.corpus_size - n + 0.5) - math.log(n + 0.5)
            self.idf[t] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(t)
        avg_idf = idf_sum / len(self.idf) if self.idf else 0.0
        for t in negative:
            self.idf[t] = self.epsilon * avg_idf

    def get_scores(self, query: List[str]) -> List[float]:
        scores = [0.0] * self.corpus_size
        for t in query:
            idf = self.idf.get(t)
            if idf is None:
                continue
            for i, freqs in enumerate(self.doc_freqs):
                f = freqs.get(t, 0)
                if not f:
                    continue
                denom = f + self.k1 * (1 - self.b + self.b * self.doc_len[i] / self.avgdl)
                scores[i] += idf * (f * (self.k1 + 1) / denom)
        return scores


_INLINE_TAGS = frozenset(
    """a abbr acronym b bdo big br button cite code dfn em i img input kbd label
map object q samp script select small span strong sub sup textarea time tt
var""".split()
)
_HEADER_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "header"})
_CLEAN_UNWANTED_TAGS = frozenset({"script", "style", "aside", "form", "iframe", "noscript"})
_CLEAN_UNWANTED_ATTRS = frozenset(
    {"style", "onclick", "onmouseover", "align", "bgcolor", "class", "id"}
)


def clean_element(node: Node) -> str:
    """Re-render an element dropping unwanted tags/attrs
    (content_filter_strategy.py:322-380)."""
    builder: List[str] = []

    def render(elem) -> None:
        if isinstance(elem, str):
            builder.append(elem.strip())
            return
        if elem.tag in _CLEAN_UNWANTED_TAGS or elem.tag == "#comment":
            return
        builder.append(f"<{elem.tag}")
        for k, v in elem.attrs.items():
            if k not in _CLEAN_UNWANTED_ATTRS:
                builder.append(f' {k}="{v}"')
        builder.append(">")
        for c in elem.children:
            render(c)
        builder.append(f"</{elem.tag}>")

    render(node)
    return "".join(builder)


class BM25ContentFilter:
    """BM25 relevance filter over document-order text chunks."""

    PRIORITY_TAGS = {
        "h1": 5.0, "h2": 4.0, "h3": 3.0, "title": 4.0, "strong": 2.0,
        "b": 1.5, "em": 1.5, "blockquote": 2.0, "code": 2.0, "pre": 1.5,
        "th": 1.5,
    }

    def __init__(
        self,
        user_query: Optional[str] = None,
        bm25_threshold: float = 1.0,
        use_stemming: bool = False,
    ):
        self.user_query = user_query
        self.bm25_threshold = bm25_threshold
        self.use_stemming = use_stemming  # snowball unavailable; see module doc

    def extract_page_query(self, tree: Node, body: Node) -> str:
        if self.user_query:
            return self.user_query
        parts: List[str] = []
        title = tree.find("title")
        if title is not None and title.text_content():
            parts.append(title.text_content())
        h1 = tree.find("h1")
        if h1 is not None:
            parts.append(h1.text_content())
        temp = ""
        for m in tree.iter("meta"):
            if m.get("name") in ("keywords", "description") and m.get("content"):
                parts.append(m.get("content"))
                temp += m.get("content")
        if not temp:
            for p in body.iter("p"):
                t = p.text_content()
                if len(t) > 150:
                    parts.append(t[:150])
                    break
        return " ".join(filter(None, parts))

    def extract_text_chunks(self, body: Node, min_word_threshold: Optional[int] = None):
        """Iterative DFS chunker preserving document order
        (content_filter_strategy.py:161-271)."""
        chunks = []
        current_text: List[str] = []
        chunk_index = 0

        def should_break(tag: Node) -> bool:
            return tag.tag not in _INLINE_TAGS and not (
                tag.tag == "p" and len(current_text) == 0
            )

        stack = deque([(body, False)])
        while stack:
            element, visited = stack.pop()
            if visited:
                if current_text and should_break(element):
                    text = " ".join("".join(current_text).split())
                    if text:
                        tag_type = "header" if element.tag in _HEADER_TAGS else "content"
                        chunks.append((chunk_index, text, tag_type, element))
                        chunk_index += 1
                    current_text = []
                continue
            if isinstance(element, str):
                if element.strip():
                    current_text.append(element.strip())
                continue
            if element.tag == "#comment":
                continue
            children = list(element.children)
            if not children:
                continue
            stack.append((element, True))
            for child in reversed(children):
                stack.append((child, False))
        if current_text:
            text = " ".join("".join(current_text).split())
            if text:
                chunks.append((chunk_index, text, "content", body))
        if min_word_threshold:
            chunks = [c for c in chunks if len(c[1].split()) >= min_word_threshold]
        return chunks

    def filter_tree(self, tree: Node, min_word_threshold: Optional[int] = None) -> List[str]:
        body = tree.find("body") or tree
        query = self.extract_page_query(tree, body)
        if not query:
            return []
        candidates = self.extract_text_chunks(body, min_word_threshold)
        if not candidates:
            return []
        tokenized_corpus = [clean_tokens(c[1].lower().split()) for c in candidates]
        tokenized_query = clean_tokens(query.lower().split())
        bm25 = BM25Okapi(tokenized_corpus)
        scores = bm25.get_scores(tokenized_query)
        selected = []
        for score, (index, chunk, _type, tag) in zip(scores, candidates):
            adjusted = score * self.PRIORITY_TAGS.get(tag.tag, 1.0)
            if adjusted >= self.bm25_threshold:
                selected.append((index, chunk, tag))
        if not selected:
            return []
        selected.sort(key=lambda x: x[0])
        seen = set()
        unique = []
        for index, chunk, tag in selected:
            if chunk not in seen:
                seen.add(chunk)
                unique.append((index, chunk, tag))
        return [clean_element(tag) for _, _, tag in unique]

    def filter_content(self, html: str, min_word_threshold: Optional[int] = None) -> List[str]:
        if not html or not isinstance(html, str):
            return []
        return self.filter_tree(parse_html(html), min_word_threshold)

    __call__ = filter_tree
