"""Schema-driven structured extraction (JSON-CSS strategy).

Models ``JsonElementExtractionStrategy`` / ``JsonCssExtractionStrategy``
(crawl4ai/extraction_strategy.py:1043-1308, 1989-…): a schema of
``{name, baseSelector, baseFields, fields}`` where each field is
``{name, selector?, type, ...}`` with types

* ``text`` / ``attribute`` / ``html`` / ``regex`` (single values;
  ``type`` may be a pipeline list, e.g. ``["text", "regex"]``)
* ``nested`` (one sub-object), ``list`` (list of flat items),
  ``nested_list`` (list of sub-objects)
* ``computed`` (``function`` callable over the partial item;
  string ``expression`` is rejected like the reference does)
* ``transform``: lowercase / uppercase / strip; ``default`` fallback

Ray mapping: stateless ``map_batches`` stage; the schema is a plain
dict captured in the task closure (broadcast once per worker by Ray's
closure serialization). Output is one JSON string per page (matching
the reference's ``extracted_content``) plus an exploded row-per-item
variant for relational downstreams.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List

import pyarrow as pa

from ..functions.cssselect import select
from ..functions.htmlparse import Node, parse_html


class JsonCssExtractionStrategy:
    DEL = "\n"

    def __init__(self, schema: Dict[str, Any], verbose: bool = False):
        self.schema = schema
        self.verbose = verbose

    # -- element primitives (abstract methods in the reference) -----------
    def _parse_html(self, html: str | bytes) -> Node:
        return parse_html(html)

    def _get_base_elements(self, parsed: Node, selector: str) -> List[Node]:
        return select(parsed, selector)

    def _get_elements(self, element: Node, selector: str) -> List[Node]:
        return select(element, selector)

    def _get_element_text(self, element: Node) -> str:
        return element.text_content().strip()

    def _get_element_html(self, element: Node) -> str:
        return element.serialize()

    def _get_element_attribute(self, element: Node, attribute: str):
        return element.attrs.get(attribute)

    # -- schema walk -------------------------------------------------------
    def extract(self, url: str, html_content: str | bytes) -> List[Dict[str, Any]]:
        parsed = self._parse_html(html_content)
        results = []
        for element in self._get_base_elements(parsed, self.schema["baseSelector"]):
            item: Dict[str, Any] = {}
            for field in self.schema.get("baseFields", []):
                value = self._extract_single_field(element, field)
                if value is not None:
                    item[field["name"]] = value
            item.update(self._extract_item(element, self.schema["fields"]))
            if item:
                results.append(item)
        return results

    def run(self, url: str, sections: List[str]) -> List[Dict[str, Any]]:
        return self.extract(url, self.DEL.join(sections))

    def _extract_item(self, element: Node, fields: List[dict]) -> Dict[str, Any]:
        item: Dict[str, Any] = {}
        for field in fields:
            if field["type"] == "computed":
                value = self._compute_field(item, field)
            else:
                value = self._extract_field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    def _extract_field(self, element: Node, field: dict):
        try:
            ftype = field["type"]
            if ftype == "nested":
                nested = self._get_elements(element, field["selector"])
                return self._extract_item(nested[0], field["fields"]) if nested else {}
            if ftype == "list":
                els = self._get_elements(element, field["selector"])
                return [self._extract_list_item(el, field["fields"]) for el in els]
            if ftype == "nested_list":
                els = self._get_elements(element, field["selector"])
                return [self._extract_item(el, field["fields"]) for el in els]
            return self._extract_single_field(element, field)
        except Exception:
            return field.get("default")

    def _extract_list_item(self, element: Node, fields: List[dict]) -> Dict[str, Any]:
        item = {}
        for field in fields:
            value = self._extract_single_field(element, field)
            if value is not None:
                item[field["name"]] = value
        return item

    def _extract_single_field(self, element: Node, field: dict):
        if "selector" in field:
            selected = self._get_elements(element, field["selector"])
            if not selected:
                return field.get("default")
            selected = selected[0]
        else:
            selected = element

        pipeline = field["type"]
        if not isinstance(pipeline, list):
            pipeline = [pipeline]
        value: Any = selected
        for step in pipeline:
            if step == "text":
                value = self._get_element_text(value)
            elif step == "attribute":
                value = self._get_element_attribute(value, field["attribute"])
            elif step == "html":
                value = self._get_element_html(value)
            elif step == "regex":
                pattern = field.get("pattern")
                if pattern:
                    if not isinstance(value, str):
                        value = self._get_element_text(value)
                    m = re.search(pattern, value) if isinstance(value, str) else None
                    value = m.group(field.get("group", 1)) if m else None
            if value is None:
                break

        if "transform" in field and value is not None:
            value = self._apply_transform(value, field["transform"])
        return value if value is not None else field.get("default")

    @staticmethod
    def _apply_transform(value, transform: str):
        if transform == "lowercase":
            return value.lower()
        if transform == "uppercase":
            return value.upper()
        if transform == "strip":
            return value.strip()
        return value

    def _compute_field(self, item: dict, field: dict):
        try:
            if "expression" in field:
                # eval on untrusted input is rejected, like the
                # reference (extraction_strategy.py:1292-1300)
                return field.get("default")
            if "function" in field:
                return field["function"](item)
        except Exception:
            return field.get("default")


class JsonXPathExtractionStrategy(JsonCssExtractionStrategy):
    """XPath-selector variant (reference JsonXPathExtractionStrategy,
    extraction_strategy.py:2449-2520): schema selectors containing a
    ``/`` are evaluated as XPath over the Node tree
    (functions/xpathlite.py); plain selectors fall back to the CSS
    engine — the same dual behavior as the reference's
    ``_css_to_xpath`` passthrough."""

    def _select(self, root, selector: str):
        from ..functions.xpathlite import xpath_select

        if "/" in selector:
            return [n for n in xpath_select(root, selector) if isinstance(n, Node)]
        return select(root, selector)

    def _get_base_elements(self, parsed: Node, selector: str) -> List[Node]:
        return self._select(parsed, selector)

    def _get_elements(self, element: Node, selector: str) -> List[Node]:
        return self._select(element, selector)


def json_extract_batch(
    batch: pa.Table,
    schema: Dict[str, Any],
    html_column: str = "html",
    key_column: str = "url",
) -> pa.Table:
    """map_batches stage: pages -> (key, extracted_content JSON str,
    n_items)."""
    strategy = JsonCssExtractionStrategy(schema)
    keys = batch.column(key_column).to_pylist()
    htmls = batch.column(html_column).to_pylist()
    out_json, out_n = [], []
    for k, h in zip(keys, htmls):
        items = strategy.extract(k, h if h is not None else b"")
        out_json.append(json.dumps(items, ensure_ascii=False))
        out_n.append(len(items))
    return pa.table(
        {
            key_column: pa.array(keys),
            "extracted_content": pa.array(out_json, pa.string()),
            "n_items": pa.array(out_n, pa.int32()),
        }
    )
