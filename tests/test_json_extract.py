"""JSON-CSS extraction + CSS selector engine."""

import json

import pyarrow as pa

from crawl4ai_ray.functions.cssselect import select
from crawl4ai_ray.functions.htmlparse import parse_html
from crawl4ai_ray.stages.json_extract import (
    JsonCssExtractionStrategy,
    json_extract_batch,
)

HTML = """
<html><body>
<div id="products">
  <div class="item featured" data-sku="A1">
    <h2 class="name">Widget <em>Pro</em></h2>
    <span class="price">$19.99</span>
    <ul class="tags"><li>new</li><li>sale</li></ul>
    <div class="vendor"><span class="vname">Acme</span><span class="vid">7</span></div>
  </div>
  <div class="item" data-sku="B2">
    <h2 class="name">Gadget</h2>
    <span class="price">$5.00</span>
    <ul class="tags"><li>used</li></ul>
  </div>
</div>
</body></html>
"""


class TestCssSelect:
    def setup_method(self):
        self.tree = parse_html(HTML)

    def test_class_and_tag(self):
        assert len(select(self.tree, "div.item")) == 2
        assert len(select(self.tree, ".featured")) == 1
        assert len(select(self.tree, "li")) == 3

    def test_id(self):
        assert select(self.tree, "#products")[0].tag == "div"

    def test_attribute(self):
        assert len(select(self.tree, "[data-sku]")) == 2
        assert len(select(self.tree, '[data-sku="A1"]')) == 1
        assert len(select(self.tree, '[data-sku^=B]')) == 1
        assert len(select(self.tree, '[data-sku*="1"]')) == 1

    def test_descendant_and_child(self):
        assert len(select(self.tree, "div.item .vname")) == 1
        assert len(select(self.tree, "ul > li")) == 3
        assert len(select(self.tree, "div > li")) == 0

    def test_comma_list_document_order(self):
        got = [n.tag for n in select(self.tree, "h2, span.price")]
        assert got == ["h2", "span", "h2", "span"]

    def test_nth_of_type(self):
        lis = select(self.tree, "ul.tags li:nth-of-type(2)")
        assert len(lis) == 1 and lis[0].text_content() == "sale"


SCHEMA = {
    "name": "products",
    "baseSelector": "div.item",
    "baseFields": [
        {"name": "sku", "type": "attribute", "attribute": "data-sku"},
    ],
    "fields": [
        {"name": "name", "selector": "h2.name", "type": "text"},
        {"name": "price", "selector": ".price", "type": ["text", "regex"],
         "pattern": r"\$([\d.]+)", "group": 1},
        {"name": "tags", "selector": "ul.tags li", "type": "list",
         "fields": [{"name": "tag", "type": "text"}]},
        {"name": "vendor", "selector": ".vendor", "type": "nested",
         "fields": [{"name": "vname", "selector": ".vname", "type": "text"}]},
        {"name": "upper_name", "selector": "h2.name", "type": "text",
         "transform": "uppercase"},
        {"name": "missing", "selector": ".nope", "type": "text", "default": "n/a"},
        {"name": "label", "type": "computed",
         "function": lambda item: f"{item['name']}@{item['price']}"},
    ],
}


class TestJsonCss:
    def test_extract(self):
        items = JsonCssExtractionStrategy(SCHEMA).extract("u", HTML)
        assert len(items) == 2
        a, b = items
        assert a["sku"] == "A1"
        assert a["name"] == "Widget Pro"
        assert a["price"] == "19.99"
        assert [t["tag"] for t in a["tags"]] == ["new", "sale"]
        assert a["vendor"] == {"vname": "Acme"}
        assert a["upper_name"] == "WIDGET PRO"
        assert a["missing"] == "n/a"
        assert a["label"] == "Widget Pro@19.99"
        assert b["sku"] == "B2" and b["vendor"] == {}

    def test_expression_rejected(self):
        schema = {
            "baseSelector": "div.item",
            "fields": [{"name": "x", "type": "computed",
                        "expression": "1+1", "default": "blocked"}],
        }
        items = JsonCssExtractionStrategy(schema).extract("u", HTML)
        assert all(i["x"] == "blocked" for i in items)

    def test_batch_stage(self):
        batch = pa.table(
            {"url": ["p1", "p2"], "html": [HTML.encode(), b"<html><body></body></html>"]}
        )
        out = json_extract_batch(batch, SCHEMA)
        assert out.column("n_items").to_pylist() == [2, 0]
        items = json.loads(out.column("extracted_content").to_pylist()[0])
        assert items[0]["sku"] == "A1"


class TestJsonXPath:
    HTML = """
    <body>
      <div class="product" id="p1">
        <h2>Widget</h2>
        <span class="price" data-cur="EUR">9.99</span>
        <ul><li>red</li><li>blue</li></ul>
      </div>
      <div class="product" id="p2">
        <h2>Gadget</h2>
        <span class="price" data-cur="USD">19.99</span>
        <ul><li>green</li></ul>
      </div>
    </body>
    """

    def test_xpath_base_and_fields(self):
        from crawl4ai_ray.stages.json_extract import JsonXPathExtractionStrategy

        schema = {
            "baseSelector": "//div[@class='product']",
            "fields": [
                {"name": "title", "selector": ".//h2", "type": "text"},
                {"name": "price", "selector": ".//span[@class='price']", "type": "text"},
                {"name": "currency", "selector": ".//span[@class='price']", "type": "attribute", "attribute": "data-cur"},
                {"name": "colors", "selector": ".//li", "type": "list", "fields": [
                    {"name": "color", "type": "text"},
                ]},
            ],
        }
        out = JsonXPathExtractionStrategy(schema).extract("u", self.HTML)
        assert [o["title"] for o in out] == ["Widget", "Gadget"]
        assert out[0]["currency"] == "EUR"
        assert [c["color"] for c in out[0]["colors"]] == ["red", "blue"]

    def test_xpath_positional_and_contains(self):
        from crawl4ai_ray.functions.htmlparse import parse_html
        from crawl4ai_ray.functions.xpathlite import xpath_select

        t = parse_html(self.HTML)
        assert [n.get("id") for n in xpath_select(t, "//div[2]")] == ["p2"]
        assert [n.get("id") for n in xpath_select(t, "//div[contains(@class,'prod')]")] == ["p1", "p2"]
        assert xpath_select(t, "//span/@data-cur") == ["EUR", "USD"]
        assert [x.strip() for x in xpath_select(t, "//div[@id='p2']//h2/text()")] == ["Gadget"]
        assert [n.get("id") for n in xpath_select(t, "//div[last()]")] == ["p2"]

    def test_css_fallback(self):
        from crawl4ai_ray.stages.json_extract import JsonXPathExtractionStrategy

        schema = {
            "baseSelector": "div.product",
            "fields": [{"name": "title", "selector": "h2", "type": "text"}],
        }
        out = JsonXPathExtractionStrategy(schema).extract("u", self.HTML)
        assert [o["title"] for o in out] == ["Widget", "Gadget"]

    def test_unsupported_raises(self):
        import pytest

        from crawl4ai_ray.functions.htmlparse import parse_html
        from crawl4ai_ray.functions.xpathlite import XPathError, xpath_select

        with pytest.raises(XPathError):
            xpath_select(parse_html("<p>x</p>"), "//p[position() mod 2 = 0]")
