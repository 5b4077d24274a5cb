"""Byte-parity of the markdown engine vs committed reference goldens.

Goldens were produced by the reference's vendored html2text engine and
its citation pass (tests/golden/gen_markdown_goldens.py); every fixture
must match byte-for-byte.
"""

import os

import pyarrow.parquet as pq
import pytest

from crawl4ai_ray.functions.markdown import generate_markdown

GOLDENS = os.path.join(
    os.path.dirname(__file__), "golden", "markdown_goldens.parquet"
)

_rows = pq.read_table(GOLDENS).to_pylist()


@pytest.mark.parametrize("row", _rows, ids=[r["fixture_id"] for r in _rows])
def test_markdown_byte_parity(row):
    result = generate_markdown(row["html"], base_url=row["baseurl"])
    assert result.raw_markdown == row["raw_markdown"]
    assert result.markdown_with_citations == row["markdown_with_citations"]
    assert result.references_markdown == row["references_markdown"]


@pytest.mark.parametrize("row", _rows, ids=[r["fixture_id"] for r in _rows])
def test_tree_replay_equivalence(row):
    """convert_tree(parse(serialize(tree))) must equal convert(string)
    over the serialized form — the hot-path replay shortcut used by the
    extract kernel."""
    from crawl4ai_ray.functions.htmlparse import parse_html
    from crawl4ai_ray.functions.md_engine import MarkdownEmitter

    def mk():
        e = MarkdownEmitter(baseurl=row["baseurl"])
        e.update_params(body_width=0, single_line_break=True, mark_code=True)
        return e

    tree = parse_html(row["html"])
    serialized = tree.serialize()
    assert mk().convert_tree(tree) == mk().convert(serialized)


def test_goldens_cover_every_fixture():
    from tests.golden.md_fixtures import FIXTURES

    assert {r["fixture_id"] for r in _rows} == {fid for fid, _ in FIXTURES}
