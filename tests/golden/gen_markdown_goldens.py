"""Generate committed markdown parity goldens from the reference engine.

Run manually in an environment where the reference checkout exists at
``/root/reference`` (it is NOT needed at test time — tests read the
committed parquet):

    python tests/golden/gen_markdown_goldens.py

For every fixture in ``md_fixtures.FIXTURES`` this drives the
reference's own code:

* ``CustomHTML2Text`` (``crawl4ai/html2text/__init__.py``) under the
  ``DefaultMarkdownGenerator.generate_markdown`` default options
  (``markdown_generation_strategy.py:180-191``) plus the
  ``raw.replace("    ```", "```")`` post-fix (:214),
* the real ``DefaultMarkdownGenerator.convert_links_to_citations``
  (:82-146), extracted via ast so the module's unimportable dependency
  chain (OpenSSL et al.) is bypassed — the executed bytecode is the
  reference's own.

Output: ``tests/golden/markdown_goldens.parquet`` with columns
``fixture_id, baseurl, html, raw_markdown, markdown_with_citations,
references_markdown``.
"""

from __future__ import annotations

import ast
import importlib.util
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
REF_ROOT = "/root/reference/crawl4ai"
sys.path.insert(0, HERE)

from md_fixtures import FIXTURES, fixture_baseurl  # noqa: E402

GENERATOR_DEFAULTS = dict(
    body_width=0,
    ignore_emphasis=False,
    ignore_links=False,
    ignore_images=False,
    protect_links=False,
    single_line_break=True,
    mark_code=True,
    escape_snob=False,
)


def load_reference_html2text():
    spec = importlib.util.spec_from_file_location(
        "ref_html2text", os.path.join(REF_ROOT, "html2text", "__init__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_html2text"] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference_citations():
    """Compile the reference's LINK_PATTERN / fast_urljoin /
    convert_links_to_citations into a standalone callable."""
    src = open(os.path.join(REF_ROOT, "markdown_generation_strategy.py")).read()
    tree = ast.parse(src)
    wanted: list[ast.stmt] = []
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "LINK_PATTERN" for t in node.targets
        ):
            wanted.append(node)
        elif isinstance(node, ast.FunctionDef) and node.name == "fast_urljoin":
            wanted.append(node)
        elif isinstance(node, ast.ClassDef) and node.name == "DefaultMarkdownGenerator":
            for item in node.body:
                if (
                    isinstance(item, ast.FunctionDef)
                    and item.name == "convert_links_to_citations"
                ):
                    wanted.append(item)
    module = ast.Module(body=wanted, type_ignores=[])
    ast.fix_missing_locations(module)
    import re
    from urllib.parse import urljoin

    ns = {"re": re, "urljoin": urljoin, "Tuple": tuple}
    ns["__builtins__"] = __builtins__
    exec(compile(module, "<reference-citations>", "exec"), ns)
    fn = ns["convert_links_to_citations"]
    return lambda markdown, base_url: fn(None, markdown, base_url)


def main() -> None:
    ref = load_reference_html2text()
    cite = load_reference_citations()

    rows = {
        "fixture_id": [],
        "baseurl": [],
        "html": [],
        "raw_markdown": [],
        "markdown_with_citations": [],
        "references_markdown": [],
    }
    for fid, html in FIXTURES:
        baseurl = fixture_baseurl(fid)
        h = ref.CustomHTML2Text(baseurl=baseurl)
        h.update_params(**GENERATOR_DEFAULTS)
        raw = h.handle(html).replace("    ```", "```")
        cited, refs = cite(raw, baseurl)
        rows["fixture_id"].append(fid)
        rows["baseurl"].append(baseurl)
        rows["html"].append(html)
        rows["raw_markdown"].append(raw)
        rows["markdown_with_citations"].append(cited)
        rows["references_markdown"].append(refs)

    table = pa.table(rows)
    out = os.path.join(HERE, "markdown_goldens.parquet")
    pq.write_table(table, out, compression="zstd", row_group_size=4096)
    print(f"wrote {table.num_rows} goldens -> {out}")


if __name__ == "__main__":
    main()
