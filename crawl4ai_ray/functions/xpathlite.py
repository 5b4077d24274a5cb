"""Minimal XPath evaluator over the htmlparse Node tree.

Covers the selector subset the reference's
``JsonXPathExtractionStrategy`` (extraction_strategy.py:2449-2520)
exercises in its schemas and its basic CSS-to-XPath conversion:

* axes: ``/`` (child), ``//`` (descendant-or-self), leading ``.``
  (relative), ``*`` wildcard
* predicates, combinable: ``[@attr]``, ``[@attr='v']``, ``[N]``
  (1-based position within the parent context, XPath semantics),
  ``[last()]``, ``[contains(@attr,'v')]``
* trailing ``/text()`` and ``/@attr`` value selections

Unsupported constructs raise ``XPathError`` — a silent wrong answer is
worse than a loud one.
"""

from __future__ import annotations

import re
from typing import List, Union

from .htmlparse import Node

__all__ = ["xpath_select", "XPathError"]


class XPathError(ValueError):
    pass


_STEP_RE = re.compile(r"^([A-Za-z][\w.-]*|\*)((?:\[[^\]]*\])*)$")
_PRED_RE = re.compile(r"\[([^\]]*)\]")
_ATTR_EQ = re.compile(r"""^@([\w:-]+)\s*=\s*(['"])(.*)\2$""")
_ATTR_HAS = re.compile(r"^@([\w:-]+)$")
_CONTAINS = re.compile(r"""^contains\(\s*@([\w:-]+)\s*,\s*(['"])(.*)\2\s*\)$""")


def _tokenize(expr: str) -> list[tuple[str, str]]:
    """-> [(axis, step)] with axis in {'child', 'desc'}."""
    expr = expr.strip()
    if expr.startswith("."):
        expr = expr[1:]
    steps: list[tuple[str, str]] = []
    i = 0
    axis = "child"
    if expr.startswith("//"):
        axis, i = "desc", 2
    elif expr.startswith("/"):
        axis, i = "child", 1
    buf = ""
    depth = 0
    while i < len(expr):
        ch = expr[i]
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "/" and depth == 0:
            if not buf:
                raise XPathError(f"empty step in {expr!r}")
            steps.append((axis, buf))
            buf = ""
            if expr[i : i + 2] == "//":
                axis, i = "desc", i + 2
            else:
                axis, i = "child", i + 1
            continue
        buf += ch
        i += 1
    if buf:
        steps.append((axis, buf))
    if not steps:
        raise XPathError(f"empty expression {expr!r}")
    return steps


def _children_elems(node: Node) -> list[Node]:
    return [c for c in node.children if isinstance(c, Node) and not c.tag.startswith("#")]


def _descendants(node: Node) -> list[Node]:
    """Element descendants in document (pre-)order."""
    out: list[Node] = []

    def walk(n: Node) -> None:
        for c in _children_elems(n):
            out.append(c)
            walk(c)

    walk(node)
    return out


def _apply_step(contexts: list[Node], axis: str, step: str):
    m = _STEP_RE.match(step)
    if not m:
        raise XPathError(f"unsupported step {step!r}")
    name, preds_raw = m.group(1), m.group(2)
    preds = _PRED_RE.findall(preds_raw or "")

    result: list[Node] = []
    seen_ids: set[int] = set()
    for ctx in contexts:
        pool = _descendants(ctx) if axis == "desc" else _children_elems(ctx)
        group = [n for n in pool if name == "*" or n.tag == name]
        for pred in preds:
            group = _apply_predicate(group, pred)
        for n in group:
            if id(n) not in seen_ids:
                seen_ids.add(id(n))
                result.append(n)
    return result


def _apply_predicate(group: list[Node], pred: str) -> list[Node]:
    pred = pred.strip()
    if pred.isdigit():
        k = int(pred)
        return [group[k - 1]] if 1 <= k <= len(group) else []
    if pred == "last()":
        return [group[-1]] if group else []
    m = _ATTR_EQ.match(pred)
    if m:
        return [n for n in group if n.get(m.group(1)) == m.group(3)]
    m = _CONTAINS.match(pred)
    if m:
        return [n for n in group if m.group(3) in n.get(m.group(1), "")]
    m = _ATTR_HAS.match(pred)
    if m:
        return [n for n in group if m.group(1) in n.attrs]
    raise XPathError(f"unsupported predicate [{pred}]")


def xpath_select(root: Node, expr: str) -> List[Union[Node, str]]:
    """Evaluate ``expr`` from ``root``; element steps return Nodes,
    trailing ``text()`` / ``@attr`` return strings."""
    steps = _tokenize(expr)
    tail_mode = None  # None | 'text' | ('attr', name)
    last_axis, last_step = steps[-1]
    if last_step == "text()":
        tail_mode = "text"
        steps = steps[:-1]
    elif last_step.startswith("@"):
        tail_mode = ("attr", last_step[1:])
        steps = steps[:-1]

    contexts = [root]
    for axis, step in steps:
        contexts = _apply_step(contexts, axis, step)
        if not contexts:
            break

    if tail_mode is None:
        return contexts
    if tail_mode == "text":
        texts: list[str] = []
        for n in contexts:
            texts.extend(c for c in n.children if isinstance(c, str))
        return texts
    attr = tail_mode[1]
    return [n.get(attr) for n in contexts if attr in n.attrs]
