#!/usr/bin/env python
"""Generate API reference pages (docs/api/*.md) from package docstrings.

The reference ships a mkdocs site with mkdocstrings-generated API pages
(`/root/reference/mkdocs.yml`, `docs/content/api/`); this repo's equivalent
walks `rl4co_tpu` with `ast` (no imports — safe to run without JAX touching
any backend) and emits one markdown page per subpackage: module docstring,
public classes with their public methods, public functions, each with
signature and first docstring paragraph.

Usage:  python docs/gen_api.py        (rewrites docs/api/)
"""

from __future__ import annotations

import ast
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "rl4co_tpu")
OUT = os.path.join(ROOT, "docs", "api")

# one page per top-level unit; None groups the root modules
PAGES = {
    "core": ["__init__.py", "decoding.py", "trainer.py", "checkpoint.py",
             "loggers.py", "meta.py", "train.py"],
    "envs": ["envs"],
    "models": ["models"],
    "rl": ["rl"],
    "data": ["data"],
    "tasks": ["tasks"],
    "parallel": ["parallel"],
    "ops": ["ops"],
    "native": ["native"],
    "utils": ["utils"],
}


def _sig(node: ast.FunctionDef) -> str:
    try:
        return f"({ast.unparse(node.args)})"
    except Exception:
        return "(...)"


def _first_para(doc: str | None) -> str:
    if not doc:
        return ""
    return doc.strip().split("\n\n")[0].replace("\n", " ")


def _full_doc(doc: str | None) -> str:
    return (doc or "").strip()


def module_files(entry: str):
    path = os.path.join(PKG, entry)
    if os.path.isfile(path):
        yield entry, path
        return
    for dirpath, _, files in sorted(os.walk(path)):
        for f in sorted(files):
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, f), PKG)
                yield rel, os.path.join(dirpath, f)


def render_module(rel: str, path: str) -> str:
    try:
        tree = ast.parse(open(path).read())
    except SyntaxError:
        return ""
    modname = "rl4co_tpu." + rel[:-3].replace(os.sep, ".").replace(
        ".__init__", "")
    lines = [f"## `{modname}`\n"]
    moddoc = ast.get_docstring(tree)
    if moddoc:
        lines.append(_full_doc(moddoc) + "\n")
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            lines.append(f"### class `{node.name}`\n")
            doc = _first_para(ast.get_docstring(node))
            if doc:
                lines.append(doc + "\n")
            for sub in node.body:
                if (isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef))
                        and not sub.name.startswith("_")):
                    d = _first_para(ast.get_docstring(sub))
                    lines.append(f"- **`{sub.name}{_sig(sub)}`** — {d}" if d
                                 else f"- **`{sub.name}{_sig(sub)}`**")
            lines.append("")
        elif (isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
              and not node.name.startswith("_")):
            lines.append(f"### `{node.name}{_sig(node)}`\n")
            doc = _first_para(ast.get_docstring(node))
            if doc:
                lines.append(doc + "\n")
    return "\n".join(lines) if len(lines) > 1 else ""


def main():
    os.makedirs(OUT, exist_ok=True)
    index = ["# API reference\n",
             "Generated from module docstrings by `docs/gen_api.py` "
             "(regenerate after changing public APIs).\n"]
    for page, entries in PAGES.items():
        chunks = [f"# `rl4co_tpu` — {page}\n"]
        for entry in entries:
            for rel, path in module_files(entry):
                md = render_module(rel, path)
                if md:
                    chunks.append(md)
        with open(os.path.join(OUT, f"{page}.md"), "w") as f:
            f.write("\n".join(chunks))
        index.append(f"- [{page}]({page}.md)")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(PAGES)} pages to {OUT}")


if __name__ == "__main__":
    main()
