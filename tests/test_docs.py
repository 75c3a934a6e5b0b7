"""Docs hygiene: the API generator runs and the site's nav is complete."""

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(ROOT, "docs")


def test_api_generator_runs_and_is_fresh(tmp_path):
    """gen_api.py regenerates without error and the committed pages match
    (catch stale API docs after public-API changes)."""
    import shutil

    snapshot = {f: open(os.path.join(DOCS, "api", f)).read()
                for f in os.listdir(os.path.join(DOCS, "api"))}
    subprocess.run([sys.executable, os.path.join(DOCS, "gen_api.py")],
                   check=True, capture_output=True)
    for f, before in snapshot.items():
        after = open(os.path.join(DOCS, "api", f)).read()
        assert after == before, (
            f"docs/api/{f} is stale — rerun `python docs/gen_api.py` "
            "and commit the result")


def test_mkdocs_nav_files_exist():
    nav_files = re.findall(r":\s*([\w/]+\.md)\s*$",
                           open(os.path.join(DOCS, "mkdocs.yml")).read(),
                           re.MULTILINE)
    assert len(nav_files) >= 15
    for f in nav_files:
        assert os.path.exists(os.path.join(DOCS, f)), f"missing docs/{f}"


def test_guide_pages_cite_real_modules():
    """Paths named in guide pages must exist (docs drift guard)."""
    for page in ("environments.md", "models.md", "training.md",
                 "parallelism.md", "native.md"):
        text = open(os.path.join(DOCS, page)).read()
        for m in re.findall(r"`(rl4co_tpu/[\w/.]+?)`", text):
            assert os.path.exists(os.path.join(ROOT, m)), (
                f"{page} cites missing path {m}")
