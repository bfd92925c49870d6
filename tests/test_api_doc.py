"""docs/API.md stays honest: every python snippet in it EXECUTES.

The doc promises its snippets run as-is on CPU; this test extracts the
fenced ``python`` blocks in order and execs them in one shared
namespace (they deliberately build on each other: the training block
defines ``cfg``/``state``/``sample`` that the eval, checkpoint and
serving blocks consume).  The only injected name is ``ckpt_dir`` — the
checkpointing block's one free variable, pointed at a tmp dir here.
"""

import os
import re

import pytest

_DOC = os.path.join(os.path.dirname(__file__), "..", "docs", "API.md")


def _python_blocks():
    with open(_DOC) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, re.DOTALL)


def test_api_doc_snippets_execute(tmp_path):
    blocks = _python_blocks()
    assert len(blocks) >= 8, "API.md lost its snippets?"
    ns = {"ckpt_dir": str(tmp_path / "ckpt")}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"docs/API.md[block {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"API.md python block {i} failed: {e!r}\n"
                        f"--- block ---\n{block}")
    # spot-check the pipeline actually produced the documented shapes
    assert ns["images"].shape[-1] == 3
    assert float(ns["fid"]) >= 0.0
    assert 0.0 <= float(ns["p"]) <= 1.0
