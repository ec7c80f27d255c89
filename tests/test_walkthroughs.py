"""The worked walkthroughs (docs/walkthroughs/) must RUN end-to-end on
the CPU mesh (VERDICT r4 next #9: 'a newcomer can run each'): every
```python block in each document is extracted in order and executed in
one shared namespace per document."""
import os
import re

import pytest

WT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "walkthroughs")
DOCS = sorted(f for f in os.listdir(WT_DIR) if f.endswith(".md"))


def _blocks(path):
    text = open(path).read()
    return re.findall(r"```python\n(.*?)```", text, re.S)


def test_walkthroughs_exist():
    assert len(DOCS) >= 4, DOCS


@pytest.mark.parametrize("doc", DOCS)
def test_walkthrough_runs(doc):
    blocks = _blocks(os.path.join(WT_DIR, doc))
    assert blocks, f"{doc} has no python blocks"
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"{doc}[block {i}]", "exec"), ns)
        except Exception as e:                        # pragma: no cover
            raise AssertionError(
                f"{doc} block {i} failed: {type(e).__name__}: {e}\n"
                f"---\n{block}") from e
