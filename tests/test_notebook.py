"""Demo-notebook drift guard.

The notebook itself needs the published zoo checkpoint and a sample image
(neither is in this container), so it cannot execute here — but every
semseg_tpu symbol it touches can be checked, which catches the common
failure mode: a library refactor silently breaking the demo
(reference analogue: notebooks/DemoSegmenter.ipynb).
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOTEBOOK = os.path.join(REPO, "notebooks", "DemoSegmenter.ipynb")


def _code_cells():
    with open(NOTEBOOK) as f:
        nb = json.load(f)
    return ["".join(c["source"]) for c in nb["cells"] if c["cell_type"] == "code"]


def test_notebook_imports_resolve():
    """Every import statement in the notebook executes."""
    ns = {}
    for src in _code_cells():
        for line in src.splitlines():
            if re.match(r"\s*(from|import)\s+\w", line) and "%" not in line:
                exec(line.strip(), ns)
    assert "ModelBuilder" in ns and "SegmentationModule" in ns


def test_notebook_references_exist():
    """Config path and the zoo checkpoint naming scheme stay valid."""
    cells = "\n".join(_code_cells())
    m = re.search(r"merge_from_file\('\.\./(config/[\w.-]+\.yaml)'\)", cells)
    assert m, "notebook no longer loads a shipped config"
    assert os.path.exists(os.path.join(REPO, m.group(1)))
    # The calling convention exercised by the notebook: feed-dict + segSize.
    assert re.search(r"module\(\{'img_data': \w+\}, segSize=", cells)
