#!/usr/bin/env python3
"""git clean-filter: strip cell outputs / execution counts from .ipynb.

Reads a notebook JSON on stdin, writes it with outputs and prompt numbers
removed on stdout, so committed notebooks stay diffable (reference parity:
notebooks/ipynb_drop_output.py). A notebook opts out by setting

    "metadata": {"git": {"keep_output": true}}

Register via setup_notebooks.sh (repo-local `filter.clean_ipynb`);
`.gitattributes` maps `*.ipynb` to the filter.
"""

import json
import sys


def strip(nb):
    if nb.get("metadata", {}).get("git", {}).get("keep_output", False):
        return nb
    for cell in nb.get("cells", []):
        if cell.get("cell_type") == "code":
            cell["outputs"] = []
            cell["execution_count"] = None
    # nbformat 3 notebooks nest cells under top-level worksheets.
    for ws in nb.get("worksheets", ()):
        for cell in ws.get("cells", []):
            if cell.get("cell_type") == "code":
                cell["outputs"] = []
                cell["prompt_number"] = None
    return nb


if __name__ == "__main__":
    nb = json.load(sys.stdin)
    json.dump(strip(nb), sys.stdout, indent=1, ensure_ascii=False, sort_keys=True)
    sys.stdout.write("\n")
