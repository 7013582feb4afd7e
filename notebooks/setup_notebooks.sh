#!/bin/bash
# Prepare this directory for running DemoSegmenter.ipynb locally
# (reference parity: notebooks/setup_notebooks.sh).
set -e
cd "$(dirname "${BASH_SOURCE[0]}")"

# Strip notebook cell output in git (keeps the history free of rendered
# images); the filter is declared for *.ipynb in ../.gitattributes.
git config filter.clean_ipynb.clean "$(pwd)/ipynb_drop_output.py"
git config filter.clean_ipynb.smudge cat
git config filter.clean_ipynb.required true

# The notebook imports semseg_tpu and reads config/ and data/ relative to
# its own directory — symlink them from the repo root.
for DIRNAME in semseg_tpu config data; do
  ln -sfn "../${DIRNAME}" .
done
