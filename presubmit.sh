#!/bin/bash
# Presubmit gate (reference: presubmit.sh:95-99 runs pytest before submit).
# The suite is split so each half stays under the single-process budget;
# see CLAUDE.md for environment notes.
set -euo pipefail
cd "$(dirname "$0")"
python -m pytest tests/ -q --ignore=tests/models --ignore=tests/exemplars
python -m pytest tests/models tests/exemplars -q
