#!/bin/sh
# Regenerate every golden fixture FROM THE REFERENCE implementation.
# Run CPU-only (the axon tunnel hook must be disabled):
#   env -u PALLAS_AXON_POOL_IPS sh scripts/make_all_goldens.sh [ref_path]
# Fixtures land in tests/golden/; see PARITY.md's evidence table for
# what each pins.
set -e
cd "$(dirname "$0")/.."
REF="${1:-/root/reference}"
python scripts/make_golden_fixtures.py "$REF"   # DP math (DMV1o, DepTree, MTT)
python scripts/make_host_golden.py "$REF"       # eval.py scores, km/good init
python scripts/make_nn_golden.py "$REF"         # neural building blocks
python scripts/make_model_golden.py "$REF"      # composed models, decode, writer
echo "all goldens regenerated"
