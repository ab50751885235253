#!/usr/bin/env bash
# Single fixed run on the published 10M configuration — the tpulmi analog of
# the reference's PBS job script (search/run.sh submitted a 24h/1-core job;
# here the same experiment is one command on one TPU chip).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m tpulmi.cli --size 10M -bp 4 "$@"
