#!/usr/bin/env bash
# Golden-parity gate (VERDICT r3 next #1): run the ENTIRE test suite
# including the slow reference-golden tier, so a red golden can never ship
# unnoticed again.
#
#   scripts/run_golden_tier.sh            # everything (fast + slow), -x off
#   scripts/run_golden_tier.sh --fast     # fast tier only (the default gate)
#
# The slow tier re-runs the full CTF / line-profile / reverberation pipelines
# in float64 on CPU (~30-60 min on a 2-core box, warm compile cache). Always
# run this before declaring a round done.
set -uo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--fast" ]]; then
    exec python -m pytest tests/ -q
fi

# -m "" overrides pytest.ini's `-m "not slow"` default gate; no -x so the
# full red/green picture is reported in one run.
python -m pytest tests/ -q -m "" -p no:cacheprovider
status=$?
if [[ $status -ne 0 ]]; then
    echo "GOLDEN TIER RED (exit $status) — do not ship." >&2
fi
exit $status
