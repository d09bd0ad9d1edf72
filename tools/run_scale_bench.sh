#!/bin/bash
# One fresh JVM per cell: isolates each scaling exponent from the
# old-gen GC pressure a shared long-lived local[32] JVM accumulates
# (measured up to 3x inflation on late cells in whole-suite runs).
# Results merge into scale_local.json across invocations.
set -e -o pipefail
cd "$(dirname "$0")/.."
MULTS="${*:-1 3 10}"
# SCALE_FRESH=1 starts a new scale_local.json; default accumulates
# minima across invocations (the throttling-robust protocol)
[ -n "$SCALE_FRESH" ] && rm -f scale_local.json
# default cell list comes from scale_bench.py's CELLS so the two
# never drift (the old inline copy silently missed every cell added
# after r10)
CELLS="${SCALE_CELLS:-$(python -c "from tools.scale_bench import CELLS; print(' '.join(CELLS))")}"
FAILED=""
for c in $CELLS; do
    # stderr goes to a per-cell log (Spark chatter would drown the
    # table) but a crashed cell must NEVER look like a measured one:
    # record it and say so at the end.
    # shellcheck disable=SC2086
    if python tools/scale_bench.py --mults $MULTS --cells "$c" \
            2>"/tmp/scale_bench_$c.err" | grep -E "^$c"; then
        :
    else
        FAILED="$FAILED $c"
        echo "FAILED: $c (stderr tail follows)" >&2
        tail -5 "/tmp/scale_bench_$c.err" >&2
    fi
done
if [ -n "$FAILED" ]; then
    echo "scale_bench: cells FAILED and are missing/stale in scale_local.json:$FAILED" >&2
    exit 1
fi
