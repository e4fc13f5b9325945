#!/bin/bash
# Full on-chip requalification after a tunnel outage or a batch of
# CPU-only landings: kernel gates -> headline bench -> multi-resolution
# table -> 1080p profile -> quality + eval dossiers.
#
# Serialize against any other TPU process (this environment's worker
# wedges under concurrent clients); each step runs under timeout so a
# wedged worker cannot hang the whole pass.  Log: /tmp/tpu_requal.log.
set -x
cd "$(dirname "$0")/.."
log=${1:-/tmp/tpu_requal.log}
: > "$log"
run() {
    echo "=== $1 ===" >> "$log"
    shift
    timeout "$1" "${@:2}" >> "$log" 2>&1
    echo "exit: $?" >> "$log"
}
run tpu_check      1800 python tools/tpu_check.py
run bench          1800 python bench.py
run stream_bench   1800 python tools/stream_bench.py
run bench_table    3600 python tools/bench_table.py
run profile_1080p  1800 python profile_stages.py 1080x1920
run quality        3600 python tools/quality_report.py
run make_eval_set   600 python tools/make_eval_set.py --root evalset
run eval          10800 python tools/eval_report.py --root evalset
echo DONE >> "$log"
