#!/bin/bash
# Round-5 serving bench (VERDICT r4 item 5): say what the 385 ms image
# p50 was, then measure the pipeline fix.
#  1. CFA_SERVE_PROFILE=1  — synchronous uploads: the /stats dispatch_ms
#     class isolates the host->device transfer from compute+fetch, so
#     the endpoint p50 decomposes into queue-wait / upload / device.
#  2. default              — the two-stage pipelined batcher (upload of
#     batch k+1 overlaps compute/fetch of batch k).
# Do not run concurrently with CPU work (CLAUDE.md: one-core host).
cd /root/repo
LOG=/root/repo/perf/serve_http_bench_r5.log
: > $LOG
echo "=== stage-profile mode (synchronous uploads) ===" >> $LOG
CFA_SERVE_PROFILE=1 python perf/serve_http_bench.py 16 20 >> $LOG 2>&1
echo "=== pipelined mode (default) ===" >> $LOG
python perf/serve_http_bench.py 16 20 >> $LOG 2>&1
echo DONE >> $LOG
