#!/bin/bash
# Submit a job file to the persistent TPU worker and print its output.
# Usage: tools/tpu_submit.sh <jobfile.py> [timeout_s]
set -e
JOB=${1:?job file}
TIMEOUT=${2:-540}
rm -f /tmp/tpu_job.out /tmp/tpu_job.done
cp "$JOB" /tmp/tpu_job.py.tmp && mv /tmp/tpu_job.py.tmp /tmp/tpu_job.py
for ((i=0; i<TIMEOUT; i++)); do
  if [ -f /tmp/tpu_job.out ]; then cat /tmp/tpu_job.out; exit 0; fi
  sleep 1
done
echo "TIMEOUT after ${TIMEOUT}s; worker log tail:"
tail -5 /tmp/tpu_worker.log
exit 1
