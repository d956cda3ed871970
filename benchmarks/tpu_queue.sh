#!/bin/bash
# Serialized TPU job runner (CLAUDE.md wedge protocol): ONE job at a
# time, a 90s-timeout probe between jobs, auto-retry while the tunnel is
# wedged.  Jobs are shell scripts dropped into $SPOOL; the first line may
# set "# TIMEOUT=<seconds>" (default 2400).  Results land in $BASE/done
# (suffixed .rc<N>) with logs in $BASE/logs.
#
# Usage:  nohup benchmarks/tpu_queue.sh >/tmp/tpu_jobs/runner_stdout.log 2>&1 &
#         echo $! > /tmp/tpu_runner.pid          # stop with: kill $(cat ...)
#         cat > /tmp/tpu_jobs/spool/10_mybench.job <<'JOB'
#         # TIMEOUT=3600
#         python -u benchmarks/my_bench.py
#         JOB
BASE=${TPU_JOBS_DIR:-/tmp/tpu_jobs}
mkdir -p "$BASE/spool" "$BASE/done" "$BASE/logs"
cat > "$BASE/probe.py" <<'PY'
import jax, jax.numpy as jnp
print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))
PY
cd /root/repo
while true; do
  job=$(ls "$BASE/spool/" 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    sleep 20; continue
  fi
  if ! timeout 90 python "$BASE/probe.py" >/dev/null 2>&1; then
    echo "$(date +%T) probe FAILED; backend wedged, sleeping 60s" >> "$BASE/runner.log"
    sleep 60; continue
  fi
  to=$(grep -m1 '^# TIMEOUT=' "$BASE/spool/$job" | cut -d= -f2)
  to=${to:-2400}
  echo "$(date +%T) RUN $job (timeout ${to}s)" >> "$BASE/runner.log"
  t0=$(date +%s)
  timeout "$to" bash "$BASE/spool/$job" > "$BASE/logs/$job.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "$(date +%T) DONE $job rc=$rc elapsed=$((t1-t0))s" >> "$BASE/runner.log"
  mv "$BASE/spool/$job" "$BASE/done/$job.rc$rc"
done
