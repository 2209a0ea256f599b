#!/bin/bash
# Poll code-cache + GC stats of the newest SparkSubmit JVM while a bench
# runs — diagnosis harness for the in-suite-vs-solo drift (VERDICT r13
# watch-item #1 / ask #6). Usage: scripts/jvm_monitor.sh <outfile> &
out=${1:-/tmp/jvm_monitor.log}
: > "$out"
while true; do
  pid=$(pgrep -f 'org.apache.spark.deploy.SparkSubmit' | tail -1)
  if [ -n "$pid" ]; then
    {
      echo "=== $(date +%s) pid=$pid"
      jcmd "$pid" Compiler.codecache 2>/dev/null
      jstat -gcutil "$pid" 2>/dev/null | tail -1
      jcmd "$pid" VM.metaspace 2>/dev/null | grep -E "Usage|reserved" | head -4
    } >> "$out"
  fi
  sleep 20
done
