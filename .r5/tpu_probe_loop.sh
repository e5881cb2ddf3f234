#!/bin/bash
cd /root/repo
while true; do
  if timeout 150 python .r5/tpu_probe_once.py >> .r5/tpu_probe.log 2>&1; then
    echo "RECOVERED $(date +%H:%M:%S)" >> .r5/tpu_probe.log
    touch .r5/tpu_recovered
    exit 0
  else
    echo "probe timeout/fail $(date +%H:%M:%S)" >> .r5/tpu_probe.log
  fi
  sleep 60
done
