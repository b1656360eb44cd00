#!/bin/bash
# Round-5 post-queue chain: wait for the main measurement queue (pgid in
# /tmp/r5_queue_resume.pid) to finish, then run A/B matrix #3 (ab_r5c.sh:
# SW class-major harvest legs + pad_maximum formulation probe). Detached:
#   setsid nohup bash tools/r5_post_queue.sh & echo $! > /tmp/r5_post.pid
# Kill with: kill -- -$(cat /tmp/r5_post.pid)
set -u
cd "$(dirname "$0")/.."
exec >>/tmp/r5_post.log 2>&1
echo "=== r5 post-queue watcher start $(date)"

QPID=$(cat /tmp/r5_queue_resume.pid 2>/dev/null || echo "")
if [ -n "$QPID" ]; then
  while kill -0 -- -"$QPID" 2>/dev/null; do sleep 60; done
fi
echo "=== main queue gone; starting ab_r5c $(date)"

bash tools/ab_r5c.sh
echo "=== r5 post-queue ALL complete $(date)"
touch /tmp/r5_post.done
