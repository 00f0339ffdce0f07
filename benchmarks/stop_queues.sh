#!/bin/bash
# Stop the round-5 TPU queues cleanly by PID file (NEVER by name pattern),
# so the driver's end-of-round bench gets the chip to itself. Child steps
# are killed via each queue's process group.
set -u
for pidfile in /tmp/r5c_launcher.pid /tmp/r5b.pid /tmp/r5c.pid; do
  [ -f "$pidfile" ] || continue
  pid=$(cat "$pidfile")
  if kill -0 "$pid" 2>/dev/null; then
    pg=$(ps -o pgid= -p "$pid" | tr -d ' ')
    echo "stopping $pidfile (pid $pid, pgid $pg)"
    kill -TERM -- "-$pg" 2>/dev/null || kill -TERM "$pid" 2>/dev/null
  fi
done
sleep 3
for pidfile in /tmp/r5b.pid /tmp/r5c.pid /tmp/r5c_launcher.pid; do
  [ -f "$pidfile" ] || continue
  pid=$(cat "$pidfile")
  if kill -0 "$pid" 2>/dev/null; then
    pg=$(ps -o pgid= -p "$pid" | tr -d ' ')
    echo "force-killing $pidfile (pid $pid, pgid $pg)"
    kill -KILL -- "-$pg" 2>/dev/null || kill -KILL "$pid" 2>/dev/null
  fi
done
echo "queues stopped"
