#!/bin/bash
# Stop the round-5 TPU queues cleanly by PID file (NEVER by name pattern),
# so the driver's end-of-round bench gets the chip to itself. Child steps
# are killed via each queue's process group. Pidfiles: /tmp/r5b.pid is
# written by whoever launches r5b_queue.sh (`... & echo $! > /tmp/r5b.pid`),
# /tmp/r5c.pid by r5c_queue.sh itself, /tmp/r5c_launcher.pid by the
# r5b→r5c chain launcher. A pidfile whose PID no longer looks like one of
# our queue processes (PID recycling) is ignored and removed, not killed.
set -u
ours() { # PID belongs to a queue/launcher we started?
  tr '\0' ' ' < "/proc/$1/cmdline" 2>/dev/null \
    | grep -qE 'r5[b-g]_queue|r5[c-f]_launcher|flow3_ablate|nan_bisect|r5_knob_ab|tt_sweep|train_fetch_bench|bench\.py'
}
stop_one() { # <pidfile> <signal>
  local pidfile=$1 sig=$2 pid pg
  [ -f "$pidfile" ] || return 0
  pid=$(cat "$pidfile")
  if ! kill -0 "$pid" 2>/dev/null; then rm -f "$pidfile"; return 0; fi
  if ! ours "$pid"; then
    echo "skip $pidfile: pid $pid is not a queue process (recycled?)"
    rm -f "$pidfile"; return 0
  fi
  pg=$(ps -o pgid= -p "$pid" | tr -d ' ')
  echo "$sig $pidfile (pid $pid, pgid $pg)"
  kill "-$sig" -- "-$pg" 2>/dev/null || kill "-$sig" "$pid" 2>/dev/null
}
for f in /tmp/r5c_launcher.pid /tmp/r5d_launcher.pid /tmp/r5e_launcher.pid /tmp/r5b.pid /tmp/r5c.pid /tmp/r5d.pid /tmp/r5e.pid /tmp/r5f.pid /tmp/r5g.pid; do stop_one "$f" TERM; done
sleep 3
for f in /tmp/r5c_launcher.pid /tmp/r5d_launcher.pid /tmp/r5e_launcher.pid /tmp/r5b.pid /tmp/r5c.pid /tmp/r5d.pid /tmp/r5e.pid /tmp/r5f.pid /tmp/r5g.pid; do
  stop_one "$f" KILL
  [ -f "$f" ] && { pid=$(cat "$f"); kill -0 "$pid" 2>/dev/null || rm -f "$f"; }
done
echo "queues stopped"
