#!/bin/bash
# One-screen campaign status: done flags + last line of each live log.
cd /root/repo/campaign_logs 2>/dev/null || exit 0
echo "== done: $(ls *.done 2>/dev/null | sed 's/.done//' | tr '\n' ' ')"
for f in *_r5b.log *_r5.log; do
  [ -f "$f" ] || continue
  [ -f "${f%.log}.done" ] && continue
  echo "-- $f: $(tail -1 "$f" | cut -c1-110)"
done
