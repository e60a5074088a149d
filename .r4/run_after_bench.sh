#!/bin/bash
# Wait for bench.py to exit, then capture a packed-decode xplane trace.
cd /root/repo
while pgrep -f "python bench.py" > /dev/null; do sleep 20; done
python .r4/trace_decode.py > .r4/trace_decode_packed.log 2>&1
tail -5 .r4/trace_decode_packed.log | grep '^{' | tail -1 > .r4/trace_decode_packed.json
echo "trace done rc=$?" >> .r4/trace_decode_packed.log
