#!/bin/bash
# Round-4 TPU measurement queue — run sequentially (one chip, no contention).
# Each step appends to /tmp/r4_queue.log; JSON rows land in per-step files.
set -x
cd /root/repo
L=/tmp/r4_queue.log
date >> $L

# 1. socket-protocol serving throughput (VERDICT item 3)
timeout 1800 python scripts/bench_server.py --requests 5 \
  > /tmp/r4_server.json 2>>$L
echo "server done rc=$?" >> $L

# 2. flat scaling, bf16 (VERDICT item 2) — per-size invocations so an OOM
#    at the envelope edge doesn't kill the table rows
for S in 20000 100000 200000 400000; do
  timeout 3600 python scripts/bench_scaling.py --mode flat --rerank-dtype bfloat16 \
    --gen device --sizes $S --iters 7 --oracle-max-docs 200000 \
    >> /tmp/r4_flat_bf16.jsonl 2>>$L
  echo "flat bf16 $S rc=$?" >> $L
done
# bf16 envelope edge: 500k x 16 x 768 bf16 = 12.3 GB table
timeout 3600 python scripts/bench_scaling.py --mode flat --rerank-dtype bfloat16 \
  --gen device --sizes 500000 --iters 5 --oracle-max-docs 0 \
  >> /tmp/r4_flat_bf16.jsonl 2>>$L
echo "flat bf16 500k rc=$?" >> $L

# 3. flat scaling, int8 (4x capacity)
for S in 200000 650000 1000000; do
  timeout 5400 python scripts/bench_scaling.py --mode flat --rerank-dtype int8 \
    --gen device --sizes $S --iters 5 --oracle-max-docs 200000 \
    >> /tmp/r4_flat_int8.jsonl 2>>$L
  echo "flat int8 $S rc=$?" >> $L
done

date >> $L
echo QUEUE_PART1_DONE >> $L
