#!/bin/bash
# Round-4 TPU queue part 3: 500k-doc IVF point + pydocs two-stage distill.
set -x
cd /root/repo
L=/tmp/r4_queue3.log
date >> $L

timeout 7200 python scripts/bench_scaling.py --gen device --sizes 500000 \
  --partitions 0 --balance-factor 1.3 --rerank-dtype int8 --iters 5 \
  --oracle-max-docs 500000 \
  --sweep "256:1024:16:8192,256:1536:16:12288" \
  >> /tmp/r4_ivf_v2.jsonl 2>>$L
echo "ivf 500k rc=$?" >> $L

date >> $L
echo QUEUE_PART3_DONE >> $L
