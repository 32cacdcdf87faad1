#!/bin/bash
# Round-4 TPU queue part 2: IVF scaling v2 + pq4 crossover + beyond-HBM host table.
set -x
cd /root/repo
L=/tmp/r4_queue2.log
date >> $L

# 4. IVF scaling v2 (VERDICT item 5): 200k docs = 3.2M vectors at the
#    reference partition formula K=16384, balanced k-means, knob sweep
#    toward >=0.95 recall@100
timeout 7200 python scripts/bench_scaling.py --gen device --sizes 200000 \
  --partitions 16384 --balance-factor 1.3 --rerank-dtype int8 --iters 5 \
  --oracle-max-docs 200000 \
  --sweep "128:512:8:4096,128:1024:16:8192,256:1024:16:8192,256:1536:16:12288" \
  >> /tmp/r4_ivf_v2.jsonl 2>>$L
echo "ivf 200k p16384 rc=$?" >> $L

# 5. IVF at 500k docs (8M vectors), auto partition formula (=16384)
timeout 7200 python scripts/bench_scaling.py --gen device --sizes 500000 \
  --partitions 0 --balance-factor 1.3 --rerank-dtype int8 --iters 5 \
  --oracle-max-docs 500000 \
  --sweep "256:1024:16:8192,256:1536:16:12288" \
  >> /tmp/r4_ivf_v2.jsonl 2>>$L
echo "ivf 500k rc=$?" >> $L

# 6. pq4 crossover rows for the DESIGN codec table
timeout 5400 python scripts/bench_scaling.py --gen device --codec pq4 \
  --sizes 200000 --iters 5 --oracle-max-docs 200000 --rerank-dtype int8 \
  >> /tmp/r4_pq4.jsonl 2>>$L
echo "pq4 200k rc=$?" >> $L

date >> $L
echo QUEUE_PART2_DONE >> $L
