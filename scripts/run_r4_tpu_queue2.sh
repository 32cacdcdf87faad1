#!/bin/bash
# Round-4 TPU queue part 2: IVF scaling v2 + pq4 crossover + beyond-HBM host table.
set -x
cd /root/repo
L=/tmp/r4_queue2.log
date >> $L

# reuse the flat 200k corpus for the IVF/pq4 builds (hardlinks; the
# device-gen corpus is deterministic per size so this is exact)
B=/tmp/colbert_bench_idx_sq_200000x16x768_p0_b0.0_sq64_m64
python scripts/share_parts.py ${B}_noivf_dgen   /tmp/colbert_bench_idx_sq_200000x16x768_p16384_b1.3_sq64_m64_dgen >> $L 2>&1
python scripts/share_parts.py ${B}_noivf_dgen   /tmp/colbert_bench_idx_pq4_200000x16x768_p0_b0.0_sq64_m64_dgen >> $L 2>&1

# 3b. flat int8 envelope edge: 1.25M x 16 x 768 int8 = 15.4 GB table —
#     (skipped: corpus gen alone is ~1 h through the tunnel; the limit is
#     reported from the measured 1M point + table arithmetic)

# 4. IVF scaling v2 (VERDICT item 5): 200k docs = 3.2M vectors at the
#    reference partition formula K=16384, balanced k-means, knob sweep
#    toward >=0.95 recall@100
timeout 7200 python scripts/bench_scaling.py --gen device --sizes 200000 \
  --partitions 16384 --balance-factor 1.3 --rerank-dtype int8 --iters 5 \
  --oracle-max-docs 200000 \
  --sweep "128:512:8:4096,128:1024:16:8192,256:1024:16:8192,256:1536:16:12288" \
  >> /tmp/r4_ivf_v2.jsonl 2>>$L
echo "ivf 200k p16384 rc=$?" >> $L

# 6. pq4 crossover rows for the DESIGN codec table
timeout 5400 python scripts/bench_scaling.py --gen device --codec pq4 \
  --sizes 200000 --iters 5 --oracle-max-docs 200000 --rerank-dtype int8 \
  >> /tmp/r4_pq4.jsonl 2>>$L
echo "pq4 200k rc=$?" >> $L

# 7. Beyond-HBM datapoint (VERDICT item 4): 1.4M x 16 x 768 — int8 host
#    table 17.2 GB > 16 GB HBM; candidate codes stay in HBM (1.4 GB).
#    Corpus = the cached 1M flat corpus + 0.4M appended parts (hardlinks).
python scripts/extend_corpus.py \
  /tmp/colbert_bench_idx_sq_1000000x16x768_p0_b0.0_sq64_m64_noivf_dgen \
  /tmp/colbert_bench_idx_host_1400000x16x768_p8192_dgen 1400000 >> $L 2>&1
timeout 10800 python scripts/bench_host_table.py --docs 1400000 \
  --partitions 8192 --iters 5 \
  > /tmp/r4_host_table.json 2>>$L
echo "host table rc=$?" >> $L

date >> $L
echo QUEUE_PART2_DONE >> $L
