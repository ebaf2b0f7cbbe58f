#!/bin/bash
# Round-5 evidence chain — one TPU chip, strictly sequential.
cd /root/repo
EV=docs/evidence
echo "=== sparse_quality (k<C at 128K) $(date +%T)"
timeout 3000 python scripts/sparse_quality.py --layers 4 --ctx 131072 \
  --decode 64 --ks 64,128 2> $EV/sparse_quality.log
echo "=== model_bench L=4 128K int8 weights $(date +%T)"
timeout 4000 python scripts/model_bench.py --layers 4 --kv-heads 8 \
  --ctx 131072 --decode 48 --weights int8 --scan \
  > $EV/model_bench_L4_128k_w8.jsonl 2> $EV/model_bench_L4_128k_w8.log
echo "=== model_bench L=4 128K B=4 $(date +%T)"
timeout 5600 python scripts/model_bench.py --layers 4 --kv-heads 8 \
  --ctx 131072 --decode 48 --batch 4 --weights int8 --scan \
  > $EV/model_bench_L4_128k_b4_w8.jsonl 2> $EV/model_bench_L4_128k_b4_w8.log
echo "=== sp on-chip overhead $(date +%T)"
timeout 900 python scripts/sp_overhead.py --tpu > $EV/sp_overhead_tpu.jsonl \
  2> $EV/sp_overhead_tpu.log
echo "=== prefill_bench $(date +%T)"
timeout 2400 python scripts/prefill_bench.py --ctx 16384 --layers 8 \
  --chunks 128,512 2> $EV/prefill_bench.log
echo "=== pagesize probe $(date +%T)"
timeout 1800 python scripts/pagesize_probe.py 2> $EV/pagesize_probe.log
echo "=== attn_profile (slope-timed) $(date +%T)"
timeout 2400 python scripts/attn_profile.py > $EV/attn_profile_r5.jsonl \
  2> $EV/attn_profile_r5.log
echo "=== DONE $(date +%T)"
