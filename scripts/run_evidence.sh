#!/bin/bash
# Round-4 evidence chain: config-4 model bench, then the int8 op sweep.
# One TPU chip -> strictly sequential.
cd /root/repo
EV=docs/evidence
echo "=== model_bench config4 (int8) start $(date +%T)"
timeout 3000 python scripts/model_bench.py --layers 8 --ctx 16384 \
  --decode 64 --kv-dtype int8 --batch 1 > $EV/model_bench_config4.jsonl 2> $EV/model_bench_config4.log
echo "=== op_eval int8 sweep (page=128 grid) start $(date +%T)"
timeout 9000 python scripts/op_eval.py --int8 \
  --batches 1,2,4,8 --kvs 8192,16384,32768,65536,131072 --pages 128 \
  > $EV/sweep_int8_p128.jsonl 2> $EV/sweep_int8_p128.log
echo "=== op_eval int8 page axis start $(date +%T)"
timeout 5000 python scripts/op_eval.py --int8 \
  --batches 1 --kvs 32768 --pages 16,32,64 \
  > $EV/sweep_int8_pages.jsonl 2> $EV/sweep_int8_pages.log
echo "=== DONE $(date +%T)"
