# round-4: profile the post-qkv-kernel update to find the NEXT bandwidth
# target (trace -> top ops + roofline), shared and exact modes.
cd /root/repo
timeout 1200 python scripts/update_bench.py --updates 2 \
  --modes shared/pallas_qkv+ffn --trace logs/trace_qkv_shared \
  > logs/update_bench_qkv_trace.out 2>&1
timeout 1200 python scripts/update_bench.py --updates 2 \
  --modes exact/pallas_qkv+ffn --trace logs/trace_qkv_exact \
  >> logs/update_bench_qkv_trace.out 2>&1
python scripts/trace_top_ops.py logs/trace_qkv_shared/shared_pallas_qkv+ffn --top 25 \
  > logs/top_ops_qkv_shared.out 2>&1 || \
python scripts/trace_top_ops.py logs/trace_qkv_shared --top 25 \
  > logs/top_ops_qkv_shared.out 2>&1
python scripts/trace_top_ops.py logs/trace_qkv_exact --top 25 \
  > logs/top_ops_qkv_exact.out 2>&1
tail -30 logs/top_ops_qkv_shared.out
