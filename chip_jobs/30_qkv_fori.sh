# round-5 (VERDICT r4 weak #6 / next-round #2): lift flash_qkv's backward
# out of the gb=1 VMEM straitjacket.
#   (a) regression-check the unroll impl after the native-dtype-operand
#       change (MXU now consumes bf16 directly instead of upcast f32);
#   (b) check the new fori impl (loop-scoped temps, roll-based head
#       extraction, scratch accumulation; default budget 1 MB -> gb=4);
#   (c) update-bench both impls at the flagship shape. Round-4 bar to beat:
#       exact 6.68 / shared 3.23 s/update (logs/update_bench_qkv2.out).
cd /root/repo
timeout 3000 python scripts/tpu_kernel_check.py --impls pallas_qkv \
  --qkv_impl unroll > logs/kernel_check_qkv3_unroll.out 2>&1
tail -3 logs/kernel_check_qkv3_unroll.out
timeout 3000 python scripts/tpu_kernel_check.py --impls pallas_qkv \
  --qkv_impl fori > logs/kernel_check_qkv3_fori.out 2>&1
tail -3 logs/kernel_check_qkv3_fori.out
timeout 1800 python scripts/update_bench.py --updates 3 \
  --modes exact/pallas_qkv+ffn,shared/pallas_qkv+ffn --qkv_impl unroll \
  > logs/update_bench_qkv3_unroll.out 2>&1
tail -4 logs/update_bench_qkv3_unroll.out
timeout 1800 python scripts/update_bench.py --updates 3 \
  --modes exact/pallas_qkv+ffn,shared/pallas_qkv+ffn --qkv_impl fori \
  > logs/update_bench_qkv3_fori.out 2>&1
tail -4 logs/update_bench_qkv3_fori.out
timeout 1800 python scripts/update_bench.py --updates 3 \
  --modes shared/pallas_qkv+ffn --qkv_impl fori --qkv_budget 2097152 \
  > logs/update_bench_qkv3_fori2mb.out 2>&1
tail -3 logs/update_bench_qkv3_fori2mb.out
