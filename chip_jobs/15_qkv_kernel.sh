# round-4: verify + measure the boundary-free qkv flash kernel
# (ops/flash_qkv, VERDICT r3 item 4) on the real chip.
cd /root/repo
timeout 3000 python scripts/tpu_kernel_check.py --impls pallas_qkv \
  > logs/kernel_check_qkv.out 2>&1
tail -5 logs/kernel_check_qkv.out
# in-context A/B at the flagship shapes: does pallas_qkv beat xla+ffn?
# (round-3 records to beat: 4.49 s/update shared, 9.24 s exact)
timeout 1800 python scripts/update_bench.py --updates 3 \
  --modes exact/xla+ffn,exact/pallas_qkv+ffn,shared/xla+ffn,shared/pallas_qkv+ffn \
  > logs/update_bench_qkv.out 2>&1
tail -10 logs/update_bench_qkv.out
