# round-4: re-verify the boundary-free qkv kernel AFTER the scoped-vmem fix
# (score budget 1 MB -> 256 KB, gb=1; commit fe0f2ba). The 05:26 update-bench
# numbers (6.68 exact / 3.23 shared) were measured with the OLD budget loaded;
# this re-check must confirm (a) gradients 24/24 with the new budget and
# (b) the perf win survives the smaller batch block.
cd /root/repo
timeout 3000 python scripts/tpu_kernel_check.py --impls pallas_qkv \
  > logs/kernel_check_qkv2.out 2>&1
tail -5 logs/kernel_check_qkv2.out
timeout 1800 python scripts/update_bench.py --updates 3 \
  --modes exact/pallas_qkv+ffn,shared/pallas_qkv+ffn \
  > logs/update_bench_qkv2.out 2>&1
tail -10 logs/update_bench_qkv2.out
