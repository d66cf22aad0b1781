# VERDICT r3 item 3: measure s/update + MFU at MiniBatchMerge m in {1,2,4,8}
# (exact and shared modes, fused FFN on = shipped defaults)
cd /root/repo
for m in 1 2 4 8; do
  echo "--- merge=$m"
  timeout 900 python scripts/update_bench.py --updates 3 --merge $m \
    --modes exact/xla+ffn,shared/xla+ffn
done > logs/merge_sweep_r4.log 2>&1
tail -20 logs/merge_sweep_r4.log
