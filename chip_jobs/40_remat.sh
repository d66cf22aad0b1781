# round-5 (VERDICT r4 next-round #3): encoder remat policy for the update's
# backward working set. Measure s/update AND HBM bytes/update (profiler
# trace -> trace_roofline) at flagship scale for none/full/dots, so
# BASELINE.md gets a measured accept/reject (like MiniBatchMerge got).
cd /root/repo
for R in none full dots; do
  timeout 1800 python scripts/update_bench.py --updates 3 \
    --modes shared/pallas_qkv+ffn --remat $R \
    --trace logs/tb/remat_$R \
    > logs/update_bench_remat_$R.out 2>&1
  tail -3 logs/update_bench_remat_$R.out
  timeout 300 python scripts/trace_roofline.py "logs/tb/remat_$R/shared_pallas_qkv+ffn" \
    --updates 3 > logs/roofline_remat_$R.out 2>&1 || \
  timeout 300 python scripts/trace_roofline.py "logs/tb/remat_$R" \
    --updates 3 > logs/roofline_remat_$R.out 2>&1 || true
  grep -m4 -i "bytes\|bandwidth\|MFU" logs/roofline_remat_$R.out || true
done
