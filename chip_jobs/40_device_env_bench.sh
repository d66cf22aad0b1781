# Re-measure the zero-host device-env pipeline with the round-4 kernel
# defaults (fused qkv attention + fused FFN); last recorded 1346 fps in
# round 2 with the XLA attention path.
cd /root/repo
BENCH_DEVICE_ENV=1 BENCH_TOTAL_S=900 timeout 1000 python bench.py \
  > logs/bench_device_env_r4.json 2> logs/bench_device_env_r4.err
cat logs/bench_device_env_r4.json
