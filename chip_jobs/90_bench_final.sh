# round-4 final bench preview: re-confirm the contention-proof harness on
# the CURRENT default config (fused qkv attention landed after the 04:22
# preview). Must drain well before the ~13:26 UTC round end so the chip is
# free for the driver's own BENCH_r04 run.
cd /root/repo
BENCH_TOTAL_S=1200 timeout 1300 python bench.py > logs/bench_final_r4.json 2> logs/bench_final_r4.err
cat logs/bench_final_r4.json
