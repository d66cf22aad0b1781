# round-5: same-session preview of the restructured bench (VERDICT r4
# next-round #5) before the driver's end-of-round run. Success criteria:
# JSON parses, >=3 timed reps per arm (no "budget stop after 1 rep(s)"),
# vs_baseline >= 5.
cd /root/repo
timeout 1500 python bench.py > results/bench_preview_r5.json 2> logs/bench_preview_r5.err
cat results/bench_preview_r5.json
grep -E "rep|prepared" logs/bench_preview_r5.err | tail -8
