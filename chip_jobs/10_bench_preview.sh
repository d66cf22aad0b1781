# round-4 bench preview: confirm the contention-proof harness produces the
# same-session >=5x JSON line on the real chip
cd /root/repo
BENCH_TOTAL_S=1380 timeout 1450 python bench.py > logs/bench_preview_r4.json 2> logs/bench_preview_r4.err
cat logs/bench_preview_r4.json
