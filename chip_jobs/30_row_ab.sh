# Interleaved A/B: 6-output vs 3-output row step (tunnel-noise-robust)
cd /root/repo
timeout 1500 python /tmp/row_ab.py 2>&1 | grep -v WARNING > logs/row_ab.log
