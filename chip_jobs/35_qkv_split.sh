# round-5b (VERDICT r4 weak #6 / next-round #2, take 3): prove the
# "split" head-loop impl on-chip. Staged so a Mosaic compile blow-up
# (what killed the fori impl: >7 min/case, results/fori_smoke_r5.out)
# costs one bounded stage, not the whole job.
cd /root/repo

# stage 1 — compile smoke at the flagship head geometry (compile cost is
# set by n_pad + head count, not batch): one dropout case fwd+grad.
timeout 900 python - > results/split_smoke_r5.out 2>&1 <<'EOF'
import time, jax
t0 = time.time()
import scripts.tpu_kernel_check as kc
from eavit_tpu.ops import flash_qkv as fq
fq.set_impl("split")
import jax.numpy as jnp
print(f"backend: {jax.default_backend()} impl=split budget={fq._budget()}", flush=True)
err = kc.run_case_qkv(8, 8, 197, 32, jnp.bfloat16, 2, 0.1)
print(f"smoke case done in {time.time()-t0:.0f}s rel_err={err:.2e}", flush=True)
EOF
tail -2 results/split_smoke_r5.out
grep -q "smoke case done" results/split_smoke_r5.out || exit 1

# stage 2 — the full 24-case on-chip gradient check with split active.
timeout 3000 python scripts/tpu_kernel_check.py --impls pallas_qkv \
  --qkv_impl split > logs/kernel_check_qkv_split.out 2>&1
tail -3 logs/kernel_check_qkv_split.out

# stage 3 — flagship update bench, both modes, split vs the shipped
# unroll default. Round-5 bar: exact 6.68 / shared 3.33 s/update.
timeout 1800 python scripts/update_bench.py --updates 3 \
  --modes exact/pallas_qkv+ffn,shared/pallas_qkv+ffn --qkv_impl split \
  > logs/update_bench_qkv_split.out 2>&1
tail -4 logs/update_bench_qkv_split.out
