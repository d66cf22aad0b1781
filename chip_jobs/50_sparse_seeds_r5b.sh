# round-5 batch B: 3 more paired seeds for the hard sparse-regime A/B.
# At 10 seeds the aggregate is RND 6/10 (3 reversals, 1 no-solve) with
# Wilcoxon p=0.070 on the paired solve gaps (BASELINE.md) — more pairs
# tighten both tests whichever way they land. Same regime as rounds 3-5.
cd /root/repo
for SEED in 31 37 41; do
timeout 2400 python scripts/maze_ab.py --arm rnd --updates 250 --seed $SEED \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --int_coef 10 --ext_coef 2 --int_decay 1000 \
  --tag _g10d28v4ic10ext2dk1000shared --out_dir results/maze_ab
timeout 2400 python scripts/maze_ab.py --arm ppo --updates 250 --seed $SEED \
  --sparse --goal_depth 28 --ep_len 256 --variants 4 --grid 10 --num_envs 32 \
  --shared --ext_coef 2 \
  --tag _g10d28v4ext2shared --out_dir results/maze_ab
done
